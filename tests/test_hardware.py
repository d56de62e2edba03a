"""Hardware model (L0 layer) tests."""

import numpy as np

from radixjoin_tpu import hardware


def test_detect_cpu_backend():
    spec = hardware.detect()  # CPU test mesh -> cpu spec
    assert spec.name == "cpu"
    assert spec.hbm_gbps > 0 and spec.vmem_bytes > 0


def test_chip_override(monkeypatch):
    monkeypatch.setenv("RJT_CHIP", "v5e")
    spec = hardware.detect()
    assert spec.name == "v5e"
    assert spec.hbm_bytes == 16 * hardware.GiB


def test_vmem_partition_rows_sizing():
    spec = hardware.CHIPS["v5e"]
    rows = hardware.vmem_partition_rows(spec, key_bytes=8, payload_bytes=4)
    # a (key+payload) partition at fill=0.25 of 128 MiB VMEM
    assert rows == int(spec.vmem_bytes * 0.25) // 12
    assert rows > 1_000_000  # sanity: VMEM-tier partitions are ~millions of rows


def test_all_chips_catalogued():
    for name in ("v4", "v5e", "v5p", "v6e"):
        spec = hardware.CHIPS[name]
        assert spec.hbm_gbps > 500
        assert spec.ici_bisection_gbps > 0
