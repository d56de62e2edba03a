"""TPU hardware model — the L0 layer.

The reference encodes its hardware model as compile-time macros in
``include/hardware.h`` (SPC__CORE_COUNT, SPC__LEVEL2_CACHE_SIZE, ...) with
four per-server variants (``hardware__{sidon,ca09,cp02,koroneia}.h``), and
the join engine sizes its radix partitions so each build bucket fits L2
(reference src/execute.cpp:86-92).

The TPU-native equivalent is a per-chip-generation spec catalog. The tiers
that matter for a join engine:

  * **HBM** — where tables live; bandwidth bounds every scan/probe kernel
    (the roofline harness measures kernels against ``hbm_gbps``).
  * **VMEM** (~16-128 MiB) — the "L2" analogue: radix partitions are sized
    so a build partition (keys + row ids + hash slots) fits VMEM, exactly
    as the reference sizes buckets to L2.
  * **MXU/VPU** — compute unbound for joins (no matmuls); only the VPU's
    vector width shapes tiling (8x128 lanes).

Autodetection mirrors the reference's "swap the header per server" scheme:
:func:`detect` maps ``jax.devices()[0].device_kind`` onto the catalog, with
an env override ``RJT_CHIP`` (like rebuilding with a different hardware.h).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

MiB = 1 << 20
GiB = 1 << 30


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-chip capabilities (single TensorCore view where cores are split)."""

    name: str
    #: marketing / device_kind substrings used for autodetection
    kinds: tuple
    hbm_bytes: int
    hbm_gbps: float  # HBM bandwidth, GB/s per chip
    vmem_bytes: int  # VMEM per core
    bf16_tflops: float  # peak MXU throughput per chip
    ici_gbps: float  # per-link ICI bandwidth (one direction), GB/s
    ici_links: int  # ICI links per chip
    vpu_lanes: int = 128
    vpu_sublanes: int = 8

    @property
    def ici_bisection_gbps(self) -> float:
        return self.ici_gbps * self.ici_links


# Catalog (public numbers; jax-ml.github.io/scaling-book "TPU chips" table).
CHIPS = {
    "v4": ChipSpec("v4", ("v4", "TPU v4"), 32 * GiB, 1228.0, 128 * MiB, 275.0, 50.0, 6),
    "v5e": ChipSpec(
        "v5e", ("v5 lite", "v5e", "v5lite", "lite"), 16 * GiB, 819.0, 128 * MiB, 197.0, 45.0, 4
    ),
    "v5p": ChipSpec("v5p", ("v5p", "v5 p"), 96 * GiB, 2765.0, 128 * MiB, 459.0, 90.0, 6),
    "v6e": ChipSpec(
        "v6e", ("v6 lite", "v6e", "trillium"), 32 * GiB, 1640.0, 128 * MiB, 918.0, 90.0, 4
    ),
    # Virtual CPU devices (tests, dryruns): token numbers, never benched.
    "cpu": ChipSpec("cpu", ("cpu", "interpreter"), 8 * GiB, 50.0, 16 * MiB, 1.0, 1.0, 1),
}

DEFAULT = CHIPS["v5e"]


def detect(device=None) -> ChipSpec:
    """Resolve the chip spec for ``device`` (default: jax.devices()[0])."""
    override = os.environ.get("RJT_CHIP")
    if override:
        return CHIPS[override]
    if device is None:
        import jax

        devices = jax.devices()
        if not devices:
            return DEFAULT
        device = devices[0]
    kind = getattr(device, "device_kind", "").lower()
    for spec in CHIPS.values():
        if any(k.lower() in kind for k in spec.kinds):
            return spec
    return DEFAULT


def vmem_partition_rows(
    spec: Optional[ChipSpec] = None,
    key_bytes: int = 8,
    payload_bytes: int = 4,
    fill: float = 0.25,
) -> int:
    """Rows of a build partition that fit VMEM (the reference's L2 sizing,
    src/execute.cpp:86-92, translated to the VMEM tier).

    ``fill`` leaves headroom for double buffering and the probe chunk.
    """
    spec = spec or detect()
    per_row = key_bytes + payload_bytes
    return max(1, int(spec.vmem_bytes * fill) // per_row)
