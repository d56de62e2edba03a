"""Real multi-process (multi-"host") distributed execution.

Spawns a 2-process JAX cluster (gloo CPU collectives, 4 local devices
each = 8 global) running ``tools/multihost_worker.py``: the whole-plan
distributed executor over a mesh that spans processes, every
cross-device collective crossing a process boundary. The reference has
no multi-process capability at all (SURVEY.md §2 checklist); this pins
the new-capability contract of SURVEY.md §7 build order step 6.

The in-process suite (test_distributed.py) covers semantics on a
single-process 8-device mesh; this file covers only the cluster
transport (multihost.put_sharded / fetch), so one scenario suffices.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("dist_chunks", [0, 3],
                         ids=["monolithic", "chunked"])
def test_two_process_cluster_runs_whole_plan(tmp_path, dist_chunks):
    """dist_chunks=3 additionally pins the chunked (overlap-ready)
    exchange over REAL cross-process collectives — gloo's all_to_all is
    a different implementation than the single-process CPU mesh's."""
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    # The workers pin their own platform/devices; scrub the parent's
    # pytest CPU-mesh flags so they don't leak an 8-device count.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    outs = []
    for pid in range(nprocs):
        out = tmp_path / f"rank{pid}.txt"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(pid),
             "--nprocs", str(nprocs), "--port", str(port),
             "--local-devices", "4", "--out", str(out),
             "--dist-chunks", str(dist_chunks)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{log[-4000:]}"
    counts = [out.read_text().split() for out in outs]
    assert all(c[0] == "OK" for c in counts)
    # every rank gathered the same full result
    assert len({c[1] for c in counts}) == 1
