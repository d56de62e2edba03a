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
@pytest.mark.parametrize("scenario,dist_chunks,nprocs", [
    ("two_join", 0, 2),   # 3-join plan, VARCHAR keys, NULLs, mild skew
    ("two_join", 3, 2),   # + chunked (overlap-ready) exchange over gloo
    ("skew", 0, 2),       # heavy hitter takes 70% of the probe side
    ("empty", 0, 2),      # zero-result root (learned-empty replay)
    ("two_join", 0, 4),   # 4-process x 2-device decomposition
], ids=["monolithic", "chunked", "skew", "empty", "fourproc"])
def test_process_cluster_runs_whole_plan(tmp_path, scenario, dist_chunks,
                                         nprocs):
    """dist_chunks=3 additionally pins the chunked (overlap-ready)
    exchange over REAL cross-process collectives — gloo's all_to_all is
    a different implementation than the single-process CPU mesh's.
    Every variant checks both a cold run and the sync-free warm replay
    against the row oracle on every rank (VERDICT r1 #8)."""
    port = _free_port()
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
             "--local-devices", str(8 // nprocs), "--out", str(out),
             "--scenario", scenario,
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
