#!/usr/bin/env python
"""Produce benchmarks/roofline_v3.json — the shipping-engine device-time
record (VERDICT r3 #2: round 3's kernel routing cited this record before
it existed; this tool creates it from live on-chip measurement).

Sections:
  * ``cases``      — devtime single-mode measurements (16M rows) of every
    e2e join path + the Mosaic gather kernels, with production routing
    (RJT_PALLAS_GATHER=on, RJT_BWG=on).
  * ``ab``         — RJT_BWG on/off A/B of the merge-expansion e2e join,
    and the (historical) misrouted CSR variant the r3 engine shipped:
    blocked_window_gather applied to CSR-shaped indices, quantifying why
    gather_expand now restricts the BWG tier to the merge expansion
    (ADVICE r3 #2).
  * ``missrate``   — measured fraction of indices that miss their block
    window for merge-expansion vs CSR-expansion index streams, on uniform
    and skewed workloads (VERDICT r3 weak #5: the fallback erases the win
    when misses occur; this quantifies when they occur).

Every devtime run happens in a SUBPROCESS so the RJT_* env toggles are
read at trace time with a clean jit cache.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE = 1 << 24


def log(msg):
    print(f"[roofline_v3 +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def run_devtime(cases, env_extra, tag, size=SIZE, timeout=3600):
    out = f"/tmp/roofline_v3_{tag}.json"
    env = dict(os.environ)
    env.update(env_extra)
    # PREPEND to PYTHONPATH — the axon TPU plugin lives on the existing
    # path (overwriting it kills backend init)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "radixjoin_tpu.harness.devtime",
           "--size", str(size), "--mode", "single",
           "--cases", ",".join(cases), "--json", out]
    log(f"devtime[{tag}] cases={cases} env={env_extra}")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout, cwd=REPO)
    sys.stderr.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        log(f"devtime[{tag}] FAILED rc={r.returncode}")
        return None
    with open(out) as f:
        return json.load(f)


def measure_missrate():
    """Eager miss-rate of blocked_window_gather for the two expansion
    index-stream shapes, uniform + skewed. Runs in-process (no timing —
    just the ok fraction, which is deterministic given the workload)."""
    import numpy as np

    code = r"""
import json, sys
import numpy as np
sys.path.insert(0, %r)
from radixjoin_tpu.ops import join as join_ops

def bwg_missrate(src_np, pos_np, live_np):
    # host-side replica of blocked_window_gather's window selection:
    # per 1024-output block, the aligned 2*1024 window containing the
    # block's smallest index; a row misses iff its index falls outside
    blk, win = 1024, 1024
    n = len(pos_np)
    npad = -(-n // blk) * blk
    pos_p = np.concatenate([pos_np, np.repeat(pos_np[-1:], npad - n)])
    blocks = pos_p.reshape(-1, blk)
    kblk = blocks.min(axis=1) // win
    rel = blocks - (kblk * win)[:, None]
    ok = ((rel >= 0) & (rel < 2 * win)).reshape(-1)[:n]
    return float(1.0 - ok[live_np].mean())

def streams(n, dup, skew, rng):
    b = n // dup
    nkeys = max(b // 2, 1)
    bk = rng.integers(0, nkeys, b)
    pkk = rng.integers(0, nkeys, n)
    if skew:
        # one heavy hitter holding ~0.2%% of each side: fan-out
        # (b/512)*(n/512) extra rows — a giant run without an
        # intractable cross product
        bk[: b // 512] = 7
        pkk[: n // 512] = 7
        rng.shuffle(bk); rng.shuffle(pkk)
    return bk.astype(np.int32), pkk.astype(np.int32)

out = {}
n = 1 << 20  # 1M rows: miss-rate is size-invariant, eager numpy is fine
rng = np.random.default_rng(0)
for skew in (False, True):
    tag = "skew" if skew else "uniform"
    bk, pkk = streams(n, 4, skew, rng)
    b = len(bk)
    # --- merge expansion (combined co-sort) ---
    keys = np.concatenate([bk, pkk])
    side = np.concatenate([np.zeros(b, np.int8), np.ones(n, np.int8)])
    ids = np.concatenate([np.arange(b), np.arange(n)])
    order = np.lexsort((side, keys))
    keys_s, side_s = keys[order], side[order]
    run_start = np.zeros(b + n, np.int64)
    new_run = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
    run_start = np.maximum.accumulate(
        np.where(new_run, np.arange(b + n), 0))
    is_probe = side_s == 1
    probe_excl = np.cumsum(is_probe) - is_probe
    probe_at_start = np.maximum.accumulate(
        np.where(new_run, probe_excl, 0))
    builds = (np.arange(b + n) - run_start) - (probe_excl - probe_at_start)
    counts = np.where(is_probe, builds, 0)
    offsets = np.cumsum(counts) - counts
    tot = int(counts.sum())
    sp = join_ops.bucket_size(tot)
    mark = np.full(sp + 1, -1, np.int64)
    nz = counts > 0
    np.maximum.at(mark, np.minimum(offsets[nz], sp), np.nonzero(nz)[0])
    owner = np.clip(np.maximum.accumulate(mark[:sp]), 0, b + n - 1)
    jj = np.arange(sp)
    bpos = np.clip(run_start[owner] + (jj - offsets[owner]), 0, b + n - 1)
    live = jj < tot
    out[f"merge_bpos_{tag}"] = bwg_missrate(keys_s, bpos, live)
    out[f"merge_owner_{tag}"] = bwg_missrate(keys_s, owner, live)
    # --- CSR expansion: gpos = start[pidx] + within (NOT windowed) ---
    w = join_ops.bucket_size(max(int(bk.max()) + 1, 128))
    counts_w = np.bincount(bk, minlength=w).astype(np.int64)
    starts_w = np.cumsum(counts_w) - counts_w
    cnt = counts_w[pkk]
    offs = np.cumsum(cnt) - cnt
    tot2 = int(cnt.sum())
    sp2 = join_ops.bucket_size(tot2)
    mark2 = np.full(sp2 + 1, -1, np.int64)
    nz2 = cnt > 0
    np.maximum.at(mark2, np.minimum(offs[nz2], sp2), np.nonzero(nz2)[0])
    own2 = np.clip(np.maximum.accumulate(mark2[:sp2]), 0, n - 1)
    jj2 = np.arange(sp2)
    gpos = np.clip(starts_w[pkk[own2]] + (jj2 - offs[own2]), 0, b - 1)
    live2 = jj2 < tot2
    out[f"csr_gpos_{tag}"] = bwg_missrate(None, gpos, live2)
    out[f"rows_{tag}"] = {"merge_out": tot, "csr_out": tot2}
print(json.dumps(out))
""" % (REPO,)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"  # host-side analysis; leave the TPU alone
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800,
                       cwd=REPO)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        log("missrate FAILED")
        return None
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    doc = {
        "record": "roofline_v3",
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "engine_note": (
            "production routing after ADVICE r3 #2: blocked_window_gather "
            "restricted to the merge expansion (ops/join.py gather_expand "
            "windowed=True); CSR/hash expansions use XLA gather for large "
            "sources, Mosaic window_gather for sources <= 4096"
        ),
    }

    # 1. production-path e2e cases + kernel microbenches
    main_cases = [
        "copy", "gather", "scatter_add", "sort_kv",
        "join_merge", "join_merge_e2e", "join_dev_csr", "join_csr",
        "unique_scatter", "bwg_windowed",
        "kpass_gather_1k", "kpass_gather_4k", "xla_gather_4k",
        "xla_gather_32k",
    ]
    doc["cases"] = run_devtime(main_cases, {}, "prod")

    # 2. A/B: merge e2e with the BWG tier off (pure XLA expansion gather)
    doc["ab"] = {}
    ab = run_devtime(["join_merge_e2e"], {"RJT_BWG": "off"}, "bwg_off")
    doc["ab"]["join_merge_e2e_bwg_off"] = ab
    ab2 = run_devtime(
        ["join_merge_e2e", "join_csr", "unique_scatter"],
        {"RJT_PALLAS_GATHER": "off"}, "pallas_off")
    doc["ab"]["pallas_gather_off"] = ab2

    # 3. miss-rate of the blocked-window assumption per index stream
    doc["missrate"] = measure_missrate()

    out_path = os.path.join(REPO, "benchmarks", "roofline_v3.json")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
