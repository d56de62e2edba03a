"""Round 3: stream_gather (monotone windowed gather) vs XLA gather.

VERDICT r2 #2: the general join is gather-bound — XLA's random gather is
~0.117 G rows/s at any size. The expand phase's index vectors are
monotone (owner = cummax, sorted-CSR positions), so each block of
consecutive indices covers a narrow table window: stream_gather
(ops/pallas_kernels.py) prefetches per-block windows via
PrefetchScalarGridSpec and lane-gathers in VMEM.

Measures (single-call wall minus floor, like devtime --mode single):

  xla_rand      out = table[idx], idx uniform random       (baseline)
  xla_mono      out = table[idx], idx sorted               (does XLA care?)
  stream_mono   stream_gather, idx sorted, W = N
  stream_mono2  stream_gather, idx sorted, W = N/4 (denser coverage)
  stream_fan    stream_gather, idx = fan-out-2 expansion shape
                (each value repeated ~2x — the join expand distribution)
  scatter_sorted XLA scatter-max with SORTED destinations (the marker
                scatter in join expand — candidate for merge_ranks)

Run on the real chip: python tools/expt_gather3.py [--size N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu import hardware  # noqa: F401  (enables x64 globally)
from radixjoin_tpu.harness.devtime import measure_floor_ms


def bench(name, fn, args, n, floor_ms, reps=5, check=None):
    try:
        f = jax.jit(fn)
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))
        if check is not None:
            check(out)

        def once():
            t0 = time.perf_counter()
            o = f(*args)
            lf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(jax.device_get(lf.ravel()[:1]))
            return time.perf_counter() - t0

        once()
        ms = float(np.median([once() for _ in range(reps)]) * 1e3)
        net = max(ms - floor_ms, 1e-3)
        print(f"{name:<16} {ms:>9.2f} ms raw {net:>9.2f} net  "
              f"{n/(net*1e-3)/1e9:>7.3f} G rows/s", flush=True)
        return net
    except Exception as e:  # noqa: BLE001
        print(f"{name:<16} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 24)
    ap.add_argument("--cases", type=str, default=None)
    args = ap.parse_args()
    n = args.size
    want = set(args.cases.split(",")) if args.cases else None

    from radixjoin_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    idx_mono = jnp.asarray(np.sort(np.asarray(idx_rand)))
    # fan-out-2 expansion shape: positions repeat ~dup times
    idx_fan = jnp.asarray(
        np.sort(rng.integers(0, n // 2, n).astype(np.int32))
    )
    table4 = table[: n // 4]
    idx_mono4 = jnp.asarray(
        np.sort(rng.integers(0, n // 4, n).astype(np.int32))
    )

    floor = measure_floor_ms()
    print(f"n={n:,}  floor={floor:.1f} ms  device={jax.devices()[0]}")

    def xla_gather(t, i):
        return t[i]

    def stream(t, i):
        outs, hit = pk.stream_gather([t], i)
        return outs[0], hit

    def check_stream(expected_tab, expected_idx):
        def chk(out):
            got, hit = np.asarray(out[0]), np.asarray(out[1])
            exp = np.asarray(expected_tab)[np.asarray(expected_idx)]
            nmiss = int((hit == 0).sum())
            ok = np.array_equal(got[hit == 1], exp[hit == 1])
            print(f"   [check: misses={nmiss}/{len(got)} "
                  f"hits-exact={ok}]", flush=True)
        return chk

    def scatter_sorted(dst_idx, vals):
        out = jnp.full(2 * n, -1, jnp.int32)
        return out.at[dst_idx].max(vals, mode="drop")

    starts = jnp.asarray(
        np.sort(rng.choice(2 * n, n, replace=False)).astype(np.int32)
    )
    vals = jnp.arange(n, dtype=jnp.int32)

    cases = {
        "xla_rand": lambda: bench("xla_rand", xla_gather, (table, idx_rand),
                                  n, floor),
        "xla_mono": lambda: bench("xla_mono", xla_gather, (table, idx_mono),
                                  n, floor),
        "stream_mono": lambda: bench(
            "stream_mono", stream, (table, idx_mono), n, floor,
            check=check_stream(table, idx_mono)),
        "stream_mono2": lambda: bench(
            "stream_mono2", stream, (table4, idx_mono4), n, floor,
            check=check_stream(table4, idx_mono4)),
        "stream_fan": lambda: bench(
            "stream_fan", stream, (table, idx_fan), n, floor,
            check=check_stream(table, idx_fan)),
        "scatter_sorted": lambda: bench(
            "scatter_sorted", scatter_sorted, (starts, vals), n, floor),
    }
    for name, fn in cases.items():
        if want is None or name in want:
            fn()


if __name__ == "__main__":
    main()
