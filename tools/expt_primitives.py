"""Primitive-level experiments for the round-2 join kernel redesign.

Measures candidate TPU formulations of the two operations that dominate
the join kernels (devtime v2 record, benchmarks/roofline_v2_16M.json):

  * random 1-element gather  (~0.13 G rows/s via XLA — transaction-bound)
  * multi-operand lax.sort   (~5 GB/s effective)

Candidates measured here (same fori_loop slope methodology as
harness/devtime.py, pure device time):

  gather_1d          XLA baseline: out = table[idx]
  gather_row128      row-trick: table as (W/128,128); gather rows idx>>7
                     (128x waste but tile-sized transactions), then select
                     the lane with a one-hot reduction
  gather_row128_ta   same rows, lane select via take_along_axis
  gather_pallas_vmem Pallas kernel, table resident in VMEM, per-block
                     dynamic gather (tests Mosaic's vector gather support)
  sort_5op           lax.sort of (u8,i32,u8,i32,u8) — the merge join's sort
  sort_1op_i64       same information packed into ONE i64 sort key
  scatter_1d         XLA baseline: table.at[idx].set(vals)

Run: python tools/expt_primitives.py [--size N] [--window W]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.harness.devtime import slope_time_ms, _chain
from radixjoin_tpu import hardware


def fmt(name, n, ms, nbytes):
    gbps = nbytes / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    rps = n / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    print(f"{name:<22} {ms:>9.3f} ms  {rps:>8.3f}G rows/s  {gbps:>8.1f} GB/s",
          flush=True)


def case_gather_1d(n, w):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, w).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    def step(c):
        table, idx = c
        out = table[idx]
        return _chain(table, out[0]), idx

    return step, (table, idx), n, n * 8 + w * 4


def case_gather_row128(n, w):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, w).astype(np.int32)
                        ).reshape(w // 128, 128)
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    lane_iota = jnp.arange(128, dtype=jnp.int32)

    def step(c):
        table, idx = c
        rows = table[idx >> 7]                      # (n,128) row gather
        onehot = (idx[:, None] & 127) == lane_iota  # (n,128) bool
        out = jnp.sum(jnp.where(onehot, rows, 0), axis=1)
        return _chain(table, out[0]), idx

    return step, (table, idx), n, n * 8 + w * 4


def case_gather_row128_ta(n, w):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, w).astype(np.int32)
                        ).reshape(w // 128, 128)
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    def step(c):
        table, idx = c
        rows = table[idx >> 7]
        out = jnp.take_along_axis(
            rows, (idx[:, None] & 127), axis=1
        )[:, 0]
        return _chain(table, out[0]), idx

    return step, (table, idx), n, n * 8 + w * 4


def case_gather_pallas_vmem(n, w):
    """Table resident in VMEM; probes blocked through the grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert w * 4 <= 8 * 1024 * 1024, "table must fit VMEM"
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, w).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    BLK = 4096

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:]]

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        )(table, idx)

    def step(c):
        table, idx = c
        out = run(table, idx)
        return _chain(table, out[0]), idx

    return step, (table, idx), n, n * 8 + w * 4


def case_gather_sorted(n, w):
    """Gather with MONOTONE indices (the expand kernels' access pattern is
    near-monotone): is XLA's gather index-distribution-sensitive?"""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, w).astype(np.int32))
    idx = jnp.asarray(np.sort(rng.integers(0, w, n)).astype(np.int32))

    def step(c):
        table, idx = c
        out = table[idx]
        return _chain(table, out[0]), idx

    return step, (table, idx), n, n * 8 + w * 4


def _gather_w(w):
    def case(n, _w):
        return case_gather_1d(n, w)

    return case


def case_sort_5op(n, w):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    inval = jnp.zeros(n, jnp.uint8)
    side = jnp.asarray(rng.integers(0, 2, n).astype(np.uint8))
    ids = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones(n, jnp.uint8)

    def step(c):
        inval, keys, side, ids, valid = c
        a, b, cc, d, e = jax.lax.sort(
            (inval, keys, side, ids, valid), num_keys=3
        )
        return _chain(inval, b[0] + d[0]), keys, side, ids, valid

    return step, (inval, keys, side, ids, valid), n, n * 14 * 2


def case_sort_1op_i64(n, w):
    """(invalid:1 | key:32 | side:1 | id:30) packed in one i64."""
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, w, n).astype(np.int64))
    side = jnp.asarray(rng.integers(0, 2, n).astype(np.int64))
    ids = jnp.arange(n, dtype=jnp.int64)

    def step(c):
        keys, side, ids = c
        packed = (keys << 31) | (side << 30) | ids
        (s,) = jax.lax.sort((packed,), num_keys=1)
        return _chain(keys, s[0]), side, ids

    return step, (keys, side, ids), n, n * 16


def case_sort_2op_i32(n, w):
    """Key sort carrying one i32 payload (the dev_csr grouped sort)."""
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    ids = jnp.arange(n, dtype=jnp.int32)

    def step(c):
        keys, ids = c
        a, b = jax.lax.sort((keys, ids), num_keys=1)
        return _chain(keys, a[0] + b[0]), ids

    return step, (keys, ids), n, n * 16


def case_scatter_1d(n, w):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

    def step(c):
        idx, vals = c
        table = jnp.zeros(w, jnp.int32).at[idx].set(vals, mode="drop")
        return _chain(idx, table[0]), vals

    return step, (idx, vals), n, n * 8 + w * 4


CASES = {
    "gather_1d": case_gather_1d,
    "gather_sorted": case_gather_sorted,
    "gather_w8k": _gather_w(1 << 13),
    "gather_w64k": _gather_w(1 << 16),
    "gather_w16m": _gather_w(1 << 24),
    "gather_row128": case_gather_row128,
    "gather_row128_ta": case_gather_row128_ta,
    "gather_pallas_vmem": case_gather_pallas_vmem,
    "sort_5op": case_sort_5op,
    "sort_1op_i64": case_sort_1op_i64,
    "sort_2op_i32": case_sort_2op_i32,
    "scatter_1d": case_scatter_1d,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 24)
    ap.add_argument("--window", type=int, default=1 << 20)
    ap.add_argument("--cases", type=str, default=None)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=6)
    args = ap.parse_args()

    spec = hardware.detect()
    print(f"chip {spec.name} HBM {spec.hbm_gbps:.0f} GB/s  "
          f"n={args.size:,} window={args.window:,}", flush=True)
    names = args.cases.split(",") if args.cases else list(CASES)
    for name in names:
        try:
            step, carry, rows, nbytes = CASES[name](args.size, args.window)
            ms = slope_time_ms(step, carry, args.k_lo, args.k_hi, reps=3)
            fmt(name, rows, ms, nbytes)
        except Exception as e:  # noqa: BLE001 - experiment: report and go on
            print(f"{name:<22} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
