"""Pallas-level primitive experiments (round 2 of the kernel redesign).

Questions this script answers on the real chip:

  P1: does ANY in-kernel VMEM gather lower on Mosaic?
      (jnp.take / take_along_axis / one-hot matmul)
  P2: MXU int8 matmul throughput (one-hot permutation candidate)
  P3: VPU compare throughput (one-hot construction cost)
  P4: segmented (vmap'd) lax.sort vs one flat sort — partition hierarchy
  P5: associative_scan (cummax) and cumsum throughput at 16M
  P6: XLA scatter into a small window (VMEM-size W) vs large W

Run: python tools/expt_pallas.py [--cases a,b,c]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.harness.devtime import slope_time_ms, _chain
from radixjoin_tpu import hardware


def fmt(name, n, ms, note=""):
    rps = n / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    print(f"{name:<26} {ms:>9.3f} ms  {rps:>8.3f}G rows/s  {note}", flush=True)


# --- P1: in-kernel gather candidates ---------------------------------------


def _pallas_gather(kernel_body, n, w, blk=2048, table_2d=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tshape = (w // 128, 128) if table_2d else (w,)
    table = jnp.asarray(
        rng.integers(0, 1 << 30, w).astype(np.int32)
    ).reshape(tshape)
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    tspec = pl.BlockSpec(
        tshape, (lambda i: (0, 0)) if table_2d else (lambda i: (0,)),
        memory_space=pltpu.VMEM,
    )

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel_body,
            grid=(n // blk,),
            in_specs=[
                tspec,
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        )(table, idx)

    def step(c):
        table, idx = c
        out = run(table, idx)
        return _chain(table, out[0]), idx

    return step, (table, idx), n


def case_pallas_take(n, w):
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    return _pallas_gather(kernel, n, min(w, 1 << 20))


def case_pallas_take_unique(n, w):
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(
            table_ref[:], idx_ref[:], axis=0, unique_indices=True
        )

    return _pallas_gather(kernel, n, min(w, 1 << 20))


def case_pallas_ta_lanes(n, w):
    """take_along_axis over lanes: table tile (8,128), idx per element
    selects a lane — tests Mosaic's dynamic-gather-over-lanes op."""
    def kernel(table_ref, idx_ref, out_ref):
        blk = idx_ref.shape[0]
        t = table_ref[0:8, :]                      # (8,128)
        idx = idx_ref[:].reshape(blk // 128, 128)
        rows = jnp.broadcast_to(t[0:1, :], (blk // 128, 128))
        out_ref[:] = jnp.take_along_axis(
            rows, idx & 127, axis=1
        ).reshape(blk)

    return _pallas_gather(kernel, n, 1024, table_2d=True)


def case_pallas_onehot_mxu(n, w):
    """Gather from a 2048-entry VMEM table via one-hot matmul on the MXU:
    out = onehot(idx) @ table_planes (f32 exact for values < 2^24)."""
    w = 2048

    def kernel(table_ref, idx_ref, out_ref):
        blk = idx_ref.shape[0]
        idx = idx_ref[:]
        tbl = table_ref[:].astype(jnp.float32)     # (w,)
        oh = (
            idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, w), 1)
        ).astype(jnp.float32)
        out = jax.lax.dot_general(
            oh, tbl.reshape(w, 1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:] = out[:, 0].astype(jnp.int32)

    rng = np.random.default_rng(0)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    table = jnp.asarray(rng.integers(0, 1 << 20, w).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    blk = 2048

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(n // blk,),
            in_specs=[
                pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        )(table, idx)

    def step(c):
        table, idx = c
        out = run(table, idx)
        return _chain(table, out[0]), idx

    return step, (table, idx), n


# --- P2/P3: raw MXU / VPU rates --------------------------------------------


def case_mxu_int8(n, w):
    """(2048,2048) int8 @ (2048,128) int8 -> i32; reports effective
    "permuted rows/s" if the lhs were a one-hot permutation."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (2048, 2048)).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 127, (2048, 128)).astype(np.int8))

    def step(c):
        a, b = c
        o = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _chain(a, o[0, 0].astype(jnp.int8)), b

    return step, (a, b), 2048


def case_mxu_bf16(n, w):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (2048, 2048)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.integers(-128, 127, (2048, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def step(c):
        a, b = c
        o = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _chain(a, o[0, 0].astype(jnp.bfloat16)), b

    return step, (a, b), 2048


def case_vpu_compare(n, w):
    """All-pairs equality of a (n0,1) vs (1,128) tile chain — raw compare
    throughput; n0 chosen so the op count matches n rows at 128 cmp/row."""
    n0 = n // 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 20, n0).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 20, 128).astype(np.int32))

    def step(c):
        a, b = c
        m = (a[:, None] == b[None, :]).astype(jnp.int32)
        return _chain(a, jnp.sum(m)), b

    return step, (a, b), n  # n total compares


# --- P4: segmented sort ----------------------------------------------------


def case_sort_seg128(n, w):
    """(128, n/128) batched sort along the last axis (the per-partition
    sort if a 128-way partition pass existed)."""
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, 1 << 31, n).astype(np.int32)
    ).reshape(128, n // 128)
    ids = jnp.broadcast_to(
        jnp.arange(n // 128, dtype=jnp.int32)[None, :], (128, n // 128)
    )

    def step(c):
        keys, ids = c
        ks, vs = jax.lax.sort((keys, ids), dimension=1, num_keys=1)
        return _chain(keys, ks[0, 0] + vs[0, 0]), ids

    return step, (keys, ids), n


def case_sort_seg4096(n, w):
    rng = np.random.default_rng(0)
    segs = 4096
    keys = jnp.asarray(
        rng.integers(0, 1 << 31, n).astype(np.int32)
    ).reshape(segs, n // segs)
    ids = jnp.broadcast_to(
        jnp.arange(n // segs, dtype=jnp.int32)[None, :], (segs, n // segs)
    )

    def step(c):
        keys, ids = c
        ks, vs = jax.lax.sort((keys, ids), dimension=1, num_keys=1)
        return _chain(keys, ks[0, 0] + vs[0, 0]), ids

    return step, (keys, ids), n


def case_sort_u32_packed_seg(n, w):
    """Segment-local sort of (digit:8|local_id:16) packed u32 — the
    radix-partition inner sort candidate (64K-row segments max)."""
    rng = np.random.default_rng(0)
    segs = n // 65536
    digit = rng.integers(0, 256, n).astype(np.uint32)
    local = np.tile(np.arange(65536, dtype=np.uint32), segs)
    packed = jnp.asarray((digit << 16) | local).reshape(segs, 65536)

    def step(c):
        (p,) = c
        (s,) = jax.lax.sort((p,), dimension=1, num_keys=1)
        return (_chain(p, s[0, 0]),)

    return step, (packed,), n


# --- P5: scans -------------------------------------------------------------


def case_cummax(n, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

    def step(c):
        (x,) = c
        y = jax.lax.associative_scan(jnp.maximum, x)
        return (_chain(x, y[-1]),)

    return step, (x,), n


def case_cumsum(n, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))

    def step(c):
        (x,) = c
        y = jnp.cumsum(x)
        return (_chain(x, y[-1]),)

    return step, (x,), n


# --- P6: scatter into small vs large window --------------------------------


def _scatter_case(w):
    def case(n, _w):
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

        def step(c):
            idx, vals = c
            t = jnp.zeros(w, jnp.int32).at[idx].set(vals, mode="drop")
            return _chain(idx, t[0]), vals

        return step, (idx, vals), n

    return case


CASES = {
    "pallas_take": case_pallas_take,
    "pallas_take_unique": case_pallas_take_unique,
    "pallas_ta_lanes": case_pallas_ta_lanes,
    "pallas_onehot_mxu": case_pallas_onehot_mxu,
    "mxu_int8": case_mxu_int8,
    "mxu_bf16": case_mxu_bf16,
    "vpu_compare": case_vpu_compare,
    "sort_seg128": case_sort_seg128,
    "sort_seg4096": case_sort_seg4096,
    "sort_u32_packed_seg": case_sort_u32_packed_seg,
    "cummax": case_cummax,
    "cumsum": case_cumsum,
    "scatter_w64k": _scatter_case(1 << 16),
    "scatter_w1m": _scatter_case(1 << 20),
    "scatter_w16m": _scatter_case(1 << 24),
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
    for name in (args.cases.split(",") if args.cases else list(CASES)):
        try:
            step, carry, rows = CASES[name](args.size, args.window)
            ms = slope_time_ms(step, carry, args.k_lo, args.k_hi, reps=3)
            fmt(name, rows, ms)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<26} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
