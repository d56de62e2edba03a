"""Round 3: Mosaic in-kernel gather forms (x64 disabled inside kernels).

"Only 2D gather is supported" (Mosaic, 2026-08-19) says SOME gather
lowers — find which, and how fast:

  g_rows   jnp.take(table_2d, idx, axis=0) — dynamic row gather, VMEM
  g_lanes  take_along_axis((B,128), idx&127, axis=1) — lane gather
  g_2level rows = take(table,(idx>>7),axis=0); lane = take_along_axis
           — full W-window gather from VMEM
  g_sub    take_along_axis along axis 0 (sublanes)

All kernels run under jax.enable_x64(False) to keep Mosaic's 32-bit
world. Reported as rows/s over n probe elements.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu import hardware  # noqa: F401  (enables x64 globally)


def measure(name, build, n, w, blk=2048, reps=5):
    try:
        with jax.enable_x64(False):
            run, table, idx = build(n, w, blk)

            def once():
                t0 = time.perf_counter()
                out = run(table, idx)
                np.asarray(jax.device_get(out.ravel()[:1]))
                return time.perf_counter() - t0

            once()
            once()
            ms = float(np.median([once() for _ in range(reps)]) * 1e3)
        # subtract the ~30ms floor measured separately; report raw too
        print(f"{name:<12} {ms:>9.2f} ms raw  "
              f"{n/(max(ms-30,1e-3)*1e-3)/1e9:>7.3f}G rows/s (floor-adj)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:<12} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


def _mk(n, w, kernel, blk, table_shape):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 20, w).astype(np.int32)
    ).reshape(table_shape)
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    ndim = len(table_shape)
    tmap = (lambda i: (0, 0)) if ndim == 2 else (lambda i: (0,))

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(n // blk,),
            in_specs=[
                pl.BlockSpec(table_shape, tmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((blk,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        )(table, idx)

    return run, table, idx


def build_rows(n, w, blk):
    rows2 = w // 128

    def kernel(table_ref, idx_ref, out_ref):
        # row gather: one row per probe, keep lane 0
        r = jnp.take(table_ref[:], idx_ref[:] >> 7, axis=0)  # (blk,128)
        out_ref[:] = r[:, 0]

    return _mk(n, w, kernel, blk, (rows2, 128))


def build_lanes(n, w, blk):
    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:].reshape(blk // 128, 128)
        base = jnp.broadcast_to(table_ref[0:1, :], (blk // 128, 128))
        out_ref[:] = jnp.take_along_axis(
            base, idx & 127, axis=1
        ).reshape(blk)

    return _mk(n, w, kernel, blk, (8, 128))


def build_2level(n, w, blk):
    rows2 = w // 128

    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        rows = jnp.take(table_ref[:], idx >> 7, axis=0)      # (blk,128)
        out_ref[:] = jnp.take_along_axis(
            rows, (idx & 127)[:, None], axis=1
        )[:, 0]

    return _mk(n, w, kernel, blk, (rows2, 128))


def build_sub(n, w, blk):
    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:].reshape(blk // 128, 128)
        base = jnp.broadcast_to(table_ref[:, 0:1], (8, 128))
        # gather along sublanes: out[s,l] = base[idx[s,l], l]
        sub = jnp.take_along_axis(base, idx[:8, :] & 7, axis=0)
        out_ref[:] = jnp.broadcast_to(
            sub[0:1, :], (blk // 128, 128)
        ).reshape(blk)

    return _mk(n, w, kernel, blk, (8, 128))


def main():
    n = 1 << 24
    for name, build, w in [
        ("g_lanes", build_lanes, 1 << 10),
        ("g_rows", build_rows, 1 << 20),
        ("g_2level", build_2level, 1 << 20),
        ("g_2level_64k", build_2level, 1 << 16),
        ("g_sub", build_sub, 1 << 10),
    ]:
        measure(name, build, n, w)


if __name__ == "__main__":
    main()
