"""Pallas kernel semantics (interpret mode on the CPU test mesh; the same
kernels lower through Mosaic on TPU — exercised by tools/roofline and the
TPU verify driver)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radixjoin_tpu.ops import pallas_kernels as pk


def test_window_gather_matches_numpy():
    rng = np.random.default_rng(2)
    for w in (100, 128, 1000, 4096):
        tabs = [
            rng.integers(-(1 << 31), 1 << 31, w).astype(np.int32)
            for _ in range(2)
        ]
        idx = rng.integers(0, w, 3000).astype(np.int32)
        outs = pk.window_gather([jnp.asarray(t) for t in tabs], jnp.asarray(idx))
        for t, o in zip(tabs, outs):
            np.testing.assert_array_equal(np.asarray(o), t[idx])


def test_blocked_window_gather_windowed_and_random():
    rng = np.random.default_rng(3)
    s_len = 100000
    src = rng.integers(-(1 << 31), 1 << 31, s_len).astype(np.int32)
    # block-windowed indices (the expansion bpos shape): slow advance
    base = np.repeat(np.arange(5000), 2)[:10000]
    idx = np.clip(base + rng.integers(0, 500, 10000), 0, s_len - 1).astype(
        np.int32
    )
    vals, ok = pk.blocked_window_gather(jnp.asarray(src), jnp.asarray(idx))
    vals, ok = np.asarray(vals), np.asarray(ok)
    assert ok.mean() > 0.95  # windowed indices mostly hit their window
    np.testing.assert_array_equal(vals[ok != 0], src[idx][ok != 0])
    # fully random indices: ok only where lucky, but exact wherever ok
    idx2 = rng.integers(0, s_len, 10000).astype(np.int32)
    v2, ok2 = pk.blocked_window_gather(jnp.asarray(src), jnp.asarray(idx2))
    v2, ok2 = np.asarray(v2), np.asarray(ok2)
    np.testing.assert_array_equal(v2[ok2 != 0], src[idx2][ok2 != 0])


def test_blocked_window_gather_extreme_values():
    vals = np.array(
        [0, 255, 256, (1 << 24) - 1, 1 << 24, -1, -(1 << 31), (1 << 31) - 1],
        np.int32,
    )
    src = np.zeros(20000, np.int32)
    src[:len(vals)] = vals
    idx = np.arange(len(vals), dtype=np.int32)
    out, ok = pk.blocked_window_gather(jnp.asarray(src), jnp.asarray(idx))
    assert np.asarray(ok)[: len(vals)].all()
    np.testing.assert_array_equal(np.asarray(out)[: len(vals)], vals)


def test_gather_expand_fallback_exact():
    # gather_expand must be exact even when every index misses its window
    import jax

    from radixjoin_tpu.ops import join as join_ops

    rng = np.random.default_rng(4)
    s_len = 50000
    src = jnp.asarray(
        rng.integers(-(1 << 31), 1 << 31, s_len).astype(np.int32)
    )
    pos = jnp.asarray(rng.integers(0, s_len, 20000).astype(np.int32))
    out = jax.jit(join_ops.gather_expand)(src, pos)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(src)[np.asarray(pos)]
    )
