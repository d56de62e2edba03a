"""Pallas kernel semantics (interpret mode on the CPU test mesh; the same
kernels lower through Mosaic on TPU — exercised by tools/roofline and the
TPU verify driver)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radixjoin_tpu.ops import pallas_kernels as pk


def test_block_join_lookup_unique():
    rng = np.random.default_rng(1)
    b, n = 256, 5000
    bk = rng.permutation(1000)[:b].astype(np.int32)
    bv = np.ones(b, bool)
    bv[7] = False  # invalid build row must never match
    pk_arr = rng.integers(0, 1000, n).astype(np.int32)
    pv = rng.random(n) > 0.1
    idx, cnt = pk.block_join_lookup(
        jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk_arr), jnp.asarray(pv)
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    lookup = {int(k): i for i, k in enumerate(bk) if bv[i]}
    for j in range(n):
        if pv[j] and int(pk_arr[j]) in lookup:
            assert cnt[j] == 1 and idx[j] == lookup[int(pk_arr[j])]
        else:
            assert cnt[j] == 0 and idx[j] == b


def test_block_join_lookup_duplicates_counts():
    bk = jnp.asarray(np.array([5, 5, 9, 5] + [0] * 124, np.int32))
    bv = jnp.asarray(np.array([True] * 4 + [False] * 124))
    pkeys = jnp.asarray(np.array([5, 9, 1], np.int32))
    pv = jnp.ones(3, bool)
    idx, cnt = pk.block_join_lookup(bk, bv, pkeys, pv)
    assert np.asarray(cnt).tolist() == [3, 1, 0]
    assert np.asarray(idx).tolist() == [0, 2, 128]
