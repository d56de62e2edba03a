"""Pallas kernel semantics (interpret mode on the CPU test mesh; the same
kernels lower through Mosaic on TPU — exercised by tools/roofline and the
TPU verify driver)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radixjoin_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("n", [1, 7, 8, 1000, 8192, 10_001])
def test_bitmap_roundtrip(n):
    rng = np.random.default_rng(n)
    mask = rng.random(n) > 0.4
    packed = np.asarray(pk.bitmap_pack(jnp.asarray(mask)))
    # little-endian bit order per the page spec
    expected = np.packbits(mask, bitorder="little")
    assert packed.tolist() == expected.tolist()
    back = np.asarray(pk.bitmap_unpack(jnp.asarray(packed), n))
    assert (back == mask).all()


def test_hash_bucket_range_and_spread():
    keys = jnp.asarray(np.arange(10_000, dtype=np.int32))
    b = np.asarray(pk.hash_bucket(keys, 64))
    assert b.min() >= 0 and b.max() < 64
    counts = np.bincount(b, minlength=64)
    assert counts.min() > 50  # avalanche: no empty/steamrolled buckets


def test_radix_histogram_exact():
    rng = np.random.default_rng(0)
    n, p = 50_000, 32
    bucket = rng.integers(0, p, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    got = np.asarray(pk.radix_histogram(
        jnp.asarray(bucket), jnp.asarray(valid), p
    ))
    expected = np.bincount(bucket[valid], minlength=p)
    assert got.tolist() == expected.tolist()


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


@pytest.mark.parametrize("op,expected", [
    ("eq", [False, True, False]),
    ("ne", [True, False, True]),
    ("lt", [True, False, False]),
    ("le", [True, True, False]),
    ("gt", [False, False, True]),
    ("ge", [False, True, True]),
])
def test_compare_mask(op, expected):
    x = jnp.asarray(np.array([1, 5, 9], np.int32))
    assert np.asarray(pk.compare_mask(x, op, 5)).tolist() == expected
