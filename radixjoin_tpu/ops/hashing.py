"""Key hashing for radix partitioning and distributed shuffle.

Same family as the reference's hash (reference src/execute.cpp:16-41):
a Murmur3 64-bit finalizer for integer keys and FNV-1a for byte strings.
The exact functions need not match the reference (hashes never escape the
engine); what matters is high-entropy low bits, since radix partitioning
and the all-to-all shuffle route on ``hash & (num_partitions - 1)``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def murmur64(keys: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 finalizer over int keys -> uint64 hashes. Vectorized."""
    k = keys.astype(jnp.uint64)
    k = k ^ (k >> 33)
    k = k * jnp.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> 33)
    k = k * jnp.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> 33)
    return k


def murmur64_np(keys: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`murmur64` for host-side partitioning."""
    with np.errstate(over="ignore"):
        k = keys.astype(np.uint64)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
    return k


def fnv1a64_np(values: np.ndarray) -> np.ndarray:
    """FNV-1a over an object array of ``bytes`` -> uint64 (host side).

    Strings are dictionary-encoded before they reach the device, so string
    hashing only happens on the host (reference hashes strings per probe,
    src/execute.cpp:32-39 — we hash each distinct value once instead).
    """
    out = np.empty(len(values), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    basis = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for i, v in enumerate(values):
            h = basis
            for b in v:
                h ^= np.uint64(b)
                h *= prime
            out[i] = h
    return out


def fnv1a64(ids: jnp.ndarray) -> jnp.ndarray:
    """Device-side stand-in: dictionary ids are ints; mix them like ints."""
    return murmur64(ids)
