"""Join-key normalization shared by every execution path.

The reference compares keys as typed C++ values (src/execute.cpp:215,
:231): doubles match by value (-0.0 == +0.0, NaN never equal) and strings
by content. Device-side we compare i64 bit patterns and dictionary ids,
so all engines (single-chip stepwise/fused, spill, distributed) must
apply the SAME two normalizations — this module is their single source:

- :func:`canon_f64_bits`: FP64 keys as bitcast int64 with -0.0
  canonicalized to +0.0 and NaN keys invalidated;
- :func:`joint_id_inverse`: two string dictionaries mapped onto one joint
  id space (exact ``np.unique`` merge) so id equality == byte equality.
"""

import numpy as np

import jax.numpy as jnp

F64_SIGN = np.int64(np.int64(-2) ** 63)  # 0x8000000000000000 == -0.0
F64_EXP = np.int64(0x7FF0000000000000)
F64_MANT = np.int64(0x000FFFFFFFFFFFFF)


def canon_f64_bits(bits, valid):
    """FP64 join-key canonicalization on i64 bit patterns.

    Works on jnp arrays (traced or not) and np arrays alike: ``-0.0`` bits
    become ``+0.0`` bits so they compare equal, and NaN rows are dropped
    from ``valid`` so NaN never matches. Returns ``(canon_bits, valid)``.
    """
    mod = np if isinstance(bits, np.ndarray) else jnp
    is_nan = ((bits & F64_EXP) == F64_EXP) & ((bits & F64_MANT) != 0)
    canon = mod.where(bits == F64_SIGN, mod.int64(0), bits)
    return canon, valid & ~is_nan


def joint_id_inverse(oa: np.ndarray, ob: np.ndarray):
    """Map two dictionaries' object arrays onto one joint id space.

    Returns ``(ra, rb, size)``: i32 lookup tables (old id -> joint id)
    for each side and the joint dictionary size. Equal byte strings get
    equal joint ids; everything else distinct ids.
    """
    if not (len(oa) or len(ob)):
        return np.zeros(0, np.int32), np.zeros(0, np.int32), 0
    uniq, inverse = np.unique(np.concatenate([oa, ob]), return_inverse=True)
    inverse = inverse.astype(np.int32)
    return inverse[: len(oa)], inverse[len(oa):], len(uniq)
