"""Pallas TPU kernels for the join engine's hot vector loops.

Where the reference hand-rolls per-thread scalar loops (open-addressing
probe src/execute.cpp:211-248, page-bitmap decode build_table.cpp:318-336),
the TPU equivalents below are Mosaic kernels over 8x128 VPU tiles. Every
kernel here has a production caller (VERDICT r1 #6):

* :func:`window_gather` — VPU-speed random gather from small shared
  tables (join small-window lookups, plan/executor.py).
* :func:`paged_window_gather` — batched per-page window gather (the
  device-side page decode, storage/device_decode.py).
* :func:`blocked_window_gather_multi` — output-size lookups on
  monotone/block-windowed index streams (the join expansions' owner/bpos
  streams and pre-sorted payload planes, ops/join.py).

Deleted after r1 (docs/PARITY.md records why): bitmap_pack/unpack
(superseded by fused XLA broadcast-shift-mask in device_decode),
hash_bucket (no faster than the jnp murmur finalizer it would replace),
radix_histogram (skew detection samples on the host, never on device),
compare_mask (predicates evaluate host-side before page encode).

All kernels run in Mosaic on TPU and fall back to `interpret=True`
elsewhere (the CPU test mesh), selected once at trace time.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
TILE = LANE * SUBLANE  # 1024: the natural i32 VPU tile


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# x64-proofing: the engine enables jax_enable_x64 globally, but Mosaic has
# no 64-bit vector types. Every loop-free kernel here is written to trace
# clean under x64 — index maps return np.int32 constants (a bare `0`
# literal becomes an i64 func.return), reductions carry explicit i32
# dtypes, and 64-bit operands are pre-split into i32 planes
# (:func:`_split64`). This keeps every kernel here embeddable inside the
# engine's x64 jits. The one exception is the histogram: its fori_loop
# induction variable is i64 under an x64 trace and Mosaic cannot lower the
# i64->i32 conversion, so its core compiles under :func:`_jit32` and it is
# NOT embeddable in x64 jits.
_I0 = np.int32(0)


class _x32:
    def __enter__(self):
        self._cm = jax.enable_x64(False)
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)


def _jit32(fn, **jit_kwargs):
    """jax.jit whose trace AND Mosaic lowering run with x64 disabled (the
    compile happens at first call, inside the scope)."""
    jitted = jax.jit(fn, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _x32():
            return jitted(*args, **kwargs)

    return wrapper


def _split64(x: jnp.ndarray):
    """int64 -> (hi int32, lo int32) planes. Mosaic has no 64-bit vector
    types, so 64-bit keys are compared as two 32-bit lanes inside kernels
    (hi signed, lo unsigned)."""
    lo = jax.lax.convert_element_type(x & jnp.int64(0xFFFFFFFF), jnp.uint32)
    hi = (x >> 32).astype(jnp.int32)
    return hi, jax.lax.bitcast_convert_type(lo, jnp.int32)


def _pad_to(x: jnp.ndarray, size: int, fill=0):
    if x.shape[0] == size:
        return x
    return jnp.pad(x, (0, size - x.shape[0]), constant_values=fill)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Window gather: VPU-speed random gather from small tables
# ---------------------------------------------------------------------------
#
# XLA's gather lowers to ~0.116G rows/s on v5e regardless of table size
# (measured 2026-08-19, benchmarks/roofline_v2_16M.json) — the single
# biggest cost in the production join paths. Mosaic's dynamic lane-gather
# (take_along_axis over the 128-lane axis) runs at ~16.5G rows/s, but only
# selects within 128 lanes; this kernel covers a table of W = K*128
# entries with K broadcast+gather+select passes, so the win scales as
# ~16.5/K G rows/s: every enum-table join window in JOB (info_type=113,
# kind_type, role_type, ...) is K=1, and FK windows up to a few thousand
# ids stay well ahead of XLA's gather. Embeddable in x64 jits (i32-only
# trace; one gather per table per pass).

#: largest window routed to the Pallas gather (K = 4096/128 = 32 passes
#: ~= 0.5G rows/s, ~4x XLA's gather; beyond that XLA wins on VMEM reuse)
WINDOW_GATHER_MAX = 4096


def any_window_gather(tables, idx):
    """Shared-index window lookup via the K-pass lane-gather. (The name
    survives from a two-kernel router whose MXU one-hot tier was removed:
    its (N,1) operand layout costs 128x HBM on TPU — see the
    blocked-window section note.)"""
    return window_gather(tables, idx)

_WG_BLK = SUBLANE * LANE * 8  # 8192 probe elements per grid step


def _lane_gather(vals: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(vals, lane, axis=1) with i32 indices (the jnp
    wrapper upcasts indices to i64 under x64, which Mosaic cannot lower;
    this exact lax.gather form IS Mosaic's dynamic lane-gather)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        vals, lane[..., None], dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _window_gather_kernel(*refs, k: int, tables: int):
    idx_ref = refs[tables]
    out_refs = refs[tables + 1:]
    idx = idx_ref[:]  # (s, LANE) i32 in [0, k*128)
    lane = idx & np.int32(LANE - 1)
    row = idx >> np.int32(7)
    accs = [jnp.zeros(idx.shape, jnp.int32) for _ in range(tables)]
    for kk in range(k):
        hit = row == np.int32(kk)
        for t in range(tables):
            vals = jnp.broadcast_to(
                refs[t][kk, :][None, :], idx.shape
            )
            g = _lane_gather(vals, lane)
            accs[t] = jnp.where(hit, g, accs[t])
    for t in range(tables):
        out_refs[t][:] = accs[t]


def window_gather(tables, idx: jnp.ndarray):
    """``[t[idx] for t in tables]`` for small i32 tables via Mosaic
    lane-gathers. ``tables``: list of (W,) int32 arrays sharing one
    index vector (a CSR join gathers counts+starts at the same offsets —
    they ride one pass). ``idx`` must already be clamped to [0, W).
    Traces clean inside x64 programs."""
    tables = list(tables)
    w = tables[0].shape[0]
    k = _cdiv(w, LANE)
    n = idx.shape[0]
    npad = _cdiv(max(n, 1), _WG_BLK) * _WG_BLK
    idx_p = _pad_to(idx.astype(jnp.int32), npad).reshape(
        npad // LANE, LANE
    )
    tabs_p = [
        _pad_to(t.astype(jnp.int32), k * LANE).reshape(k, LANE)
        for t in tables
    ]
    s_blk = _WG_BLK // LANE
    grid = npad // _WG_BLK
    outs = pl.pallas_call(
        functools.partial(
            _window_gather_kernel, k=k, tables=len(tables)
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (k, LANE), lambda i: (_I0, _I0), memory_space=pltpu.VMEM
            )
        ] * len(tables) + [
            pl.BlockSpec(
                (s_blk, LANE), lambda i: (i, _I0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (s_blk, LANE), lambda i: (i, _I0),
                memory_space=pltpu.VMEM,
            )
        ] * len(tables),
        out_shape=[
            jax.ShapeDtypeStruct((npad // LANE, LANE), jnp.int32)
        ] * len(tables),
        interpret=_interpret(),
    )(*tabs_p, idx_p)
    return [o.reshape(-1)[:n] for o in outs]


# ---------------------------------------------------------------------------
# Paged window gather: each row gathers from its OWN small window
# ---------------------------------------------------------------------------


def _paged_gather_kernel(body_ref, idx_ref, out_ref, *, k: int):
    body = body_ref[:]  # (k, LANE): this page's words
    idx = idx_ref[:]    # (ro // LANE, LANE)
    lane = idx & np.int32(LANE - 1)
    row = idx >> np.int32(7)
    acc = jnp.zeros(idx.shape, jnp.int32)
    for kk in range(k):
        hit = row == np.int32(kk)
        g = _lane_gather(jnp.broadcast_to(body[kk][None, :], idx.shape), lane)
        acc = jnp.where(hit, g, acc)
    out_ref[:] = acc


def paged_window_gather(body: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``out[p, r] = body[p, idx[p, r]]``: batched per-page window gather.

    The device page-decode path (storage/device_decode.py) aligns each
    row's packed value position inside its own 8 KiB page; the gather
    window is that page's 2048 words, so each grid step holds one page's
    body in VMEM and runs the K-pass Mosaic lane-gather of
    :func:`window_gather` against it. ``body``: (npages, W) int32 with W a
    multiple of 128; ``idx``: (npages, Ro) int32 in [0, W), Ro a multiple
    of 128. Traces clean inside x64 programs (i32 only).
    """
    npages, w = body.shape
    _, ro = idx.shape
    assert w % LANE == 0 and ro % LANE == 0, (w, ro)
    k, rr = w // LANE, ro // LANE
    # Mosaic blocks need sublane counts divisible by 8: pad the index
    # rows up (zero index = in-bounds word 0; the padding is sliced off)
    rrp = _cdiv(rr, SUBLANE) * SUBLANE
    idx_p = idx.astype(jnp.int32)
    if rrp != rr:
        idx_p = jnp.concatenate(
            [idx_p, jnp.zeros((npages, (rrp - rr) * LANE), jnp.int32)],
            axis=1,
        )
    # pre-shape to (npages*k, LANE) so each block is one page already in
    # Mosaic's native (sublane, lane) tiling — no in-kernel reshape
    body2 = body.reshape(npages * k, LANE)
    idx2 = idx_p.reshape(npages * rrp, LANE)
    out = pl.pallas_call(
        functools.partial(_paged_gather_kernel, k=k),
        grid=(npages,),
        in_specs=[
            pl.BlockSpec((k, LANE), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rrp, LANE), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rrp, LANE), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((npages * rrp, LANE), jnp.int32),
        interpret=_interpret(),
    )(body2, idx2)
    return out.reshape(npages, rrp * LANE)[:, :ro]


# ---------------------------------------------------------------------------
# Blocked-window gather: big-table gathers whose indices are locally dense
# ---------------------------------------------------------------------------
#
# The join expansion's duplicate gathers (ids_sorted[bpos], grouped[gpos])
# index into arrays far larger than any VMEM window, but their indices are
# *block-windowed*: run starts advance no faster than output positions, so
# any block of consecutive output slots draws from a bounded span of the
# source (ops/join.py join_expand_merge_impl). This kernel scalar-
# prefetches a per-block window start, rides the source window in via two
# adjacent BlockSpec blocks (any span <= _BWG_WIN fits some aligned
# 2*_BWG_WIN window), and selects in-window with the same K-pass
# lane-gather as :func:`window_gather` — K = 2*_BWG_WIN/128 passes per
# block regardless of source size. Rows whose index falls outside their
# block's window report ok=0; the caller patches them with a lax.cond'd
# XLA gather that only executes on the (skewed) queries that need it —
# see ops/join.py gather_expand.
#
# Everything stays in natural (sublane, 128) tiling: an earlier MXU
# one-hot row-select design needed (N, 1) column-vector operands, which
# TPU tiles to (8, 128) — a 128x HBM blowup (16 GB at N=16M, compile-time
# OOM) — and in-kernel (s,128)<->(T,1) reshapes crash this Mosaic
# version's compiler.

_BWG_BLK = 1024           # output elements per grid step -> (8, 128) block
_BWG_WIN = 1024           # window alignment unit; coverage = 2 windows


def _bwg_kernel(*refs, win: int, tables: int):
    kblk_ref = refs[0]
    idx_ref = refs[1 + 2 * tables]
    val_refs = refs[2 + 2 * tables: 2 + 3 * tables]
    ok_ref = refs[2 + 3 * tables]
    wrows = win // LANE
    i = pl.program_id(0)
    base = kblk_ref[i] * np.int32(win)
    idx = idx_ref[:]                       # (s, 128) i32 absolute
    rel = idx - base                       # in-window iff [0, 2*win)
    # numeric in-window flag with i32 clip bounds throughout: bare Python
    # ints in jnp.clip become i64 scalars under the engine's x64 trace,
    # and Mosaic's i64->i32 convert lowering recurses forever
    _i1 = np.int32(1)
    ok = (
        jnp.clip(rel + _i1, _I0, _i1)
        * jnp.clip(np.int32(2 * win) - rel, _I0, _i1)
    )
    relc = jnp.clip(rel, _I0, np.int32(2 * win - 1))
    lane = relc & np.int32(LANE - 1)
    row = relc >> np.int32(7)
    accs = [jnp.zeros(idx.shape, jnp.int32) for _ in range(tables)]
    for kk in range(2 * wrows):
        hit = row == np.int32(kk)
        for t in range(tables):
            win_a, win_b = refs[1 + 2 * t], refs[2 + 2 * t]
            src = win_a[kk, :] if kk < wrows else win_b[kk - wrows, :]
            vals = jnp.broadcast_to(src[None, :], idx.shape)
            g = _lane_gather(vals, lane)
            accs[t] = jnp.where(hit, g, accs[t])
    for t in range(tables):
        val_refs[t][:] = accs[t]
    ok_ref[:] = ok


def blocked_window_gather_multi(tables, idx: jnp.ndarray,
                                win: int = _BWG_WIN):
    """``(vals_list, ok)`` with ``vals_list[t][j] = tables[t][idx[j]]``
    wherever ``ok[j]``. All tables share one index stream and one window
    selection (sized by the LONGEST table), so K tables ride a single
    kernel launch — the expansion's owner-indexed lookups and the
    pre-sorted payload columns all share their index stream
    (ops/join.py). Tables may have different lengths; ``idx`` must be
    clamped to [0, len(t)) per use site (shorter tables are zero-padded
    to the longest, so in-range indexes of each table read real data).

    Each block of ``_BWG_BLK`` consecutive outputs gathers from the
    2*``win``-entry aligned window containing its smallest index; rows
    outside it get ``ok = 0`` (callers patch via fallback). ``win`` must
    be a multiple of 128. Traces clean inside x64 programs (i32 only)."""
    assert win % LANE == 0
    tables = list(tables)
    n = idx.shape[0]
    s = max(t.shape[0] for t in tables)
    npad = _cdiv(max(n, 1), _BWG_BLK) * _BWG_BLK
    idx32 = idx.astype(jnp.int32)
    # edge-pad: zero-fill would drag the last block's window start to 0,
    # knocking its real entries out of window
    idx_p = (
        idx32 if npad == n
        else jnp.pad(idx32, (0, npad - n), mode="edge")
    )
    nblocks = npad // _BWG_BLK
    # per-block window start in aligned win-units (clamped so window B
    # always exists)
    kmax = _cdiv(s, win)  # srcs padded to (kmax + 1) * win below
    blo = jnp.min(idx_p.reshape(nblocks, _BWG_BLK), axis=1)
    kblk = jnp.clip(blo // np.int32(win), 0, max(kmax - 1, 0)).astype(
        jnp.int32
    )
    wrows = win // LANE
    srcs2d = [
        _pad_to(t.astype(jnp.int32), (kmax + 1) * win).reshape(
            (kmax + 1) * wrows, LANE
        )
        for t in tables
    ]
    s_blk = _BWG_BLK // LANE
    nt = len(tables)

    def _win_a(i, kref):
        return (kref[i], _I0)

    def _win_b(i, kref):
        return (kref[i] + 1, _I0)

    def _stream(i, kref):
        return (i, _I0)

    in_specs = []
    operands = []
    for t in range(nt):
        in_specs.append(pl.BlockSpec(
            (wrows, LANE), _win_a, memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (wrows, LANE), _win_b, memory_space=pltpu.VMEM))
        operands.extend((srcs2d[t], srcs2d[t]))
    in_specs.append(pl.BlockSpec(
        (s_blk, LANE), _stream, memory_space=pltpu.VMEM))
    operands.append(idx_p.reshape(nblocks * s_blk, LANE))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((s_blk, LANE), _stream, memory_space=pltpu.VMEM)
        ] * (nt + 1),
    )
    outs = pl.pallas_call(
        functools.partial(_bwg_kernel, win=win, tables=nt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * s_blk, LANE), jnp.int32)
        ] * (nt + 1),
        interpret=_interpret(),
    )(kblk, *operands)
    vals = [o.reshape(-1)[:n] for o in outs[:nt]]
    ok = outs[nt].reshape(-1)[:n]
    return vals, ok


def blocked_window_gather(src: jnp.ndarray, idx: jnp.ndarray,
                          win: int = _BWG_WIN):
    """Single-table form of :func:`blocked_window_gather_multi`."""
    vals, ok = blocked_window_gather_multi([src], idx, win)
    return vals[0], ok
