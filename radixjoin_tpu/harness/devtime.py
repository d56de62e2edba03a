"""Device-time roofline harness (v2 methodology).

The v1 harness (:mod:`.roofline`) timed host wall-clock through the
tunneled runtime, whose ~27 ms per-fetch RPC floor dominates sub-50 ms
kernels — at 1M rows it measured the link, not the chip. This module
measures **pure device time** with zero profiler dependencies:

  each kernel is wrapped in ``jit(fori_loop(0, K, step, carry))`` for two
  iteration counts K_lo < K_hi; the per-iteration device time is the
  *slope* ``(t(K_hi) - t(K_lo)) / (K_hi - K_lo)``, which cancels every
  constant cost — dispatch, tunnel RTT, result fetch — exactly.

Each ``step`` threads a genuine data dependency through the carry (a
data-dependent ``where`` on a scalar derived from the kernel's outputs)
so XLA can neither hoist the kernel out of the loop nor dead-code any
output stage. The dependency consumes outputs through ops XLA cannot
narrow (full-array reductions of the final outputs are counted in
``min_bytes`` where they add a physical pass).

``min_bytes`` is the algorithmic minimum traffic (each input element read
once, each output written once), so ``pct_roofline`` honestly charges
sort-based kernels for their extra passes. Speed of light is the chip's
HBM bandwidth (:mod:`radixjoin_tpu.hardware`): join kernels do no
matmuls, so they sit on the memory-bound side of the roofline.

Run: ``python -m radixjoin_tpu.harness.devtime [--size N] [--json PATH]``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import hardware
from ..ops import join as join_ops


@dataclasses.dataclass
class Measurement:
    kernel: str
    rows: int
    device_ms: float
    rows_per_s: float
    min_bytes: int
    eff_gbps: float
    pct_roofline: float
    #: False when a single-mode measurement landed below the RPC floor's
    #: noise band — the floor subtraction is then meaningless and the
    #: derived throughput must not be quoted (r2 verdict: "copy" once
    #: printed 16,388% of roofline). Use slope mode for such kernels.
    reliable: bool = True

    def row(self) -> str:
        tail = "" if self.reliable else "  SUB-FLOOR (use slope mode)"
        return (
            f"{self.kernel:<26} {self.rows:>12,} {self.device_ms:>9.3f} "
            f"{self.rows_per_s/1e9:>8.3f}G {self.eff_gbps:>8.1f} "
            f"{self.pct_roofline*100:>6.1f}%{tail}"
        )


def slope_time_ms(
    step: Callable, carry, k_lo: int = 2, k_hi: int = 10, reps: int = 3
) -> float:
    """Per-iteration device ms of ``step`` via the two-point slope."""

    def make(k):
        @jax.jit
        def run(c):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), c)

        return run

    f_lo, f_hi = make(k_lo), make(k_hi)

    def run_sync(f):
        """Dispatch + REAL sync. ``block_until_ready`` under-reports on the
        tunneled axon runtime (it can return before execution completes),
        so sync by fetching one element of the first carry leaf — a
        constant-cost D2H round trip that the slope cancels."""
        out = f(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))
        return out

    run_sync(f_lo)  # compile both programs + settle the runtime
    run_sync(f_hi)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_sync(f_lo)
        t1 = time.perf_counter()
        run_sync(f_hi)
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (k_hi - k_lo))
    return float(np.median(samples) * 1e3)


def measure_floor_ms(reps: int = 7) -> float:
    """Constant per-call overhead of the runtime: dispatch + tunnel RTT +
    result sync on a trivial jitted program. Subtracted by
    :func:`single_time_ms`."""
    tiny = jnp.arange(8, dtype=jnp.int32)

    @jax.jit
    def ident(x):
        return x ^ 1

    def once():
        t0 = time.perf_counter()
        out = ident(tiny)
        np.asarray(jax.device_get(out.ravel()[:1]))
        return time.perf_counter() - t0

    once()  # compile
    return float(np.median([once() for _ in range(reps)]) * 1e3)


def single_time_ms(step, carry, reps: int = 5,
                   floor_ms: Optional[float] = None):
    """Device time of ONE ``step`` call: wall-clock through a full sync
    minus the measured constant floor. Returns ``(ms, reliable)``.

    The fori_loop slope (:func:`slope_time_ms`) is exact but its
    while-loop wrapper makes sort/scan-heavy join programs pathologically
    slow to compile on the remote-compile backend (~15 min per program at
    16M, measured 2026-08-19) — two programs per case is unusable. At
    multi-ms kernel sizes the constant floor (~27 ms RPC) is small
    relative to the kernel, so single-shot floor-subtraction is accurate
    to a few percent; use sizes >= 4M rows with this mode.

    ``reliable`` is False when the net time lands inside the floor's
    noise band (net < 25% of the floor): the subtraction is then
    meaningless and callers must not quote the derived throughput
    (r2 verdict weak #4 — a sub-floor "copy" once printed 16,388% of
    roofline)."""
    if floor_ms is None:
        floor_ms = measure_floor_ms()
    f = jax.jit(step)

    def once():
        t0 = time.perf_counter()
        out = f(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))
        return time.perf_counter() - t0

    once()  # compile + settle
    once()
    raw_ms = float(np.median([once() for _ in range(reps)]) * 1e3)
    net = raw_ms - floor_ms
    return max(net, 1e-3), net >= 0.25 * floor_ms


def _chain(arr, scalar):
    """Data-dependence glue: returns ``arr`` unchanged at runtime, but in
    a way XLA cannot fold (the predicate is data-dependent)."""
    return jnp.where(scalar >= jnp.array(-1, scalar.dtype), arr, arr + 1)


def _consume(*arrays):
    """Scalar that depends on every element of every array (one physical
    read pass per array — charged in min_bytes by the cases that use it
    on arrays not already reduced inside the kernel)."""
    total = jnp.zeros((), jnp.int64)
    for a in arrays:
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.int32)
        total = total + jnp.sum(a.astype(jnp.int64) & 0xFF)
    return total


def _measure(name, rows, ms, min_bytes, spec, reliable=True) -> Measurement:
    eff = min_bytes / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    return Measurement(
        name, rows, ms, rows / (ms * 1e-3) if ms > 0 else float("inf"),
        min_bytes, eff, eff / spec.hbm_gbps, reliable,
    )


def _inputs(n: int, dtype=np.int32, dup: int = 4, seed: int = 0):
    """Standard join workload: build = n/dup rows, probe = n rows, keys
    uniform over the build id range (every probe matches ~1 build row)."""
    rng = np.random.default_rng(seed)
    b = n // dup
    bk = jnp.asarray(rng.permutation(b).astype(dtype))  # unique build keys
    bv = jnp.ones(b, bool)
    pk = jnp.asarray(rng.integers(0, b, n).astype(dtype))
    pv = jnp.ones(n, bool)
    return b, bk, bv, pk, pv


def _dup_inputs(n: int, dtype=np.int32, dup: int = 4, seed: int = 0):
    """Duplicate-capable build side: keys uniform over b/2 distinct values
    (~2 builds per key, fan-out 2)."""
    rng = np.random.default_rng(seed)
    b = n // dup
    bk = jnp.asarray(rng.integers(0, b // 2, b).astype(dtype))
    bv = jnp.ones(b, bool)
    pk = jnp.asarray(rng.integers(0, b // 2, n).astype(dtype))
    pv = jnp.ones(n, bool)
    return b, bk, bv, pk, pv


# ---------------------------------------------------------------------------
# Cases. Each returns (step, carry, rows, min_bytes).
# ---------------------------------------------------------------------------


def case_copy(n: int):
    """Bandwidth baseline: one read + one write pass of i32 (xor chain —
    ``x + 1`` per iteration would constant-fold across the loop)."""
    x = jnp.arange(n, dtype=jnp.int32)

    def step(c):
        (x,) = c
        y = x ^ (x >> 1)
        return (_chain(y, y[0]),)

    return step, (x,), n, n * 4 * 2


def case_gather(n: int):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

    def step(c):
        vals, idx = c
        out = vals[idx]
        return _chain(vals, out[0]), idx

    # read vals + idx, write out (random-access reads cost more physically)
    return step, (vals, idx), n, n * 4 * 3


def case_scatter_add(n: int):
    """Histogram scatter-add over a 2^20 window (the dev_csr build step)."""
    rng = np.random.default_rng(0)
    w = 1 << 20
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    def step(c):
        (idx,) = c
        hist = jnp.zeros(w, jnp.int32).at[idx].add(1, mode="drop")
        return (_chain(idx, hist[0]),)

    return step, (idx,), n, n * 4 + w * 4


def case_sort_kv(n: int):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(c):
        keys, iota = c
        ks, vs = jax.lax.sort((keys, iota), num_keys=1)
        return _chain(keys, ks[0] + vs[0]), iota

    return step, (keys, iota), n, n * 4 * 4


def case_join_merge(n: int):
    """Production general join, count phase (single co-sort + scans)."""
    _b, bk, bv, pk, pv = _dup_inputs(n)

    def step(c):
        bk, bv, pk, pv = c
        ids_s, run_start, counts, offsets, total = join_ops.join_merge_impl(
            bk, bv, pk, pv
        )
        s = total + _consume(ids_s, run_start, offsets)
        return _chain(bk, s), bv, pk, pv

    b = bk.shape[0]
    min_bytes = (b + n) * (4 + 1) + n * 8 * 2
    return step, (bk, bv, pk, pv), n, min_bytes


def _exact_out_pad(bk, pk) -> int:
    """Exact fan-out of the synthetic workload, host-side — the bucket a
    production run would learn via cardinality feedback. (The v3 record's
    cases padded to bucket_size(2.5n) = 2x the real output, double-
    charging every output-size op.)"""
    bk_np, pk_np = np.asarray(bk), np.asarray(pk)
    counts = np.bincount(bk_np, minlength=int(pk_np.max()) + 1)
    return join_ops.bucket_size(int(counts[pk_np].sum()))


def case_join_merge_e2e(n: int):
    """General join end-to-end, production formulation: single sort with
    SORT-CARRIED payload planes (join_merge_full_impl) — no serial XLA
    gather anywhere — of one build + one probe payload column, at the
    exact learned bucket."""
    b, bk, bv, pk, pv = _dup_inputs(n)
    rng = np.random.default_rng(1)
    bpay = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
    ppay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    s_pad = _exact_out_pad(bk, pk)

    def step(c):
        bk, bv, pk, pv, bpay, ppay = c
        out_b, out_p, live, total = join_ops.join_merge_full_impl(
            bk, bv, pk, pv, s_pad, [(bpay, bv)], [(ppay, pv)],
        )
        s = total + _consume(out_b[0][0], out_p[0][0], live)
        return _chain(bk, s), bv, pk, pv, bpay, ppay

    out_rows = 2 * n  # expected fan-out
    min_bytes = (b + n) * (4 + 1 + 4) + out_rows * (4 + 4 + 1)
    return step, (bk, bv, pk, pv, bpay, ppay), out_rows, min_bytes


def case_sort_carry(n: int, k: int):
    """Marginal cost of one carried i32 sort operand: the packed-i64
    single-key sort of join_merge_impl at combined size 1.25n, with k
    carried planes. The (carry_k - carry_0) delta per k prices the
    sort-carried payload routing of join_merge_full_impl."""
    rng = np.random.default_rng(0)
    m = n + n // 4  # combined (build + probe) size at dup=4
    packed = jnp.asarray(rng.integers(0, 1 << 62, m).astype(np.int64))
    planes = [
        jnp.asarray(rng.integers(0, 1 << 30, m).astype(np.int32))
        for _ in range(k)
    ]

    def step(c):
        packed, *planes = c
        out = jax.lax.sort((packed,) + tuple(planes), num_keys=1)
        s = _consume(out[0])
        return (_chain(packed, s),) + tuple(out[1:])

    min_bytes = m * (8 + 4 * k) * 2
    return step, (packed, *planes), m, min_bytes


def case_scatter_max_starts(n: int):
    """The owner-recovery scatter in isolation (production shape:
    join_expand_impl / _merge_owner_recovery / join_csr_impl): n sorted
    starts scatter-max their index into a 2n+1 marker, then a cummax
    fills the runs. THE serial wall left in every general-join
    expansion once gathers are windowed and payloads sort-carried."""
    rng = np.random.default_rng(0)
    s_pad = 2 * n
    gaps = rng.integers(1, 4, n)
    starts_np = np.minimum(
        (np.cumsum(gaps) - gaps[0]).astype(np.int32), s_pad
    )
    starts = jnp.asarray(starts_np)

    def step(c):
        (starts,) = c
        marker = jnp.full(s_pad + 1, -1, dtype=jnp.int32)
        marker = marker.at[starts].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        owner = jax.lax.cummax(marker[:s_pad])
        return (_chain(starts, _consume(owner)),)

    min_bytes = n * 4 + s_pad * 4 * 3  # scatter write + cummax r/w
    return step, (starts,), s_pad, min_bytes


def case_scatter_max_sorted(n: int):
    """scatter_max_starts with the ``indices_are_sorted`` hint: the
    owner-recovery scatter's indices (exclusive-prefix offsets) ARE
    sorted — if XLA's TPU scatter lowering exploits the hint, owner
    recovery stops being serial with zero kernel work."""
    rng = np.random.default_rng(0)
    s_pad = 2 * n
    gaps = rng.integers(1, 4, n)
    starts_np = np.minimum(
        (np.cumsum(gaps) - gaps[0]).astype(np.int32), s_pad
    )
    starts = jnp.asarray(starts_np)

    def step(c):
        (starts,) = c
        marker = jnp.full(s_pad + 1, -1, dtype=jnp.int32)
        marker = marker.at[starts].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop",
            indices_are_sorted=True,
        )
        owner = jax.lax.cummax(marker[:s_pad])
        return (_chain(starts, _consume(owner)),)

    min_bytes = n * 4 + s_pad * 4 * 3
    return step, (starts,), s_pad, min_bytes


def case_gather_sorted(n: int):
    """Random-valued gather whose indices are SORTED (monotone
    non-decreasing), with the ``indices_are_sorted`` hint — prices
    what a sort-then-gather route would pay for its gather leg."""
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    idx = jnp.asarray(np.sort(rng.integers(0, n, n)).astype(np.int32))

    def step(c):
        vals, idx = c
        out = jnp.take(vals, idx, indices_are_sorted=True)
        return _chain(vals, out[0]), idx

    return step, (vals, idx), n, n * 4 * 3


def case_cummax(n: int):
    """lax.cummax i32 alone (the scan half of owner recovery)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-1, 1 << 30, n).astype(np.int32))

    def step(c):
        (x,) = c
        y = jax.lax.cummax(x)
        return (_chain(x, _consume(y)),)

    return step, (x,), n, n * 4 * 2


def case_unique_scatter_dim(n: int, b: int = 1024):
    """Dimension-table FK->PK join end-to-end: a ``b``-key unique build
    side (enum/dimension tables: JOB's info_type=113, kind_type=8,
    company_type=4, role_type=12...) probed by n rows, payload
    materialized. The whole lookup path rides the K-pass Mosaic lane
    gather (window <= WINDOW_GATHER_MAX), so unlike the big-window
    cases this shape has no serial op anywhere — the demonstration
    that the engine reaches HBM-roofline-class throughput when the
    build side fits a VMEM window (the most common JOB join step)."""
    rng = np.random.default_rng(0)
    bk = jnp.asarray(rng.permutation(b).astype(np.int32))
    bv = jnp.ones(b, bool)
    pk = jnp.asarray(rng.integers(0, b, n).astype(np.int32))
    pv = jnp.ones(n, bool)
    bpay = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
    r_pad = join_ops.bucket_size(b)
    base = jnp.zeros((), jnp.int64)

    def step(c):
        bk, bv, pk, pv, bpay = c
        bidx, found, total = join_ops.join_unique_scatter_impl(
            bk, bv, pk, pv, base, r_pad
        )
        (ob,) = join_ops.gather_expand_multi([bpay], bidx)
        s = total + _consume(ob, found)
        return _chain(bk, s), bv, pk, pv, bpay

    # read pk+pv, write payload out + found; build side negligible
    min_bytes = n * (4 + 1) + n * (4 + 1) + 3 * r_pad * 4
    return step, (bk, bv, pk, pv, bpay), n, min_bytes


def case_join_dev_csr(n: int):
    """Device-built CSR general join over a dense window, end-to-end."""
    b, bk, bv, pk, pv = _dup_inputs(n)
    rng = np.random.default_rng(1)
    bpay = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
    ppay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    r_pad = join_ops.bucket_size(max(b // 2, 128))
    s_pad = _exact_out_pad(bk, pk)
    base = jnp.zeros((), jnp.int64)

    def step(c):
        bk, bv, pk, pv, bpay, ppay = c
        bidx, pidx, live, total = join_ops.join_dev_csr_impl(
            bk, bv, pk, pv, base, r_pad, s_pad
        )
        # production shape (fused._trace): build payloads by bidx
        # (random), probe payloads by the monotone pidx (blocked-window)
        from ..ops.join import gather_expand_multi

        (ob,) = gather_expand_multi([bpay], bidx)
        (op,) = gather_expand_multi([ppay], pidx, windowed=True)
        s = total + _consume(ob, op, live)
        return _chain(bk, s), bv, pk, pv, bpay, ppay

    out_rows = 2 * n
    min_bytes = (b + n) * (4 + 1 + 4) + out_rows * (4 + 4 + 1)
    return step, (bk, bv, pk, pv, bpay, ppay), out_rows, min_bytes


def case_unique_scatter(n: int):
    """FK->PK scatter-table join end-to-end (probe-shaped output)."""
    b, bk, bv, pk, pv = _inputs(n)
    rng = np.random.default_rng(1)
    bpay = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
    r_pad = join_ops.bucket_size(b)
    base = jnp.zeros((), jnp.int64)

    def step(c):
        bk, bv, pk, pv, bpay = c
        bidx, found, total = join_ops.join_unique_scatter_impl(
            bk, bv, pk, pv, base, r_pad
        )
        ob = bpay[bidx]
        s = total + _consume(ob, found)
        return _chain(bk, s), bv, pk, pv, bpay

    min_bytes = (b + n) * (4 + 1) + b * 4 + n * (4 + 1) + r_pad * 4
    return step, (bk, bv, pk, pv, bpay), n, min_bytes


def case_join_csr(n: int):
    """Host-pregrouped CSR join end-to-end (build side = base scan)."""
    b, bk, bv, pk, pv = _dup_inputs(n)
    rng = np.random.default_rng(1)
    bpay = jnp.asarray(rng.integers(0, 1 << 30, b).astype(np.int32))
    ppay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    # host-side CSR build (mirrors HostColumn.csr_index)
    bk_np = np.asarray(bk)
    w = join_ops.bucket_size(b // 2)
    counts_w = jnp.asarray(np.bincount(bk_np, minlength=w).astype(np.int32))
    starts_w = jnp.asarray(
        (np.cumsum(np.asarray(counts_w)) - np.asarray(counts_w)).astype(np.int32)
    )
    grouped = jnp.asarray(
        np.argsort(bk_np, kind="stable").astype(np.int32)
    )
    grouped = jnp.pad(grouped, (0, join_ops.bucket_size(b) - b))
    base = jnp.zeros((), jnp.int64)
    s_pad = _exact_out_pad(bk, pk)

    def step(c):
        counts_w, starts_w, grouped, pk, pv, bpay, ppay = c
        bidx, pidx, live, total = join_ops.join_csr_impl(
            counts_w, starts_w, grouped, pk, pv, base, s_pad
        )
        from ..ops.join import gather_expand_multi

        (ob,) = gather_expand_multi([bpay], bidx)
        (op,) = gather_expand_multi([ppay], pidx, windowed=True)
        s = total + _consume(ob, op, live)
        return counts_w, starts_w, _chain(grouped, s), pk, pv, bpay, ppay

    out_rows = 2 * n
    min_bytes = n * (4 + 1) + w * 8 + b * 4 + out_rows * (4 + 4 + 1)
    return (
        step,
        (counts_w, starts_w, grouped, pk, pv, bpay, ppay),
        out_rows,
        min_bytes,
    )


def case_fill_starts(n: int):
    """REJECTED expansion design, kept measurable: i64 packed scatter at
    sorted starts + i64 cummax as a segmented value broadcast (would
    have replaced the owner-attribute gathers in join_expand_*). On v5e
    this measured 2,282 ms for 33.5M slots (0.015 G rows/s) — slower
    than the three XLA gathers it replaces (i64 scatter/cummax are hi/lo
    emulated), so the production expansion kept the i32-marker + gather
    formulation (whose owner-stream lookups now ride the blocked-window
    pass, benchmarks/roofline_v3.json). This case IS the committed record
    of the negative result; the 2,282 ms figure is quoted inline because
    re-measuring a rejected design on every record refresh wastes chip
    time."""
    rng = np.random.default_rng(0)
    s_pad = 2 * n
    gaps = rng.integers(1, 4, n)
    starts_np = (np.cumsum(gaps) - gaps[0]).astype(np.int32)
    starts_np = np.minimum(starts_np, s_pad)
    starts = jnp.asarray(starts_np)
    values = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32))

    def step(c):
        starts, values = c
        rank1 = jnp.arange(1, n + 1, dtype=jnp.int64)
        packed = (rank1 << 32) | (
            values.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        )
        marker = jnp.full(s_pad + 1, -1, dtype=jnp.int64)
        marker = marker.at[starts].max(packed, mode="drop")
        filled = jax.lax.cummax(marker[:s_pad])
        rank = (filled >> 32).astype(jnp.int32) - 1
        val = (filled & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
        return _chain(starts, _consume(rank, val)), values

    min_bytes = n * 8 + s_pad * 8 * 2  # scatter write + cummax read/write
    return step, (starts, values), s_pad, min_bytes


def _case_window_gather(n: int, w: int):
    from ..ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, w).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    def step(c):
        tab, idx = c
        (out,) = pk.window_gather([tab], idx)
        return _chain(tab, _consume(out)), idx

    return step, (tab, idx), n, n * 4 * 2 + w * 4


def case_bwg_windowed(n: int):
    """blocked_window_gather on expansion-shaped (block-windowed) indices
    over a source far beyond any VMEM window."""
    from ..ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    s = n  # source as large as the index stream
    src = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, s).astype(np.int32))
    base = np.minimum(np.arange(n) // 2, s - 600).astype(np.int32)
    idx = jnp.asarray(
        np.minimum(base + rng.integers(0, 500, n), s - 1).astype(np.int32)
    )

    def step(c):
        src, idx = c
        vals, ok = pk.blocked_window_gather(src, idx)
        return _chain(src, _consume(vals, ok)), idx

    return step, (src, idx), n, n * 4 * 3


def case_xla_gather_win(n: int, w: int):
    """XLA gather from the same small window (the routing baseline)."""
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, w).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

    def step(c):
        tab, idx = c
        out = tab[idx]
        return _chain(tab, _consume(out)), idx

    return step, (tab, idx), n, n * 4 * 2 + w * 4


CASES: Dict[str, Callable] = {
    "copy": case_copy,
    "gather": case_gather,
    "scatter_add": case_scatter_add,
    "sort_kv": case_sort_kv,
    "sort_carry0": lambda n: case_sort_carry(n, 0),
    "sort_carry2": lambda n: case_sort_carry(n, 2),
    "sort_carry4": lambda n: case_sort_carry(n, 4),
    "scatter_max_starts": case_scatter_max_starts,
    "scatter_max_sorted": case_scatter_max_sorted,
    "gather_sorted": case_gather_sorted,
    "cummax": case_cummax,
    "join_merge": case_join_merge,
    "join_merge_e2e": case_join_merge_e2e,
    "join_dev_csr": case_join_dev_csr,
    "join_csr": case_join_csr,
    "unique_scatter": case_unique_scatter,
    "unique_scatter_dim1k": lambda n: case_unique_scatter_dim(n, 1 << 10),
    "unique_scatter_dim4k": lambda n: case_unique_scatter_dim(n, 1 << 12),
    "fill_starts": case_fill_starts,
    "kpass_gather_1k": lambda n: _case_window_gather(n, 1 << 10),
    "kpass_gather_2k": lambda n: _case_window_gather(n, 1 << 11),
    "kpass_gather_4k": lambda n: _case_window_gather(n, 1 << 12),
    "kpass_gather_8k": lambda n: _case_window_gather(n, 1 << 13),
    "kpass_gather_16k": lambda n: _case_window_gather(n, 1 << 14),
    "bwg_windowed": case_bwg_windowed,
    "xla_gather_4k": lambda n: case_xla_gather_win(n, 1 << 12),
    "xla_gather_32k": lambda n: case_xla_gather_win(n, 1 << 15),
}


def run(
    size: int = 1 << 24,
    reps: int = 3,
    cases: Optional[List[str]] = None,
    spec: Optional[hardware.ChipSpec] = None,
    k_lo: int = 2,
    k_hi: int = 10,
) -> List[Measurement]:
    spec = spec or hardware.detect()
    out = []
    for name in cases or list(CASES):
        step, carry, rows, min_bytes = CASES[name](size)
        ms = slope_time_ms(step, carry, k_lo, k_hi, reps)
        out.append(_measure(name, rows, ms, min_bytes, spec))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=1 << 24, help="probe rows")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=10)
    ap.add_argument("--cases", type=str, default=None, help="comma list")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument(
        "--mode", choices=("slope", "single"), default="slope",
        help="slope: fori_loop two-point slope (exact, but sort-heavy "
             "programs compile ~15 min each inside the loop wrapper); "
             "single: one-call wall-clock minus measured RPC floor "
             "(use for join cases at >= 4M rows)",
    )
    args = ap.parse_args(argv)

    spec = hardware.detect()
    floor = measure_floor_ms() if args.mode == "single" else None
    print(
        f"chip: {spec.name}  HBM {spec.hbm_gbps:.0f} GB/s  "
        f"(device {jax.devices()[0]})  n={args.size:,}  mode={args.mode}"
        + (f"  floor={floor:.1f}ms" if floor is not None else "")
    )
    names = args.cases.split(",") if args.cases else None
    results = []
    print(f"{'kernel':<26} {'rows':>12} {'dev_ms':>9} {'rows/s':>9} "
          f"{'GB/s':>8} {'%roof':>7}")
    for name in names or list(CASES):
        step, carry, rows, min_bytes = CASES[name](args.size)
        reliable = True
        if args.mode == "single":
            ms, reliable = single_time_ms(step, carry, max(args.reps, 5), floor)
        else:
            ms = slope_time_ms(step, carry, args.k_lo, args.k_hi, args.reps)
        m = _measure(name, rows, ms, min_bytes, spec, reliable)
        results.append(m)
        print(m.row(), flush=True)
    if args.json:
        doc = {
            "methodology": (
                "single-call wall-clock minus measured RPC floor"
                if args.mode == "single"
                else "fori_loop slope (device time; constant "
                     "dispatch/RTT cancels)"
            ),
            "chip": spec.name,
            "hbm_gbps": spec.hbm_gbps,
            "size": args.size,
            "k": [args.k_lo, args.k_hi],
            "floor_ms": floor,
            "results": [dataclasses.asdict(m) for m in results],
        }
        with open(args.json, "w") as f:
            json.dump(doc, f, indent=2)


if __name__ == "__main__":
    main()
