"""Shape-shared plan executor — the default execution strategy.

Why not one fused XLA program per query (plan/compiler.py)? A 113-query
suite lowers to 113+ distinct monster programs; on a remote-compile TPU
backend the compile bill dwarfs the compute. This executor instead runs
the plan as a chain of SMALL jitted kernels whose shapes are pow2-padded
(ops/join.py bucket_size), so the same compiled executable serves every
join of the same (build_pad, probe_pad, out_pad, dtype, payload signature)
across ALL queries — after a handful of queries everything is warm, even
with a cold disk cache.

Latency discipline (the reference pays none of this; a tunneled TPU pays
~30 ms per device->host sync):

* intermediates stay on device; kernels chain without host round trips;
* FK->PK joins (verified-unique build keys, ops/join.py
  ``join_unique_impl``) produce probe-shaped outputs — no output-size
  choice, hence NO sync at all;
* general joins write into a static bucket seeded by the probe pad and
  emit their exact ``total`` as a device scalar; all totals are fetched in
  ONE batched transfer at the root, and only overflowing joins (rare) are
  re-run with exact buckets — node results are memoized so the retry
  recomputes only the overflowed subtree;
* base-table device uploads are memoized on the host column object, so a
  table shared by many queries is transferred once per process.

Reference parity: this is the ``execute_impl`` tree walk
(src/execute.cpp:302-314) with the allocator-bound row loop replaced by
static-shape array programs.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import DataType
from ..ops import join as join_ops
from .ir import JoinNode, Plan, ScanNode

# ---------------------------------------------------------------------------
# Shape-shared jitted kernels (jax.jit caches by input shape/dtype/pytree)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_pad",))
def _join_general(kb, vb, kp, vp, bcols, pcols, out_pad: int):
    """Count + expand + gather for a duplicate-capable build side.

    ``bcols``/``pcols``: tuples of (data, valid) payload arrays. Returns
    (out_b, out_p, live, total) with outputs in the ``out_pad`` bucket.
    """
    perm, lo, _counts, offsets, total = join_ops.join_count_impl(kb, vb, kp, vp)
    bidx, pidx, live = join_ops.join_expand_impl(perm, lo, offsets, total, out_pad)
    out_b = tuple((d[bidx], v[bidx] & live) for d, v in bcols)
    out_p = tuple((d[pidx], v[pidx] & live) for d, v in pcols)
    return out_b, out_p, live, total


@jax.jit
def _join_unique(kb, vb, kp, vp, bcols):
    """FK->PK fast path: probe-shaped output, no bucket choice, no sync.

    Probe payloads are NOT passed through the kernel — the caller just
    ANDs ``found`` into their validity (see ``_mask_cols``).
    """
    bidx, found, total = join_ops.join_unique_impl(kb, vb, kp, vp)
    out_b = tuple((d[bidx], v[bidx] & found) for d, v in bcols)
    return out_b, found, total


@jax.jit
def _mask_cols(cols, mask):
    return tuple((d, v & mask) for d, v in cols)


@functools.partial(jax.jit, static_argnames=("n",))
def _slice_cols(arrays, n: int):
    return tuple(a[:n] for a in arrays)


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


class _NodeResult:
    """Device columns of one executed plan node."""

    __slots__ = ("cols", "total_dev", "pad", "compacted", "dicts")

    def __init__(self, cols, total_dev, pad, compacted, dicts):
        self.cols = cols  # list[(data, valid)]
        self.total_dev = total_dev  # device scalar or python int (scans)
        self.pad = pad
        self.compacted = compacted  # rows [0:total) are the live rows
        self.dicts = dicts  # per-col StringDict or None


def run_plan(plan: Plan, unique_joins: frozenset, max_attempts: int = 12):
    """Execute ``plan``; returns (root_result, totals_by_node) with exact
    buckets (retries overflowed general joins with exact sizes)."""
    from .. import engine as eng

    buckets: Dict[int, int] = {}
    order = plan.topo_order()
    join_ids = [
        i for i in order if isinstance(plan.nodes[i].data, JoinNode)
    ]
    results: Dict[int, _NodeResult] = {}
    valid_for: Dict[int, Tuple] = {}  # node -> bucket signature when computed

    for _attempt in range(max_attempts):
        # (re)compute nodes whose effective bucket signature changed
        for idx in order:
            node = plan.nodes[idx]
            if isinstance(node.data, ScanNode):
                if idx not in results:
                    results[idx] = _run_scan(eng, plan, idx, node)
                continue
            sig = (
                buckets.get(idx),
                valid_for.get(node.data.left),
                valid_for.get(node.data.right),
            )
            if valid_for.get(idx) == (sig, True):
                continue
            results[idx] = _run_join(
                eng, plan, idx, node, results, buckets, unique_joins
            )
            valid_for[idx] = (sig, True)

        # ONE batched fetch of every join's exact total. Small root outputs
        # ride along speculatively (valid unless a bucket overflowed), so a
        # warm query pays a single device->host round trip.
        totals_dev = [results[i].total_dev for i in join_ids]
        totals = [
            int(t) if isinstance(t, (int, np.integer)) else None
            for t in totals_dev
        ]
        fetch = [t for t in totals_dev if not isinstance(t, (int, np.integer))]
        root_res = results[plan.root]
        root_arrays = tuple(d for d, _ in root_res.cols) + tuple(
            v for _, v in root_res.cols
        )
        root_bytes = sum(
            int(a.shape[0]) * a.dtype.itemsize for a in root_arrays
        )
        prefetch_root = root_bytes <= (4 << 20)
        if fetch or prefetch_root:
            bundle = jax.device_get(
                (fetch, root_arrays if prefetch_root else ())
            )
            fetched = iter(bundle[0])
            totals = [
                t if t is not None else int(next(fetched)) for t in totals
            ]
            prefetched = bundle[1] if prefetch_root else None
        else:
            prefetched = None
        totals_by_node = dict(zip(join_ids, totals))

        # overflow check (unique joins can never overflow)
        exact: Dict[int, bool] = {}
        overflow = False
        for idx in join_ids:
            node = plan.nodes[idx]
            deps_ok = all(
                exact.get(d, True) for d in (node.data.left, node.data.right)
            )
            res = results[idx]
            fits = (not res.compacted) or totals_by_node[idx] <= res.pad
            exact[idx] = deps_ok and fits
            if deps_ok and not fits:
                buckets[idx] = join_ops.bucket_size(totals_by_node[idx])
                overflow = True
                valid_for.pop(idx, None)
            elif not deps_ok:
                if res.compacted:
                    buckets[idx] = max(
                        buckets.get(idx, res.pad) * 2, res.pad * 2
                    )
                valid_for.pop(idx, None)
        if not overflow and all(exact.get(i, True) for i in join_ids):
            return results[plan.root], totals_by_node, prefetched
        # drop descendants of invalidated nodes
        for idx in order:
            node = plan.nodes[idx]
            if isinstance(node.data, JoinNode):
                if (
                    node.data.left not in valid_for
                    and not isinstance(plan.nodes[node.data.left].data, ScanNode)
                ) or (
                    node.data.right not in valid_for
                    and not isinstance(plan.nodes[node.data.right].data, ScanNode)
                ):
                    valid_for.pop(idx, None)
    raise RuntimeError("plan did not converge to exact buckets")


def _run_scan(eng, plan: Plan, idx: int, node) -> _NodeResult:
    table = plan.inputs[node.data.base_table_id]
    host = table.to_host()
    pad = join_ops.bucket_size(host.num_rows)
    cols, dicts = [], []
    for ci, dt in node.output_attrs:
        hcol = host.columns[ci]
        if hcol.dtype is not dt:
            raise TypeError(
                f"scan output attr {ci}: declared {dt}, stored {hcol.dtype}"
            )
        dev = _device_column_cached(eng, hcol, pad)
        cols.append((dev.data, dev.valid))
        dicts.append(dev.dictionary)
    return _NodeResult(cols, host.num_rows, pad, True, dicts)


def _device_column_cached(eng, hcol, pad: int):
    """Upload memo: one transfer per (host column, pad) per process."""
    memo = getattr(hcol, "_dev_memo", None)
    if memo is None:
        memo = {}
        object.__setattr__(hcol, "_dev_memo", memo)
    dev = memo.get(pad)
    if dev is None:
        dev = eng.host_column_to_device(hcol, pad)
        memo[pad] = dev
    return dev


def _run_join(
    eng, plan: Plan, idx: int, node, results, buckets, unique_joins
) -> _NodeResult:
    from ..engine import DevColumn

    j = node.data
    left, right = results[j.left], results[j.right]
    left_w = len(plan.nodes[j.left].output_attrs)

    if j.build_left:
        build, probe = left, right
        battr, pattr = j.left_attr, j.right_attr
    else:
        build, probe = right, left
        battr, pattr = j.right_attr, j.left_attr

    # key normalization (types, FP64 canon, VARCHAR dictionary unification)
    bd, bv = build.cols[battr]
    pd, pv = probe.cols[pattr]
    bcol = DevColumn(
        plan.nodes[j.left if j.build_left else j.right].output_attrs[battr][1],
        bd, bv, build.dicts[battr],
    )
    pcol = DevColumn(
        plan.nodes[j.right if j.build_left else j.left].output_attrs[pattr][1],
        pd, pv, probe.dicts[pattr],
    )
    keys = eng.normalize_join_keys(bcol, pcol)

    # payload wiring: which child columns feed the output
    out_sources = []  # (from_build_side?, child_col_index)
    for ci, _dt in node.output_attrs:
        side_left = ci < left_w
        child_ci = ci if side_left else ci - left_w
        from_build = side_left == j.build_left
        out_sources.append((from_build, child_ci))

    if keys is None:
        pad = join_ops.bucket_size(0)
        zero = jnp.zeros((), jnp.int64)
        cols = []
        dicts = []
        for (fb, ci), (_, dt) in zip(out_sources, node.output_attrs):
            src = build if fb else probe
            data_dtype = src.cols[ci][0].dtype
            cols.append((
                jnp.zeros(pad, data_dtype), jnp.zeros(pad, bool)
            ))
            dicts.append(src.dicts[ci])
        return _NodeResult(cols, zero, pad, True, dicts)

    (kb, vb), (kp, vp) = keys

    bcols, bmap = [], {}
    pcols, pmap = [], {}
    for fb, ci in out_sources:
        if fb and ci not in bmap:
            bmap[ci] = len(bcols)
            bcols.append(build.cols[ci])
        if not fb and ci not in pmap:
            pmap[ci] = len(pcols)
            pcols.append(probe.cols[ci])

    unique = idx in unique_joins and bcol.dtype in (
        DataType.INT32, DataType.INT64
    )
    if unique and buckets.get(idx) is None:
        out_b, found, total = _join_unique(kb, vb, kp, vp, tuple(bcols))
        out_p = _mask_cols(tuple(pcols), found)
        pad = probe.pad
        compacted = False
    else:
        out_pad = buckets.get(idx) or probe.pad
        out_b, out_p, _live, total = _join_general(
            kb, vb, kp, vp, tuple(bcols), tuple(pcols), out_pad
        )
        pad = out_pad
        compacted = True

    cols, dicts = [], []
    for fb, ci in out_sources:
        cols.append(out_b[bmap[ci]] if fb else out_p[pmap[ci]])
        dicts.append((build if fb else probe).dicts[ci])
    return _NodeResult(cols, total, pad, compacted, dicts)


# ---------------------------------------------------------------------------
# Result extraction
# ---------------------------------------------------------------------------


def fetch_root(
    plan: Plan,
    root: _NodeResult,
    totals_by_node: Dict[int, int],
    prefetched=None,
):
    """Root columns -> HostTable (skips the transfer when the totals fetch
    already carried them)."""
    from ..storage.columnar import HostTable

    root_node = plan.nodes[plan.root]
    if isinstance(root_node.data, ScanNode):
        total = plan.inputs[root_node.data.base_table_id].num_rows
    else:
        total = totals_by_node[plan.root]

    # root joins are always compacted (the engine excludes the root from
    # the unique fast path) and scans are dense, so rows [0:total) are it
    if prefetched is not None:
        host_arrays = prefetched
    else:
        arrays = tuple(d for d, _ in root.cols) + tuple(
            v for _, v in root.cols
        )
        fetch_pad = min(join_ops.bucket_size(max(total, 1)), root.pad)
        if fetch_pad < root.pad:
            arrays = _slice_cols(arrays, fetch_pad)
        host_arrays = jax.device_get(arrays)
    k = len(root.cols)
    datas, valids = host_arrays[:k], host_arrays[k:]

    cols = []
    for (ci, dt), data, valid, d in zip(
        root_node.output_attrs, datas, valids, root.dicts
    ):
        cols.append(_np_column_to_host(dt, data[:total], valid[:total], d))
    return HostTable(total, cols)


def _np_column_to_host(dt, data, valid, dictionary):
    from ..storage.columnar import HostColumn, StringDict, gather_varlen

    data = np.asarray(data)
    valid = np.asarray(valid)
    if dt is DataType.VARCHAR:
        d = dictionary or StringDict.empty()
        if len(data) == 0 or d.size == 0:
            return HostColumn.varchar(
                np.zeros(0, np.uint8), np.zeros(len(data), np.int64), valid
            )
        ids = np.clip(data, 0, d.size - 1)
        starts = np.where(valid, d.starts[ids], 0)
        lengths = np.where(valid, d.lengths[ids], 0)
        heap, ends = gather_varlen(d.heap, starts, lengths)
        return HostColumn.varchar(heap, ends, valid)
    if dt is DataType.FP64:
        return HostColumn(dt, data.view(np.float64), valid)
    return HostColumn(dt, data, valid)


def execute_shared(plan: Plan, unique_joins: frozenset):
    """Full shape-shared execution: returns a HostTable."""
    root, totals, prefetched = run_plan(plan, unique_joins)
    return fetch_root(plan, root, totals, prefetched)
