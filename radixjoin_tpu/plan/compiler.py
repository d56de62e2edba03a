"""Whole-plan compiler: one fused XLA program per query.

The reference *interprets* the join tree node by node over row vectors
(src/execute.cpp:302-314). Interpreting on an accelerator would pay a
host-device round trip per operator (the dominant cost: D2H latency is
~tens of ms on tunneled links and never free). This compiler instead lowers
the ENTIRE plan — every scan, key normalization, join count, duplicate
expansion, and payload gather — into a single jitted program:

* all base-table columns are packed on the host into ONE uint8 buffer
  (one H2D transfer per query), sliced and bitcast back inside the program;
* join output cardinalities are data-dependent, which XLA cannot express,
  so every join gets a **static output bucket**: a pow2 guess seeded by the
  probe side's bucket. The program computes exact per-join totals alongside
  its outputs; the host checks ``total <= bucket`` after ONE batched D2H.
  On overflow (rare: output grew past the guess) the plan is re-executed
  with exact buckets for the prefix and doubled guesses beyond — results
  are always exact, never truncated silently;
* compiled programs are cached by (plan structure, buckets, dtypes), so
  repeated queries and same-shaped plans reuse the XLA executable.

VARCHAR join keys can't fuse (dictionary unification needs host string
data); those plans fall back to the stepwise engine. JOB never joins on
strings (reference ANNOUNCEMENTS.md notes only int keys are joined).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import DataType
from ..ops import join as join_ops
from .ir import JoinNode, Plan, ScanNode

# ---------------------------------------------------------------------------
# Static plan analysis
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _ColSpec:
    """One packed input column: where it lives in the uint8 buffer."""

    dtype: DataType  # declared type
    esize: int  # element byte width on device (ids for VARCHAR)
    values_offset: int
    valid_offset: int
    pad: int


@dataclasses.dataclass(frozen=True)
class _ScanSpec:
    node_id: int
    pad: int
    cols: Tuple[int, ...]  # indices into the packed column table (per output attr)


@dataclasses.dataclass(frozen=True)
class _JoinSpec:
    node_id: int
    build_left: bool
    left: int
    right: int
    left_attr: int
    right_attr: int
    key_dtype: Optional[DataType]  # None => statically empty (type mismatch)
    out_pad: int
    # output attr -> (side 0=left/1=right, column index in that child)
    out_cols: Tuple[Tuple[int, int], ...]
    # build keys verified pairwise-distinct (FK->PK): output stays
    # probe-shaped, no expansion, can never overflow its bucket
    unique_build: bool = False


def _device_esize(dt: DataType) -> int:
    return 4 if dt in (DataType.INT32, DataType.VARCHAR) else 8


def _device_dtype(dt: DataType):
    return jnp.int32 if dt in (DataType.INT32, DataType.VARCHAR) else jnp.int64


class PlanStructure:
    """Static structure of a plan: packing layout + per-node specs.

    ``buckets`` maps join node id -> static output bucket; scans always use
    bucket(num_rows).
    """

    def __init__(
        self,
        plan: Plan,
        buckets: Dict[int, int],
        unique_joins: Optional[frozenset] = None,
    ):
        self.plan = plan
        self.unique_joins = unique_joins or frozenset()
        self.order = plan.topo_order()
        self.col_specs: List[_ColSpec] = []
        self.scan_specs: Dict[int, _ScanSpec] = {}
        self.join_specs: Dict[int, _JoinSpec] = {}
        self.buckets = dict(buckets)
        self.has_varchar_key = False

        offset = 0
        # node -> pad
        pads: Dict[int, int] = {}
        # node -> per output col: source packed col id (dictionary provenance)
        self.col_sources: Dict[int, Tuple[int, ...]] = {}
        # (input_id, col_idx, pad) -> packed col index (dedup across scans of
        # the same input with the same projection)
        packed: Dict[Tuple[int, int, int], int] = {}

        for idx in self.order:
            node = plan.nodes[idx]
            if isinstance(node.data, ScanNode):
                table = plan.inputs[node.data.base_table_id]
                pad = join_ops.bucket_size(table.num_rows)
                pads[idx] = pad
                col_ids = []
                for col_idx, dt in node.output_attrs:
                    key = (node.data.base_table_id, col_idx, pad)
                    if key not in packed:
                        esize = _device_esize(dt)
                        values_off = offset
                        offset += esize * pad
                        valid_off = offset
                        offset += pad
                        packed[key] = len(self.col_specs)
                        self.col_specs.append(
                            _ColSpec(dt, esize, values_off, valid_off, pad)
                        )
                    col_ids.append(packed[key])
                self.scan_specs[idx] = _ScanSpec(idx, pad, tuple(col_ids))
                self.col_sources[idx] = tuple(col_ids)
            else:
                j = node.data
                left_w = len(plan.nodes[j.left].output_attrs)
                lt = plan.nodes[j.left].output_attrs[j.left_attr][1]
                rt = plan.nodes[j.right].output_attrs[j.right_attr][1]
                key_dtype = lt if lt is rt else None
                if key_dtype is DataType.VARCHAR:
                    self.has_varchar_key = True
                probe_child = j.right if j.build_left else j.left
                unique = (
                    idx in self.unique_joins
                    and key_dtype in (DataType.INT32, DataType.INT64)
                )
                if unique:
                    # probe-shaped output: the bucket is pinned to the probe
                    # child's pad and can never overflow (<=1 match per row)
                    out_pad = pads[probe_child]
                    self.buckets[idx] = out_pad
                else:
                    out_pad = self.buckets.get(idx)
                    if out_pad is None:
                        out_pad = pads[probe_child]
                        self.buckets[idx] = out_pad
                pads[idx] = out_pad
                out_cols = tuple(
                    (0, ci) if ci < left_w else (1, ci - left_w)
                    for ci, _ in node.output_attrs
                )
                self.join_specs[idx] = _JoinSpec(
                    idx, j.build_left, j.left, j.right, j.left_attr, j.right_attr,
                    key_dtype, out_pad, out_cols, unique,
                )
                self.col_sources[idx] = tuple(
                    self.col_sources[j.left][ci]
                    if ci < left_w
                    else self.col_sources[j.right][ci - left_w]
                    for ci, _ in node.output_attrs
                )
        self.buffer_size = offset
        self.join_order = [i for i in self.order if i in self.join_specs]

    def cache_key(self) -> tuple:
        scans = tuple(
            (s.node_id, s.pad, s.cols) for s in self.scan_specs.values()
        )
        cols = tuple(
            (c.dtype, c.esize, c.values_offset, c.valid_offset, c.pad)
            for c in self.col_specs
        )
        joins = tuple(
            dataclasses.astuple(self.join_specs[i])[:7]
            + (
                self.join_specs[i].out_pad,
                self.join_specs[i].out_cols,
                self.join_specs[i].unique_build,
            )
            for i in self.join_order
        )
        root_attrs = tuple(
            (ci, dt) for ci, dt in self.plan.nodes[self.plan.root].output_attrs
        )
        return (scans, cols, joins, self.plan.root, root_attrs)


# ---------------------------------------------------------------------------
# Traced program
# ---------------------------------------------------------------------------

_F64_SIGN = np.int64(np.int64(-2) ** 63)
_F64_EXP = np.int64(0x7FF0000000000000)
_F64_MANT = np.int64(0x000FFFFFFFFFFFFF)


def _normalize_key(data, valid, dt: DataType):
    if dt is DataType.FP64:
        is_nan = ((data & _F64_EXP) == _F64_EXP) & ((data & _F64_MANT) != 0)
        data = jnp.where(data == _F64_SIGN, jnp.int64(0), data)
        valid = valid & ~is_nan
    return data, valid


def _unpack_column(buf, spec: _ColSpec):
    raw = jax.lax.dynamic_slice(buf, (spec.values_offset,), (spec.esize * spec.pad,))
    dtype = _device_dtype(spec.dtype)
    values = jax.lax.bitcast_convert_type(
        raw.reshape(spec.pad, spec.esize), dtype
    ).reshape(spec.pad)
    vraw = jax.lax.dynamic_slice(buf, (spec.valid_offset,), (spec.pad,))
    return values, vraw.astype(bool)


def _trace_plan(structure: PlanStructure, buf):
    """The traced whole-plan program body."""
    plan = structure.plan
    # node id -> list[(values, valid)]
    tables: Dict[int, List[Tuple[jnp.ndarray, jnp.ndarray]]] = {}
    totals = []

    for idx in structure.order:
        node = plan.nodes[idx]
        if isinstance(node.data, ScanNode):
            spec = structure.scan_specs[idx]
            cache: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
            cols = []
            for cid in spec.cols:
                if cid not in cache:
                    cache[cid] = _unpack_column(buf, structure.col_specs[cid])
                cols.append(cache[cid])
            tables[idx] = cols
            continue

        spec = structure.join_specs[idx]
        left = tables[spec.left]
        right = tables[spec.right]
        if spec.build_left:
            build_kv = left[spec.left_attr]
            probe_kv = right[spec.right_attr]
        else:
            build_kv = right[spec.right_attr]
            probe_kv = left[spec.left_attr]

        kb, vb = build_kv
        kp, vp = probe_kv
        if spec.key_dtype is None:
            vb = jnp.zeros_like(vb)
        else:
            kb, vb = _normalize_key(kb, vb, spec.key_dtype)
            kp, vp = _normalize_key(kp, vp, spec.key_dtype)

        if spec.unique_build:
            # FK->PK: <=1 match per probe row; the output keeps the probe
            # side's shape and order, probe columns pass through untouched
            # (no gather), and there is no expansion or overflow retry.
            bidx, live, total = join_ops.join_unique_impl(kb, vb, kp, vp)
            pidx = None  # identity
        else:
            perm, lo, _counts, offsets, total = join_ops.join_count_impl(
                kb, vb, kp, vp
            )
            bidx, pidx, live = join_ops.join_expand_impl(
                perm, lo, offsets, total, spec.out_pad
            )
        totals.append(total)

        lidx = bidx if spec.build_left else pidx
        ridx = pidx if spec.build_left else bidx
        gathered: Dict[Tuple[int, int], Tuple[jnp.ndarray, jnp.ndarray]] = {}
        out_cols = []
        for side, ci in spec.out_cols:
            key = (side, ci)
            if key not in gathered:
                src_vals, src_valid = (left if side == 0 else right)[ci]
                idx_arr = lidx if side == 0 else ridx
                if idx_arr is None:  # unique path: probe side passes through
                    gathered[key] = (src_vals, src_valid & live)
                else:
                    gathered[key] = (
                        src_vals[idx_arr],
                        src_valid[idx_arr] & live,
                    )
            out_cols.append(gathered[key])
        tables[idx] = out_cols

    root_cols = tables[plan.root]
    out_values = tuple(c[0] for c in root_cols)
    out_valid = tuple(c[1] for c in root_cols)
    totals_arr = (
        jnp.stack(totals) if totals else jnp.zeros(0, dtype=jnp.int64)
    )
    return out_values, out_valid, totals_arr


@functools.lru_cache(maxsize=512)
def _compiled_fn(cache_key, structure_ref):
    structure = structure_ref.value

    def fn(buf):
        return _trace_plan(structure, buf)

    return jax.jit(fn)


class _Ref:
    """Hashable-by-key wrapper so lru_cache can key on the structure."""

    def __init__(self, value, key):
        self.value = value
        self.key = key

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, _Ref) and self.key == other.key


def compile_structure(structure: PlanStructure):
    key = structure.cache_key()
    return _compiled_fn(key, _Ref(structure, key))
