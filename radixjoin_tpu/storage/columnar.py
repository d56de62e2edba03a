"""Columnar containers.

``ColumnarTable`` is the paged interchange format at the engine boundary
(reference include/plan.h:54-105): inputs of a ``Plan`` and the result of
``execute`` are paged. ``HostTable`` is the dense in-memory form the engine
actually computes on: one contiguous typed numpy array + validity mask per
column (strings as object arrays of ``bytes``).

Row-oriented helpers (``to_rows``/``from_rows``) exist only for tests and
oracle comparison — the hot path never materializes rows (the reference's
row-variant materialization is what made it allocator-bound, see
SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from ..dtypes import NULL, DataType, PAGE_SIZE, is_null
from . import page as page_codec


@dataclasses.dataclass
class Column:
    """A paged column: (n_pages, PAGE_SIZE) uint8 array."""

    type: DataType
    pages: np.ndarray

    def __post_init__(self):
        if self.pages is None:
            self.pages = np.zeros((0, PAGE_SIZE), dtype=np.uint8)
        assert self.pages.ndim == 2 and self.pages.shape[1] == PAGE_SIZE


@dataclasses.dataclass
class ColumnarTable:
    num_rows: int = 0
    columns: List[Column] = dataclasses.field(default_factory=list)

    def copy(self) -> "ColumnarTable":
        return ColumnarTable(
            self.num_rows,
            [Column(c.type, c.pages.copy()) for c in self.columns],
        )

    # -- conversions ---------------------------------------------------------

    @staticmethod
    def from_host(table: "HostTable") -> "ColumnarTable":
        cols = [
            Column(c.dtype, page_codec.encode_column(c.values, c.valid, c.dtype))
            for c in table.columns
        ]
        return ColumnarTable(table.num_rows, cols)

    def to_host(self) -> "HostTable":
        cols = []
        for c in self.columns:
            values, valid = page_codec.decode_column(c.pages, self.num_rows, c.type)
            cols.append(HostColumn(c.type, values, valid))
        return HostTable(self.num_rows, cols)


@dataclasses.dataclass
class HostColumn:
    dtype: DataType
    values: np.ndarray  # typed array; object array of bytes for VARCHAR
    valid: np.ndarray  # bool

    def __len__(self) -> int:
        return len(self.valid)

    def take(self, indices: np.ndarray) -> "HostColumn":
        return HostColumn(self.dtype, self.values[indices], self.valid[indices])


@dataclasses.dataclass
class HostTable:
    num_rows: int
    columns: List[HostColumn]

    @property
    def num_cols(self) -> int:
        return len(self.columns)

    # -- row-level helpers (tests / oracle only) -----------------------------

    @staticmethod
    def from_rows(rows: Sequence[Sequence], types: Sequence[DataType]) -> "HostTable":
        n = len(rows)
        cols = []
        for j, dt in enumerate(types):
            valid = np.zeros(n, dtype=bool)
            if dt is DataType.VARCHAR:
                values = np.empty(n, dtype=object)
                values[:] = b""
                for i, row in enumerate(rows):
                    v = row[j]
                    if not is_null(v):
                        valid[i] = True
                        values[i] = v.encode() if isinstance(v, str) else bytes(v)
            else:
                values = np.zeros(n, dtype=dt.numpy_dtype)
                for i, row in enumerate(rows):
                    v = row[j]
                    if not is_null(v):
                        valid[i] = True
                        values[i] = v
            cols.append(HostColumn(DataType(dt), values, valid))
        return HostTable(n, cols)

    def to_rows(self) -> List[tuple]:
        out = []
        for i in range(self.num_rows):
            row = []
            for c in self.columns:
                if not c.valid[i]:
                    row.append(NULL)
                elif c.dtype is DataType.VARCHAR:
                    row.append(bytes(c.values[i]))
                elif c.dtype is DataType.FP64:
                    row.append(float(c.values[i]))
                else:
                    row.append(int(c.values[i]))
            out.append(tuple(row))
        return out

    def type_signature(self) -> List[DataType]:
        return [c.dtype for c in self.columns]


def sort_key(row: tuple):
    """Total order over test rows: NULL sorts last within a column.

    (Order is irrelevant for multiset comparison; a fixed one makes diffs
    stable.)
    """
    key = []
    for v in row:
        if is_null(v):
            key.append((1, b""))
        elif isinstance(v, bytes):
            key.append((0, v))
        else:
            key.append((0, v))
    return key


def sorted_rows(rows: List[tuple]) -> List[tuple]:
    def k(row):
        out = []
        for v in row:
            if is_null(v):
                out.append((2, 0))
            elif isinstance(v, bytes):
                out.append((1, v))
            else:
                out.append((0, v))
        return out

    return sorted(rows, key=k)
