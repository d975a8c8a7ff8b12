"""Distributed set operations: INTERSECT / EXCEPT (SQL distinct set
semantics, including NULL = NULL row equality).

The reference has no set ops (its existence check is a membership probe,
``/root/reference/fs_schema_validator/__init__.py``); an engine needs
them for manifest reconciliation (ids present in corpus A but not B).

Plan — the same single-shuffle discipline as the joins: per-batch
DISTINCT combiner on each side (an Arrow ``group_by`` — duplicate rows
never shuffle), tag with a side flag, union, ONE
``groupby(hash(row) % n_buckets)`` of the distinct survivors, then a
fully vectorized per-bucket segment scan (``key_codes`` per column →
lexsort → per-segment side-presence via bincount). No per-row or
per-group Python in any hot path; the shuffle carries only the pruned
key columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.state.sketches import (
    hash64,
    key_codes,
    mix_to_buckets,
    stable_key_array,
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _row_buckets(tbl: pa.Table, columns: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(tbl.num_rows, np.uint64)
    with np.errstate(over="ignore"):
        for c in columns:
            h = h * _MIX ^ hash64(stable_key_array(tbl.column(c)))
    return mix_to_buckets(h, n_buckets)


def set_op_distinct(left, right, columns: list[str], op: str, n_buckets: int | None = None):
    """``left INTERSECT right`` / ``left EXCEPT right`` / ``left UNION
    right`` over the given row columns, SQL semantics: output rows are
    DISTINCT, and two rows are equal when every column matches with NULL
    equal to NULL."""
    from fs_schema_validator_ray.stages.dedup import default_n_buckets

    if op not in ("intersect", "except", "union"):
        raise ValueError(
            f"set_op_distinct op must be intersect|except|union, got {op!r}"
        )
    if n_buckets is None:
        n_buckets = default_n_buckets()

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(t.select(columns), columns).aggregate([])
            return g.append_column(
                "__side", pa.array(np.full(g.num_rows, side, np.int8))
            ).append_column("__bucket", pa.array(_row_buckets(g, columns, n_buckets)))

        return fn

    tagged = left.select_columns(columns).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(right.select_columns(columns).map_batches(tag(1), batch_format="pyarrow"))

    def merge_bucket(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"))
        codes = [key_codes(group.column(c)) for c in columns]
        order = np.lexsort(codes[::-1])
        sorted_codes = [c[order] for c in codes]
        boundary = np.zeros(len(order), bool)
        if len(order):
            boundary[0] = True
            for c in sorted_codes:
                boundary[1:] |= c[1:] != c[:-1]
        seg_id = np.cumsum(boundary) - 1
        n_seg = int(seg_id[-1]) + 1 if len(order) else 0
        side_s = side[order]
        has_l = np.bincount(seg_id, weights=(side_s == 0), minlength=n_seg) > 0
        has_r = np.bincount(seg_id, weights=(side_s == 1), minlength=n_seg) > 0
        if op == "intersect":
            keep = has_l & has_r
        elif op == "except":
            keep = has_l & ~has_r
        else:  # union: every distinct row from either side
            keep = has_l | has_r
        starts = np.flatnonzero(boundary)
        take = pa.array(order[starts[keep]], pa.int64())
        return group.select(columns).take(take)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")
