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
        n_buckets = default_n_buckets(left, right)

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


def set_op_bag(left, right, columns: list[str], op: str, n_buckets: int | None = None):
    """BAG (multiset) set operations — ``INTERSECT ALL`` / ``EXCEPT
    ALL`` / ``UNION ALL`` over the given row columns, ANSI semantics:
    with a row appearing ``l`` times on the left and ``r`` on the right,
    it emits ``min(l, r)`` / ``max(0, l − r)`` / ``l + r`` times. NULL
    equals NULL for row equality (same as the DISTINCT variants and
    DuckDB).

    Same single-shuffle discipline as :func:`set_op_distinct`, with the
    per-batch combiner reduced to ``(row, count)`` partials (an Arrow
    ``group_by`` count — duplicate rows ship one int64, not N copies),
    ONE hash-bucket shuffle of the partials, then a vectorized
    per-bucket segment scan summing per-side counts and ``np.repeat``-ing
    each row its output multiplicity. ``union_all`` needs no shuffle at
    all and short-circuits to ``Dataset.union``."""
    from fs_schema_validator_ray.stages.dedup import default_n_buckets

    if op not in ("intersect_all", "except_all", "union_all"):
        raise ValueError(
            f"set_op_bag op must be intersect_all|except_all|union_all, got {op!r}"
        )
    if op == "union_all":
        return left.select_columns(columns).union(right.select_columns(columns))
    if n_buckets is None:
        n_buckets = default_n_buckets(left, right)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(t.select(columns), columns).aggregate(
                [([], "count_all")]
            )
            g = g.rename_columns([*columns, "__cnt"])
            return g.append_column(
                "__side", pa.array(np.full(g.num_rows, side, np.int8))
            ).append_column("__bucket", pa.array(_row_buckets(g, columns, n_buckets)))

        return fn

    tagged = left.select_columns(columns).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(right.select_columns(columns).map_batches(tag(1), batch_format="pyarrow"))

    def merge_bucket(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"))
        cnt = np.asarray(group.column("__cnt"), dtype=np.int64)
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
        side_s, cnt_s = side[order], cnt[order]
        l_cnt = np.bincount(
            seg_id, weights=cnt_s * (side_s == 0), minlength=n_seg
        ).astype(np.int64)
        r_cnt = np.bincount(
            seg_id, weights=cnt_s * (side_s == 1), minlength=n_seg
        ).astype(np.int64)
        if op == "intersect_all":
            k = np.minimum(l_cnt, r_cnt)
        else:  # except_all
            k = np.maximum(l_cnt - r_cnt, 0)
        starts = np.flatnonzero(boundary)
        take = pa.array(np.repeat(order[starts], k), pa.int64())
        return group.select(columns).take(take)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def table_diff(
    old,
    new,
    key_columns: list[str],
    value_columns: list[str],
    n_buckets: int | None = None,
):
    """Snapshot diff (CDC shape): classify every key as ``added`` (only
    in ``new``), ``removed`` (only in ``old``) or ``changed`` (present in
    both with any value column differing, NULL-safely); unchanged keys
    are dropped. The reconciliation primitive for incremental runs —
    which partitions actually need revalidation between two manifest
    snapshots.

    Plan: tag each side, union, prune to key+value columns, ONE
    ``groupby(hash(key) % n_buckets)`` coarse-bucket shuffle, then a
    fully vectorized per-bucket pass (lexsort by key then side; segment
    length + side classify; per-value-column NULL-safe equality on the
    paired rows via two ``take``s — no per-key Python).

    Requires each non-null key to be UNIQUE within each snapshot (raises
    otherwise — a duplicated key has no well-defined row diff). Rows
    with a NULL in any key column follow SQL FULL OUTER JOIN semantics:
    NULL keys never match, so every old-side null-key row reports
    ``removed`` and every new-side one ``added`` (and they are exempt
    from the uniqueness requirement).

    Output: ``key_columns + [change]``, one row per differing key
    (``changed`` rows carry the NEW side's key values)."""
    import pyarrow.compute as pc

    from fs_schema_validator_ray.stages.dedup import default_n_buckets

    if n_buckets is None:
        n_buckets = default_n_buckets(old, new)
    cols = list(dict.fromkeys([*key_columns, *value_columns]))

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            ).append_column(
                "__bucket", pa.array(_row_buckets(t, key_columns, n_buckets))
            )

        return fn

    unioned = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            out = {c: group.column(c).slice(0, 0) for c in key_columns}
            out["change"] = pa.array([], pa.string())
            return pa.table(out)
        kcodes = [key_codes(group.column(c).combine_chunks()) for c in key_columns]
        side = np.asarray(group.column("__side"), dtype=np.int8)
        # SQL FULL OUTER JOIN never matches NULL keys: split them off —
        # old-side null-key rows are 'removed', new-side 'added' — and
        # run the pairing only over fully-non-null keys
        null_any = np.zeros(n, dtype=bool)
        for c in key_columns:
            null_any |= np.asarray(pc.is_null(group.column(c).combine_chunks()))
        null_idx = np.flatnonzero(null_any)
        valid_idx = np.flatnonzero(~null_any)
        nv = len(valid_idx)
        if nv == 0:
            take = pa.array(null_idx, pa.int64())
            out = {
                c: group.column(c).combine_chunks().take(take) for c in key_columns
            }
            out["change"] = pa.array(
                np.where(side[null_idx] == 1, "added", "removed"), pa.string()
            )
            return pa.table(out)
        sub_codes = [k[valid_idx] for k in kcodes]
        sub_side = side[valid_idx]
        order = valid_idx[np.lexsort((sub_side, *sub_codes[::-1]))]
        n = nv
        ks = [k[order] for k in kcodes]
        ss = side[order]
        seg_first = np.zeros(n, dtype=bool)
        seg_first[0] = True
        for k in ks:
            seg_first[1:] |= k[1:] != k[:-1]
        seg_start = np.flatnonzero(seg_first)
        seg_len = np.diff(np.concatenate([seg_start, [n]]))
        if seg_len.max(initial=0) > 2:
            raise ValueError(
                "table_diff: a key appears more than once within one "
                "snapshot — diff is undefined for duplicated keys"
            )
        pair_start = seg_start[seg_len == 2]
        if len(pair_start) and not (
            (ss[pair_start] == 0).all() and (ss[pair_start + 1] == 1).all()
        ):
            raise ValueError(
                "table_diff: a key appears twice on the same side — diff "
                "is undefined for duplicated keys"
            )
        single = seg_start[seg_len == 1]
        added = single[ss[single] == 1]
        removed = single[ss[single] == 0]
        # changed: NULL-safe inequality on any value column
        if len(pair_start):
            take_old = pa.array(order[pair_start], pa.int64())
            take_new = pa.array(order[pair_start + 1], pa.int64())
            unchanged = np.ones(len(pair_start), dtype=bool)
            for c in value_columns:
                col = group.column(c).combine_chunks()
                l, r = col.take(take_old), col.take(take_new)
                eq = np.asarray(pc.fill_null(pc.equal(l, r), False))
                both_null = np.asarray(pc.is_null(l)) & np.asarray(pc.is_null(r))
                unchanged &= eq | both_null
            changed = pair_start[~unchanged] + 1  # NEW side row
        else:
            changed = np.empty(0, np.int64)
        idx = np.concatenate([added, removed, changed]).astype(np.int64)
        labels = (
            ["added"] * len(added)
            + ["removed"] * len(removed)
            + ["changed"] * len(changed)
            + np.where(side[null_idx] == 1, "added", "removed").tolist()
        )
        take = pa.array(np.concatenate([order[idx], null_idx]), pa.int64())
        out = {c: group.column(c).combine_chunks().take(take) for c in key_columns}
        out["change"] = pa.array(labels, pa.string())
        return pa.table(out)

    return unioned.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")
