"""Distributed set operations (INTERSECT / EXCEPT / UNION, SQL distinct
semantics with NULL = NULL row equality) — stages/setops.py."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def _null_last(row):
    return tuple((v is None, v) for v in row)


def _run(left, right, columns, op, **kw):
    from fs_schema_validator_ray.stages.setops import set_op_distinct

    out = set_op_distinct(left, right, columns, op, **kw).take_all()
    return sorted((tuple(r[c] for c in columns) for r in out), key=_null_last)


def test_intersect_single_column(ray_session):
    left = _ds({"k": pa.array([1, 2, 2, 3, 4], pa.int64())})
    right = _ds({"k": pa.array([2, 3, 3, 5], pa.int64())})
    assert _run(left, right, ["k"], "intersect") == [(2,), (3,)]


def test_except_single_column(ray_session):
    left = _ds({"k": pa.array([1, 2, 2, 3, 4], pa.int64())})
    right = _ds({"k": pa.array([2, 3, 3, 5], pa.int64())})
    assert _run(left, right, ["k"], "except") == [(1,), (4,)]


def test_union_distinct(ray_session):
    left = _ds({"k": pa.array([1, 2, 2], pa.int64())})
    right = _ds({"k": pa.array([2, 5, 5], pa.int64())})
    assert _run(left, right, ["k"], "union") == [(1,), (2,), (5,)]


def test_null_equals_null(ray_session):
    # SQL set ops treat NULL = NULL as row equality (unlike WHERE =):
    # a NULL key present on both sides survives an INTERSECT and is
    # removed by an EXCEPT.
    left = _ds({"k": pa.array([None, 1, None], pa.int64())})
    right = _ds({"k": pa.array([None, 2], pa.int64())})
    assert _run(left, right, ["k"], "intersect") == [(None,)]
    assert _run(left, right, ["k"], "except") == [(1,)]


def test_null_vs_zero_distinct(ray_session):
    # stable_key_array routes NULL like key 0 for BUCKETING only; the
    # in-bucket key codes must still keep NULL and 0 apart.
    left = _ds({"k": pa.array([0, None], pa.int64())})
    right = _ds({"k": pa.array([0], pa.int64())})
    assert _run(left, right, ["k"], "intersect") == [(0,)]
    assert _run(left, right, ["k"], "except") == [(None,)]


def test_multi_column_rows(ray_session):
    left = _ds(
        {
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "y", "x", None], pa.string()),
        }
    )
    right = _ds(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["y", None, "x"], pa.string()),
        }
    )
    assert _run(left, right, ["a", "b"], "intersect") == [(1, "y"), (2, None)]
    assert _run(left, right, ["a", "b"], "except") == [(1, "x"), (2, "x")]


def test_multi_column_no_cross_column_mixup(ray_session):
    # ("x","y") on the left and ("y","x") on the right are different rows.
    left = _ds({"a": pa.array(["x"]), "b": pa.array(["y"])})
    right = _ds({"a": pa.array(["y"]), "b": pa.array(["x"])})
    assert _run(left, right, ["a", "b"], "intersect") == []


def test_empty_right_side(ray_session):
    left = _ds({"k": pa.array([1, 2], pa.int64())})
    right = _ds({"k": pa.array([], pa.int64())})
    assert _run(left, right, ["k"], "except") == [(1,), (2,)]
    assert _run(left, right, ["k"], "intersect") == []
    assert _run(left, right, ["k"], "union") == [(1,), (2,)]


def test_duplicates_across_batches_collapse(ray_session):
    # The per-batch combiner only dedups within a block; the bucket scan
    # must collapse duplicates that arrive from different blocks.
    import ray.data

    left = ray.data.from_arrow_refs(
        [
            __import__("ray").put(pa.table({"k": pa.array([7, 8], pa.int64())})),
            __import__("ray").put(pa.table({"k": pa.array([7, 9], pa.int64())})),
        ]
    )
    right = _ds({"k": pa.array([9], pa.int64())})
    assert _run(left, right, ["k"], "except") == [(7,), (8,)]
    assert _run(left, right, ["k"], "union") == [(7,), (8,), (9,)]


def test_bad_op_rejected(ray_session):
    from fs_schema_validator_ray.stages.setops import set_op_distinct

    left = _ds({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        set_op_distinct(left, left, ["k"], "minus")


def test_matches_duckdb_oracle(ray_session):
    import duckdb

    lt = pa.table(
        {
            "a": pa.array([1, 1, 2, None, 3, 3], pa.int64()),
            "b": pa.array(["p", "q", None, "r", "s", "s"], pa.string()),
        }
    )
    rt = pa.table(
        {
            "a": pa.array([1, 2, None, 4], pa.int64()),
            "b": pa.array(["q", None, "r", "t"], pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    for op, sql_op in [("intersect", "INTERSECT"), ("except", "EXCEPT"), ("union", "UNION")]:
        want = sorted(
            (tuple(row)
             for row in con.execute(
                 f"SELECT a, b FROM lt {sql_op} SELECT a, b FROM rt"
             ).fetchall()),
            key=_null_last,
        )
        got = _run(_ds(dict(zip(lt.column_names, lt.columns))),
                   _ds(dict(zip(rt.column_names, rt.columns))),
                   ["a", "b"], op)
        assert got == [tuple(w) for w in want], op


# --- set_op_bag (INTERSECT ALL / EXCEPT ALL / UNION ALL) ---------------------


def _run_bag(left, right, columns, op, **kw):
    from fs_schema_validator_ray.stages.setops import set_op_bag

    out = set_op_bag(left, right, columns, op, **kw).take_all()
    return sorted((tuple(r[c] for c in columns) for r in out), key=_null_last)


def test_bag_multiplicities(ray_session):
    left = _ds({"k": pa.array([1, 1, 1, 2, 2, 3, None, None], pa.int64())})
    right = _ds({"k": pa.array([1, 2, 2, 2, 4, None], pa.int64())})
    # INTERSECT ALL: min(l, r) per row — 1×1, 2×2, null×1
    assert _run_bag(left, right, ["k"], "intersect_all") == [
        (1,), (2,), (2,), (None,),
    ]
    # EXCEPT ALL: max(0, l - r) — 1×2, 3×1, null×1
    assert _run_bag(left, right, ["k"], "except_all") == [
        (1,), (1,), (3,), (None,),
    ]
    # UNION ALL: plain concat, every copy kept
    assert len(_run_bag(left, right, ["k"], "union_all")) == 14


def test_bag_matches_duckdb_oracle(ray_session):
    import duckdb

    rng = np.random.default_rng(9)
    lt = pa.table(
        {
            "a": pa.array(rng.integers(0, 6, 200)),
            "b": pa.array([["x", "y", None][i] for i in rng.integers(0, 3, 200)]),
        }
    )
    rt = pa.table(
        {
            "a": pa.array(rng.integers(0, 6, 150)),
            "b": pa.array([["x", "y", None][i] for i in rng.integers(0, 3, 150)]),
        }
    )
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    for op, sql_op in [
        ("intersect_all", "INTERSECT ALL"),
        ("except_all", "EXCEPT ALL"),
        ("union_all", "UNION ALL"),
    ]:
        want = sorted(
            (tuple(row)
             for row in con.execute(
                 f"SELECT a, b FROM lt {sql_op} SELECT a, b FROM rt"
             ).fetchall()),
            key=_null_last,
        )
        got = _run_bag(
            _ds(dict(zip(lt.column_names, lt.columns))).repartition(5),
            _ds(dict(zip(rt.column_names, rt.columns))).repartition(3),
            ["a", "b"], op,
        )
        assert got == [tuple(w) for w in want], op


def test_bag_bad_op_rejected(ray_session):
    from fs_schema_validator_ray.stages.setops import set_op_bag

    with pytest.raises(ValueError, match="intersect_all"):
        set_op_bag(_ds({"k": pa.array([1])}), _ds({"k": pa.array([1])}), ["k"], "minus")


# --- table_diff (snapshot CDC) -----------------------------------------------


def test_table_diff_classifies_and_drops_unchanged(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.setops import table_diff

    old = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", None], pa.string()),
            }
        )
    ).repartition(2)
    new = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([2, 3, 4, 5], pa.int64()),
                "v": pa.array(["B", "c", None, "e"], pa.string()),
            }
        )
    ).repartition(2)
    out = {r["k"]: r["change"] for r in table_diff(old, new, ["k"], ["v"]).take_all()}
    # k=3 unchanged, k=4 NULL == NULL → unchanged, both dropped
    assert out == {1: "removed", 2: "changed", 5: "added"}


def test_table_diff_null_value_transitions_and_composite_key(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.setops import table_diff

    old = ray.data.from_arrow(
        pa.table(
            {
                "k1": pa.array(["x", "x", "y"], pa.string()),
                "k2": pa.array([1, 2, 1], pa.int64()),
                "v": pa.array([10, None, 30], pa.int64()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "k1": pa.array(["x", "x", "y"], pa.string()),
                "k2": pa.array([1, 2, 1], pa.int64()),
                "v": pa.array([None, None, 30], pa.int64()),
            }
        )
    )
    rows = table_diff(old, new, ["k1", "k2"], ["v"]).take_all()
    # value → NULL is a change; NULL → NULL and 30 → 30 are not
    assert [(r["k1"], r["k2"], r["change"]) for r in rows] == [("x", 1, "changed")]


def test_table_diff_rejects_duplicate_keys(ray_session):
    import pytest
    import ray.data

    from fs_schema_validator_ray.stages.setops import table_diff

    old = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 2], pa.int64())})
    )
    new = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    )
    with pytest.raises(Exception):  # ray wraps the ValueError
        table_diff(old, new, ["k"], ["v"]).take_all()


def test_table_diff_randomized_vs_reference(ray_session):
    """Property check: table_diff == a dict-based reference diff over
    random snapshot pairs with null keys, null values, and string keys —
    many trials in one ray session."""
    import ray.data

    from fs_schema_validator_ray.stages.setops import table_diff

    rng = np.random.default_rng(23)
    for trial in range(5):
        keys = [f"k{i}" for i in range(40)]
        rng.shuffle(keys)
        old_keys = keys[:30]
        new_keys = keys[10:40]

        def vals(ks):
            return {
                k: (None if rng.random() < 0.2 else int(rng.integers(0, 3)))
                for k in ks
            }

        old_v, new_v = vals(old_keys), vals(new_keys)
        n_null_old, n_null_new = int(rng.integers(0, 3)), int(rng.integers(0, 3))
        old_t = pa.table(
            {
                "k": pa.array(old_keys + [None] * n_null_old, pa.string()),
                "v": pa.array(
                    [old_v[k] for k in old_keys] + [7] * n_null_old, pa.int64()
                ),
            }
        )
        new_t = pa.table(
            {
                "k": pa.array(new_keys + [None] * n_null_new, pa.string()),
                "v": pa.array(
                    [new_v[k] for k in new_keys] + [8] * n_null_new, pa.int64()
                ),
            }
        )
        skey = lambda x: (x[0] is None, x[0] or "", x[1])  # noqa: E731
        got = sorted(
            (
                (r["k"], r["change"])
                for r in table_diff(
                    ray.data.from_arrow(old_t).repartition(3),
                    ray.data.from_arrow(new_t).repartition(2),
                    ["k"],
                    ["v"],
                ).take_all()
            ),
            key=skey,
        )
        want = []
        for k in old_keys:
            if k not in new_v:
                want.append((k, "removed"))
            elif old_v[k] != new_v[k]:
                want.append((k, "changed"))
        for k in new_keys:
            if k not in old_v:
                want.append((k, "added"))
        want += [(None, "removed")] * n_null_old + [(None, "added")] * n_null_new
        assert got == sorted(want, key=skey), trial
