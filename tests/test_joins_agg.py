"""Broadcast join, as-of join, combiner aggregation, tumbling windows."""

import numpy as np
import pyarrow as pa


def test_broadcast_join_inner(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import broadcast_join

    big = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 9], pa.int64()), "x": pa.array(list("abcd"))})
    )
    small = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array(["u", "v", "w"])})
    )
    out = sorted(
        (r["k"], r["x"], r["v"])
        for r in broadcast_join(big, small, "k", ["v"]).take_all()
    )
    # inner: unmatched key 9 drops
    assert out == [(1, "a", "u"), (2, "b", "v"), (3, "c", "w")]


def test_asof_join_backward(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "ts": pa.array([5, 15, 2, 10, 10], pa.int64()),
                "lid": pa.array([100, 101, 102, 103, 104], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "rts": pa.array([3, 10, 20], pa.int64()),
                "rid": pa.array([7, 8, 9], pa.int64()),
            }
        )
    )
    out = asof_join(
        left, right, key_column="k", left_ts="ts", right_ts="rts",
        left_value_columns=["lid"], right_value_columns=["rid"],
    ).take_all()
    got = sorted((r["l_lid"], r["r_rid"]) for r in out)
    # lid=100 (ts 5) -> rts 3; lid=101 (ts 15) -> rts 10; lid=102 (ts 2) -> none;
    # lid=103 (k=2, ts 10) -> none (rts 20 is after); lid=104 (k=3) -> no right side
    assert got == [(100, 7), (101, 8)]


def test_group_sum_combiner(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_sum

    t = pa.table(
        {
            "k": pa.array(["a"] * 5 + ["b"] * 3),
            "v": pa.array([1, 2, 3, 4, 5, 10, 20, 30], pa.int64()),
        }
    )
    out = {
        r["k"]: (r["v"], r["n"])
        for r in group_sum(ray.data.from_arrow(t), ["k"], ["v"]).take_all()
    }
    assert out == {"a": (15, 5), "b": (60, 3)}


def test_salted_topk_per_key(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.agg import salted_topk_per_key

    rng = np.random.default_rng(0)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(np.where(rng.random(n) < 0.9, "hot", "cold")),  # skewed
            "v": pa.array(rng.integers(0, 1_000_000, n)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = salted_topk_per_key(
        ray.data.from_arrow(t), "k", "v", k=3, tiebreak_column="id", salt=8
    ).take_all()
    v = np.asarray(t.column("v"))
    ids = np.asarray(t.column("id"))
    keys = np.asarray(t.column("k"))
    for key in ("hot", "cold"):
        m = keys == key
        order = np.lexsort((ids[m], -v[m]))[:3]
        expect = sorted(zip(v[m][order], ids[m][order]))
        got = sorted((r["v"], r["id"]) for r in out if r["k"] == key)
        assert got == expect


def test_sessionize(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.agg import sessionize

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
            # k=1: events at 0, 10, 50 (gap>20 → new session), 55; k=2: one
            "ts": pa.array([0, 10, 50, 55, 7], pa.int64()),
        }
    )
    out = sorted(
        (r["k"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(ray.data.from_arrow(t), "k", "ts", gap=20).take_all()
    )
    assert out == [(1, 0, 10, 2), (1, 50, 55, 2), (2, 7, 7, 1)]


def test_tumbling_window():
    from fs_schema_validator_ray.stages.agg import tumbling_window
    import ray.data

    ts = pa.array(
        np.array(
            ["2024-01-01T05:00:00", "2024-01-01T23:59:00", "2024-02-03T00:00:00"],
            dtype="datetime64[us]",
        )
    )
    t = pa.table({"ts": ts, "v": pa.array([1, 2, 3], pa.int64())})
    out = tumbling_window(ray.data.from_arrow(t), "ts", "day").take_all()
    assert [r["window"] for r in out] == ["2024-01-01", "2024-01-01", "2024-02-03"]
    out_m = tumbling_window(ray.data.from_arrow(t), "ts", "month").take_all()
    assert [r["window"] for r in out_m] == ["2024-01", "2024-01", "2024-02"]


def test_stratified_sample(ray_session):
    """Every k-th row per group under per-group event order (1-indexed
    row_number % k == 1) — equal pressure per stratum."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import stratified_sample

    t = pa.table(
        {
            "g": pa.array(["a"] * 7 + ["b"] * 2 + ["c"] * 3),
            "o": pa.array([70, 10, 30, 20, 60, 40, 50, 2, 1, 9, 7, 8], pa.int64()),
        }
    )
    out = stratified_sample(ray.data.from_arrow(t), "g", "o", 3).take_all()
    got = sorted((r["g"], r["o"]) for r in out)
    # a sorted: 10,20,30,40,50,60,70 → rows 1,4,7 → 10,40,70
    # b sorted: 1,2 → row 1 → 1 ; c sorted: 7,8,9 → row 1 → 7
    assert got == [("a", 10), ("a", 40), ("a", 70), ("b", 1), ("c", 7)]


def test_hash_join_duplicates_and_nulls(ray_session):
    """Inner equi-join: per-key cross product on duplicate keys, null
    join keys drop, unmatched keys drop."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, None], pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    right = pa.table(
        {
            "k2": pa.array([1, 1, 2, 4, None], pa.int64()),
            "rv": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "k2", ["lv"], ["rv"],
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    assert got == [
        (1, "a", 10), (1, "a", 20), (1, "b", 10), (1, "b", 20),
        (2, "c", 30),
    ]


def test_hash_join_left(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table(
        {
            "k": pa.array([1, 2, None], pa.int64()),
            "lv": pa.array(["a", "b", "c"]),
        }
    )
    right = pa.table(
        {"k2": pa.array([1, 1], pa.int64()), "rv": pa.array([10, 20], pa.int64())}
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "k2", ["lv"], ["rv"], how="left",
    ).take_all()
    got = sorted(
        [(r["k"], r["lv"], r["rv"]) for r in out],
        key=lambda x: (x[0] is None, x[0] or 0, x[1], x[2] is None, x[2] or 0),
    )
    assert got == [
        (1, "a", 10), (1, "a", 20),
        (2, "b", None),          # unmatched left row survives
        (None, "c", None),       # null key never matches, still emits
    ]


def test_hash_join_left_empty_right(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array(["a", "b"])})
    right = pa.table(
        {"k2": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())}
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "k2", ["lv"], ["rv"], how="left", n_buckets=2,
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    assert got == [(1, "a", None), (2, "b", None)]


def test_range_join_intervals(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import range_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3, None, 1], pa.int64()),
                "ts": pa.array([5, 10, 25, 7, 7, 7, None], pa.int64()),
                "lid": pa.array([100, 101, 102, 103, 104, 105, 106], pa.int64()),
            }
        )
    )
    # k=1: [0,10) id7, [5,20) id8, nested [6,7) id9; k=2: [0,5) id10;
    # k=4: one-sided right
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 4], pa.int64()),
                "lo": pa.array([0, 5, 6, 0, 0], pa.int64()),
                "hi": pa.array([10, 20, 7, 5, 99], pa.int64()),
                "rid": pa.array([7, 8, 9, 10, 11], pa.int64()),
            }
        )
    )
    out = range_join(
        left, right, key_column="k", left_ts="ts", right_lo="lo", right_hi="hi",
        left_value_columns=["lid"], right_value_columns=["rid"],
    ).take_all()
    got = sorted((r["l_lid"], r["r_rid"]) for r in out)
    # lid=100 (k1 ts5): [0,10) and [5,20) match, [6,7) does not (lo>ts);
    # lid=101 (k1 ts10): only [5,20) (hi=10 excluded — half-open);
    # lid=102 (k1 ts25): none; lid=103 (k2 ts7): none (hi 5 <= 7);
    # lid=104 (k3): no right side; null key and null ts rows drop
    assert got == [(100, 7), (100, 8), (101, 8)]


def test_range_join_max_span_prunes_not_drops(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import range_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "ts": pa.array([100, 104], pa.int64()),
                "lid": pa.array([1, 2], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "lo": pa.array([95, 99], pa.int64()),
                "hi": pa.array([100, 104 + 1], pa.int64()),
                "rid": pa.array([7, 8], pa.int64()),
            }
        )
    )
    # all spans <= 6: max_span=6 must give identical results to unbounded
    kwargs = dict(
        key_column="k", left_ts="ts", right_lo="lo", right_hi="hi",
        left_value_columns=["lid"], right_value_columns=["rid"],
    )
    unbounded = sorted(
        (r["l_lid"], r["r_rid"])
        for r in range_join(left, right, **kwargs).take_all()
    )
    pruned = sorted(
        (r["l_lid"], r["r_rid"])
        for r in range_join(left, right, max_span=6, **kwargs).take_all()
    )
    # lid=1 ts100: [99,105) matches, [95,100) excluded (half-open);
    # lid=2 ts104: [99,105) matches
    assert unbounded == [(1, 8), (2, 8)]
    assert pruned == unbounded


def test_range_join_empty_sides(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import range_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "ts": pa.array([5], pa.int64()),
                "lid": pa.array([1], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "rid": pa.array([], pa.int64()),
            }
        )
    )
    out = range_join(
        left, right, key_column="k", left_ts="ts", right_lo="lo", right_hi="hi",
        left_value_columns=["lid"], right_value_columns=["rid"],
    ).take_all()
    assert out == []


def test_pivot_wide(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.agg import pivot_wide

    # key 1: a=10 twice + b=5; key 2: only unlisted 'z' and a null pivot
    # (must still appear, all zeros); key 3: null value sums as 0
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "p": pa.array(["a", "a", "b", "z", None, "a"]),
            "v": pa.array([10, 10, 5, 99, 99, None], pa.int64()),
        }
    )
    out = pivot_wide(
        ray.data.from_arrow(t).repartition(3),
        key_column="k",
        pivot_column="p",
        value_column="v",
        pivot_values=["a", "b"],
        names=["a_sum", "b_sum"],
    ).take_all()
    rows = {r["k"]: (r["a_sum"], r["b_sum"], r["n"]) for r in out}
    assert rows == {1: (20, 5, 3), 2: (0, 0, 2), 3: (0, 0, 1)}


def test_pivot_wide_name_collision():
    from fs_schema_validator_ray.stages.agg import pivot_wide

    import pytest

    with pytest.raises(ValueError):
        pivot_wide(None, "k", "p", "v", ["a"], names=["n"])
    with pytest.raises(ValueError):
        pivot_wide(None, "k", "p", "v", ["a", "b"], names=["x", "x"])


def test_hash_join_full_outer(ray_session):
    """FULL OUTER: matched cross products, left-only rows with null right
    columns, right-only rows with null left columns carrying their key in
    the coalesced key column, and null keys on BOTH sides emitting
    unmatched (SQL: NULL = NULL is not a match)."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, None], pa.int64()),
            "lv": pa.array(["a", "b", "c", "d"]),
        }
    )
    right = pa.table(
        {
            "k2": pa.array([1, 3, None], pa.int64()),
            "rv": pa.array([10, 30, 50], pa.int64()),
        }
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "k2", ["lv"], ["rv"], how="full_outer",
    ).take_all()
    got = sorted(
        [(r["k"], r["lv"], r["rv"]) for r in out],
        key=lambda x: (x[0] is None, x[0] or 0, x[1] or "", x[2] is None, x[2] or 0),
    )
    assert got == [
        (1, "a", 10), (1, "b", 10),
        (2, "c", None),           # left-only
        (3, None, 30),            # right-only: key coalesced from right
        (None, None, 50),         # null right key never matches
        (None, "d", None),        # null left key never matches
    ]


def test_hash_join_full_outer_string_keys_one_side_empty(ray_session):
    """Object-dtype keys through the full_outer matched/unmatched scan
    (argsort/searchsorted on strings), plus an entirely empty left side —
    every right row must emit right-only."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table({"k": pa.array([], pa.string()), "lv": pa.array([], pa.int64())})
    right = pa.table(
        {"k2": pa.array(["x", "y", None]), "rv": pa.array([1, 2, 3], pa.int64())}
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "k2", ["lv"], ["rv"], how="full_outer", n_buckets=2,
    ).take_all()
    got = sorted((r["k"] or "", r["lv"], r["rv"]) for r in out)
    assert got == [("", None, 3), ("x", None, 1), ("y", None, 2)]

    # and the mirror: empty right side — every left row emits left-only
    out2 = hash_join(
        ray.data.from_arrow(right.rename_columns(["k", "rv"])),
        ray.data.from_arrow(pa.table({"k2": pa.array([], pa.string()),
                                      "lv": pa.array([], pa.int64())})),
        "k", "k2", ["rv"], ["lv"], how="full_outer", n_buckets=2,
    ).take_all()
    got2 = sorted((r["k"] or "", r["rv"], r["lv"]) for r in out2)
    assert got2 == [("", 3, None), ("x", 1, None), ("y", 2, None)]


def test_group_argmax_nulls_and_merge(ray_session):
    """Argmax survives the partial→merge path across many blocks; null
    order values lose to any non-null; an all-null key emits its null
    row; counts cover every row."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_argmax

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
            "v": pa.array([3, None, 7, 1, 1, None], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)  # one row per block
    out = group_argmax(ds, "k", ["v", "id"], n_buckets=4).take_all()
    got = {r["k"]: (r["v"], r["id"], r["n"]) for r in out}
    assert got == {
        "a": (7, 3, 3),      # max v wins; null v row still counted
        "b": (1, 5, 2),      # tie on v → max id wins
        "c": (None, 6, 1),   # all-null key emits its null row
    }


def test_histogram_fixed_width(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.agg import histogram_fixed_width

    t = pa.table({"v": pa.array([0, 5, 9, 10, 19, 25, None], pa.int64())})
    out = histogram_fixed_width(
        ray.data.from_arrow(t).repartition(3), "v", 10
    ).take_all()
    got = sorted((r["bin"], r["n"], r["min_v"], r["max_v"]) for r in out)
    assert got == [(0, 3, 0, 9), (1, 2, 10, 19), (2, 1, 25, 25)]


def test_group_entropy(ray_session):
    import math

    import ray.data

    from fs_schema_validator_ray.stages.agg import group_entropy

    t = pa.table(
        {
            "g": pa.array(["a"] * 4 + ["b"] * 3),
            "c": pa.array(["x", "x", "y", "y", "z", "z", "z"]),
        }
    )
    out = {r["g"]: (r["n"], r["entropy6"]) for r in
           group_entropy(ray.data.from_arrow(t).repartition(4), "g", "c").take_all()}
    assert out["a"] == (4, round(math.log(2), 6))   # 2 equally likely cats
    assert out["b"] == (3, 0.0)                      # single category


def test_group_string_agg_null_semantics(ray_session):
    """Null values skip (n counts non-null); all-null key emits null
    string with n=0; native-type ordering (int 9 before 10)."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_string_agg

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "v": pa.array([10, 9, None, None, None], pa.int64()),
        }
    )
    out = {r["k"]: (r["vals"], r["n"]) for r in group_string_agg(
        ray.data.from_arrow(t).repartition(3), "k", "v", n_buckets=4
    ).take_all()}
    assert out == {"a": ("9,10", 2), "b": (None, 0)}


def test_histogram_fixed_width_all_null(ray_session):
    """An all-null value column yields an EMPTY TYPED histogram, not a
    schemaless Dataset (groupby over 0 rows produces no blocks)."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import histogram_fixed_width

    t = pa.table({"v": pa.array([None, None], pa.int64())})
    out = histogram_fixed_width(ray.data.from_arrow(t), "v", 10)
    assert out.count() == 0
    assert set(out.schema().names) == {"bin", "n", "min_v", "max_v"}


def test_hash_join_salted_matches_unsalted(ray_session):
    """salt=4 spreads a hot key across sub-buckets; the result set is
    identical to the unsalted join (duplicates, unmatched-left nulls)."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    rng = np.random.default_rng(7)
    keys = np.where(rng.random(2000) < 0.8, 1, rng.integers(2, 50, 2000))  # hot key 1
    left = pa.table(
        {"k": pa.array(keys, pa.int64()),
         "lv": pa.array(np.arange(2000, dtype=np.int64))}
    )
    right = pa.table(
        {"k2": pa.array([1, 1, 2, 3, 60], pa.int64()),
         "rv": pa.array([10, 11, 20, 30, 600], pa.int64())}
    )
    for how in ("inner", "left"):
        base = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in hash_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                "k", "k2", ["lv"], ["rv"], how=how,
            ).take_all()
        )
        salted = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in hash_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                "k", "k2", ["lv"], ["rv"], how=how, salt=4,
            ).take_all()
        )
        assert salted == base

    import pytest

    with pytest.raises(ValueError):
        hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "k2", ["lv"], ["rv"], how="full_outer", salt=4,
        )


def test_weighted_sample_deterministic_and_biased(ray_session):
    """Same sample across runs and partitionings; zero/null weights are
    excluded; heavy items are sampled far more often than light ones."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import weighted_sample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 100 == 0, 1000.0, 1.0)  # 40 heavy items
    w[0] = 0.0                                  # excluded
    t = pa.table({"id": pa.array(ids), "w": pa.array(w)})
    s1 = sorted(r["id"] for r in weighted_sample(
        ray.data.from_arrow(t).repartition(4), "id", "w", 50).take_all())
    s2 = sorted(r["id"] for r in weighted_sample(
        ray.data.from_arrow(t).repartition(13), "id", "w", 50).take_all())
    assert s1 == s2 and len(s1) == 50
    assert 0 not in s1
    heavy = sum(1 for i in s1 if i % 100 == 0)
    assert heavy >= 25  # 40 heavy items carry ~91% of the total mass


def test_hash_join_composite_keys(ray_session):
    """Multi-column join key: equality = AND over components, a null in
    ANY component disqualifies the row, inner/left/full_outer all work,
    output carries every left key column."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    left = pa.table(
        {
            "k1": pa.array([1, 1, 2, 2, None], pa.int64()),
            "k2": pa.array(["x", "y", "x", None, "x"]),
            "lv": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    right = pa.table(
        {
            "r1": pa.array([1, 1, 2, 3], pa.int64()),
            "r2": pa.array(["x", "x", "z", "x"]),
            "rv": pa.array([100, 101, 102, 103], pa.int64()),
        }
    )
    inner = sorted(
        (r["k1"], r["k2"], r["lv"], r["rv"])
        for r in hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            ["k1", "k2"], ["r1", "r2"], ["lv"], ["rv"],
        ).take_all()
    )
    assert inner == [(1, "x", 10, 100), (1, "x", 10, 101)]

    left_out = sorted(
        ((r["k1"], r["k2"], r["lv"], r["rv"]) for r in hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            ["k1", "k2"], ["r1", "r2"], ["lv"], ["rv"], how="left",
        ).take_all()),
        key=lambda x: x[2],
    )
    assert left_out == [
        (1, "x", 10, 100), (1, "x", 10, 101),
        (1, "y", 11, None), (2, "x", 12, None),
        (2, None, 13, None), (None, "x", 14, None),
    ]

    full = sorted(
        ((r["k1"], r["k2"], r["lv"], r["rv"]) for r in hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            ["k1", "k2"], ["r1", "r2"], ["lv"], ["rv"], how="full_outer",
        ).take_all()),
        key=lambda x: (x[2] is None, x[2] or 0, x[3] or 0),
    )
    # left-driven rows as in `left`, plus right-only (2,z) and (3,x)
    assert full == [
        (1, "x", 10, 100), (1, "x", 10, 101),
        (1, "y", 11, None), (2, "x", 12, None),
        (2, None, 13, None), (None, "x", 14, None),
        (2, "z", None, 102), (3, "x", None, 103),
    ]


def test_asof_join_forward_and_nearest(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import asof_join

    left = ray.data.from_arrow(pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([5, 12, 30], pa.int64()),
            "lid": pa.array([100, 101, 102], pa.int64()),
        }
    ))
    right = ray.data.from_arrow(pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "rts": pa.array([10, 20], pa.int64()),
            "rid": pa.array([7, 8], pa.int64()),
        }
    ))
    fwd = sorted((r["l_lid"], r["r_rid"]) for r in asof_join(
        left, right, "k", "ts", "rts", ["lid"], ["rid"], direction="forward"
    ).take_all())
    # ts=5 → rts 10; ts=12 → rts 20; ts=30 → none (drops)
    assert fwd == [(100, 7), (101, 8)]

    near = sorted((r["l_lid"], r["r_rid"]) for r in asof_join(
        left, right, "k", "ts", "rts", ["lid"], ["rid"], direction="nearest"
    ).take_all())
    # ts=5 → 10 (d5); ts=12 → 10 (d2 < d8); ts=30 → 20 (only backward)
    assert near == [(100, 7), (101, 7), (102, 8)]

    # tie: ts=15 equidistant from 10 and 20 → backward (rid 7)
    tie = asof_join(
        ray.data.from_arrow(pa.table(
            {"k": pa.array([1], pa.int64()), "ts": pa.array([15], pa.int64()),
             "lid": pa.array([1], pa.int64())})),
        right, "k", "ts", "rts", ["lid"], ["rid"], direction="nearest",
    ).take_all()
    assert [(r["l_lid"], r["r_rid"]) for r in tie] == [(1, 7)]


def test_hash_join_prefilter_parity(ray_session):
    """exact and bloom prefilters produce the identical inner-join result
    (false negatives impossible); non-inner raises."""
    import pytest
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join

    rng = np.random.default_rng(11)
    left = pa.table(
        {"k": pa.array(rng.integers(0, 1000, 3000), pa.int64()),
         "lv": pa.array(np.arange(3000, dtype=np.int64))}
    )
    right = pa.table(
        {"k2": pa.array([3, 14, 159, 265, 358], pa.int64()),  # selective
         "rv": pa.array([1, 2, 3, 4, 5], pa.int64())}
    )
    base = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "k2", ["lv"], ["rv"],
        ).take_all()
    )
    assert base  # sanity: the selective join matches something
    for mode in ("exact", "bloom"):
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in hash_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                "k", "k2", ["lv"], ["rv"], prefilter=mode,
            ).take_all()
        )
        assert got == base

    with pytest.raises(ValueError):
        hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "k2", ["lv"], ["rv"], how="left", prefilter="exact",
        )


# --- heavy_hitters -----------------------------------------------------------


def test_heavy_hitters_exact_with_forced_truncation(ray_session):
    """k_per_batch far below batch cardinality forces the candidate pass
    to drop keys (non-zero error bound) — the verify pass must still
    return exact counts for every key above the threshold and nothing
    below it."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import heavy_hitters

    # 3 heavy keys (120/90/60 of 600 rows) + 300 near-unique light keys
    keys = (
        ["hot_a"] * 120 + ["hot_b"] * 90 + ["hot_c"] * 60
        + [f"light_{i}" for i in range(300) for _ in (0,)] + ["warm"] * 30
    )
    rng = np.random.default_rng(7)
    keys = [keys[i] for i in rng.permutation(len(keys))]
    t = pa.table({"k": pa.array(keys, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    # threshold = ceil(600 * 1/12) = 50 → hot_a, hot_b, hot_c qualify;
    # warm (30) and every light key (1) do not. k_per_batch=16 truncates
    # every ~100-row batch with ~50+ distinct keys.
    out = heavy_hitters(ds, "k", phi_num=1, phi_den=12, k_per_batch=16)
    rows = {r["k"]: r["cnt"] for r in out.take_all()}
    assert rows == {"hot_a": 120, "hot_b": 90, "hot_c": 60}


def test_heavy_hitters_null_keys_and_phi_guard(ray_session):
    import pytest
    import ray.data

    from fs_schema_validator_ray.stages.agg import heavy_hitters

    t = pa.table(
        {"k": pa.array(["a"] * 6 + [None] * 10 + ["b"] * 2, pa.string())}
    )
    ds = ray.data.from_arrow(t).repartition(2)
    # n = 8 non-null keys; threshold = ceil(8/2) = 4 → only "a"
    rows = {
        r["k"]: r["cnt"]
        for r in heavy_hitters(ds, "k", phi_num=1, phi_den=2).take_all()
    }
    assert rows == {"a": 6}
    with pytest.raises(ValueError):
        heavy_hitters(ds, "k", phi_num=1, phi_den=100, k_per_batch=8)


def test_broadcast_cross_join_expansion_and_empty_small(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.joins import broadcast_cross_join

    left = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    ).repartition(2)
    small = ray.data.from_arrow(
        pa.table({"x": pa.array(["p", "q"], pa.string())})
    )
    rows = sorted(
        (r["a"], r["x"])
        for r in broadcast_cross_join(left, small, ["x"]).take_all()
    )
    assert rows == [(1, "p"), (1, "q"), (2, "p"), (2, "q"), (3, "p"), (3, "q")]
    # empty small side → empty product, schema intact
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.string())}))
    out = broadcast_cross_join(left, empty, ["x"])
    assert out.count() == 0


# --- interval_overlap_join ---------------------------------------------------


def test_interval_overlap_randomized_vs_bruteforce(ray_session):
    """Banded sweep with once-per-pair ownership == exact brute force,
    across band widths smaller/equal/larger than interval lengths."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import interval_overlap_join

    rng = np.random.default_rng(17)
    nl, nr = 400, 300
    l_lo = rng.integers(0, 100_000, nl)
    l_hi = l_lo + rng.integers(1, 5_000, nl)
    r_lo = rng.integers(0, 100_000, nr)
    r_hi = r_lo + rng.integers(1, 8_000, nr)
    lt = pa.table({"lid": pa.array(np.arange(nl)), "lo": pa.array(l_lo), "hi": pa.array(l_hi)})
    rt = pa.table({"rid": pa.array(np.arange(nr)), "lo": pa.array(r_lo), "hi": pa.array(r_hi)})

    expect = set()
    for i in range(nl):
        ov = (l_lo[i] < r_hi) & (r_lo < l_hi[i])
        for j in np.flatnonzero(ov):
            expect.add((i, int(j)))

    for w in (500, 4_000, 50_000):
        out = interval_overlap_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            "lid", "lo", "hi", "rid", "lo", "hi", band_width=w,
        ).take_all()
        got = {(r["lid"], r["rid"]) for r in out}
        assert got == expect, f"band_width={w}"
        assert len(out) == len(got)  # exactly once per pair
        for r in out:
            assert r["overlap_lo"] == max(l_lo[r["lid"]], r_lo[r["rid"]])
            assert r["overlap_hi"] == min(l_hi[r["lid"]], r_hi[r["rid"]])


def test_interval_overlap_edges(ray_session):
    """Half-open semantics: touching intervals don't overlap; empty and
    null intervals drop; a long interval spanning many bands pairs once."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import interval_overlap_join

    lt = pa.table(
        {
            "lid": pa.array(["a", "b", "c", "d"]),
            "lo": pa.array([0, 100, 50, None], pa.int64()),
            "hi": pa.array([10, 100, 5_000, 20], pa.int64()),  # b is empty
        }
    )
    rt = pa.table(
        {
            "rid": pa.array(["x", "y", "z"]),
            "lo": pa.array([10, 95, 4_999], pa.int64()),
            "hi": pa.array([20, 105, 9_000], pa.int64()),
        }
    )
    out = interval_overlap_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "lid", "lo", "hi", "rid", "lo", "hi", band_width=7,
    ).take_all()
    got = sorted((r["lid"], r["rid"]) for r in out)
    # a-[0,10) vs x-[10,20): touching, NO overlap (half-open)
    # c-[50,5000) spans hundreds of 7-wide bands; pairs y and z exactly once
    assert got == [("c", "y"), ("c", "z")]


def test_interval_overlap_vad_vs_transcript_spans(ray_session):
    """Audio alignment shape: energy-VAD speech segments joined to
    word-level transcript spans — every word span that intersects a
    speech segment aligns to it."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import interval_overlap_join

    # speech segments (ms): two utterances with a silence gap
    vad = pa.table(
        {
            "seg": pa.array(["s0", "s1"]),
            "start_ms": pa.array([250, 2_000], pa.int64()),
            "end_ms": pa.array([1_200, 3_100], pa.int64()),
        }
    )
    words = pa.table(
        {
            "word": pa.array(["w0", "w1", "w2", "w3", "w4"]),
            "start_ms": pa.array([300, 900, 1_400, 2_050, 3_050], pa.int64()),
            "end_ms": pa.array([600, 1_250, 1_900, 2_600, 3_400], pa.int64()),
        }
    )
    out = interval_overlap_join(
        ray.data.from_arrow(vad), ray.data.from_arrow(words),
        "seg", "start_ms", "end_ms", "word", "start_ms", "end_ms",
        band_width=1_000,
    ).take_all()
    got = sorted((r["seg"], r["word"]) for r in out)
    # w2 sits fully in the silence gap; w1/w4 straddle segment edges
    assert got == [("s0", "w0"), ("s0", "w1"), ("s1", "w3"), ("s1", "w4")]


def test_asof_join_tolerance(ray_session):
    """pandas merge_asof parity: the BEST match must fall within
    tolerance or the left row drops (no fallback to farther matches),
    in all three directions."""
    import ray.data

    from fs_schema_validator_ray.stages.joins import asof_join

    left = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b"]),
            "lts": pa.array([100, 205, 390, 50], pa.int64()),
            "lid": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "rts": pa.array([90, 200, 500], pa.int64()),
            "rid": pa.array([10, 20, 30], pa.int64()),
        }
    )
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right)

    def run(direction, tol):
        out = asof_join(
            lds, rds, "k", "lts", "rts", ["lid"], ["rid"],
            direction=direction, tolerance=tol,
        ).take_all()
        return sorted((r["l_lid"], r["r_rid"]) for r in out)

    # backward, tol 20: lid1→rid10 (d=10 ok), lid2→rid20 (d=5 ok),
    # lid3→rid20 (d=190 DROPS), b-key has no backward match
    assert run("backward", 20) == [(1, 10), (2, 20)]
    # forward, tol 460: lid4→rid30 (d=450 ok); a-key lids 1,2 match
    # forward within tolerance too (d=100, d=... lid1→rid20 d=100,
    # lid2→rid? none ≥205 → drop; lid3 none)
    assert run("forward", 460) == [(1, 20), (4, 30)]
    # nearest, tol 12: lid1 nearest rid10 d=10 ok; lid2 nearest rid20
    # d=5 ok; lid3 nearest rid20 d=190 drop; lid4 d=450 drop
    assert run("nearest", 12) == [(1, 10), (2, 20)]
    # no tolerance: previous behavior intact
    assert run("backward", None) == [(1, 10), (2, 20), (3, 20)]


def test_sequence_islands(ray_session):
    import pyarrow as pa
    import ray

    from fs_schema_validator_ray.stages.agg import sequence_islands

    tbl = pa.table(
        {
            "k": pa.array(["a"] * 7 + ["b"] * 3 + [None] * 2, pa.string()),
            "v": pa.array([5, 3, 4, 4, 9, 10, None, 1, 2, 7, 1, 2], pa.int64()),
        }
    )
    out = sequence_islands(ray.data.from_arrow(tbl).repartition(3), "k", "v")
    rows = sorted(
        (r["k"] or "", r["island_start"], r["island_end"], r["island_len"])
        for r in out.take_all()
    )
    # "a": {3,4,5} and {9,10} (dup 4 deduped, null dropped); "b": {1,2},{7};
    # the null key forms its own group with {1,2}
    assert rows == [
        ("", 1, 2, 2),
        ("a", 3, 5, 3),
        ("a", 9, 10, 2),
        ("b", 1, 2, 2),
        ("b", 7, 7, 1),
    ]


# --- round-5 aggregate additions ---------------------------------------------


def test_group_bitagg_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_bitagg

    rng = np.random.default_rng(7)
    keys = rng.choice(list("abc"), 500)
    vals = rng.integers(0, 1 << 40, 500, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(6)
    out = {
        r["k"]: (r["band"], r["bor"], r["bxor"], r["n"])
        for r in group_bitagg(ds, ["k"], "v").take_all()
    }
    for k in "abc":
        sel = vals[keys == k]
        assert out[k] == (
            int(np.bitwise_and.reduce(sel)),
            int(np.bitwise_or.reduce(sel)),
            int(np.bitwise_xor.reduce(sel)),
            len(sel),
        ), k


def test_group_bitagg_composite_keys_and_single_row(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_bitagg

    t = pa.table(
        {
            "a": ["x", "x", "y"],
            "b": [1, 2, 1],
            "v": pa.array([0b1100, 0b1010, 0b0111], pa.int64()),
        }
    )
    out = {
        (r["a"], r["b"]): (r["band"], r["bor"], r["bxor"])
        for r in group_bitagg(
            ray.data.from_arrow(t).repartition(2), ["a", "b"], "v"
        ).take_all()
    }
    assert out[("x", 1)] == (0b1100, 0b1100, 0b1100)
    assert out[("x", 2)] == (0b1010, 0b1010, 0b1010)
    assert out[("y", 1)] == (0b0111, 0b0111, 0b0111)
