"""grouping_sets_sum / cube_sum and group_moments (cov/corr combiner)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


_ABBA = {
    "a": pa.array(["x", "x", "y", "y"], pa.string()),
    "b": pa.array(["p", "q", "p", "q"], pa.string()),
    "v": pa.array([1, 2, 4, 8], pa.int64()),
}


def test_cube_sum_all_subsets(ray_session):
    from fs_schema_validator_ray.stages.agg import cube_sum

    rows = {
        (r["a"], r["b"]): (r["v"], r["n"])
        for r in cube_sum(_ds(_ABBA), ["a", "b"], ["v"]).take_all()
    }
    assert rows == {
        ("x", "p"): (1, 1),
        ("x", "q"): (2, 1),
        ("y", "p"): (4, 1),
        ("y", "q"): (8, 1),
        ("x", None): (3, 2),
        ("y", None): (12, 2),
        (None, "p"): (5, 2),
        (None, "q"): (10, 2),
        (None, None): (15, 4),
    }


def test_cube_sum_matches_duckdb(ray_session):
    import duckdb

    from fs_schema_validator_ray.stages.agg import cube_sum

    tbl = pa.table(_ABBA)
    got = [
        (r["a"], r["b"], r["v"], r["n"])
        for r in cube_sum(_ds(_ABBA), ["a", "b"], ["v"]).take_all()
    ]
    con = duckdb.connect()
    con.register("t", tbl)
    want = [
        tuple(w)
        for w in con.execute(
            "SELECT a, b, CAST(SUM(v) AS BIGINT), COUNT(*) FROM t GROUP BY CUBE(a, b)"
        ).fetchall()
    ]
    # sorted() over tuples with None: normalize via key
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_grouping_sets_subset_selection(ray_session):
    from fs_schema_validator_ray.stages.agg import grouping_sets_sum

    res = grouping_sets_sum(_ds(_ABBA), ["a", "b"], [["b"], []], ["v"])
    rows = {(r["a"], r["b"]): (r["v"], r["n"]) for r in res.take_all()}
    assert rows == {
        (None, "p"): (5, 2),
        (None, "q"): (10, 2),
        (None, None): (15, 4),
    }


def test_grouping_sets_rejects_unknown_key(ray_session):
    from fs_schema_validator_ray.stages.agg import grouping_sets_sum

    with pytest.raises(ValueError, match="not in keys"):
        grouping_sets_sum(_ds(_ABBA), ["a"], [["zz"]], ["v"])


def test_group_moments_matches_numpy(ray_session):
    from fs_schema_validator_ray.stages.agg import group_moments

    rng = np.random.default_rng(3)
    k = rng.choice(["g1", "g2"], size=200)
    x = rng.integers(0, 5000, size=200)
    y = (x // 100) + rng.integers(0, 50, size=200)  # correlated
    ds = _ds(
        {
            "k": pa.array(k),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    out = {r["k"]: r for r in group_moments(ds, ["k"], "x", "y").take_all()}
    for g in ["g1", "g2"]:
        sel = k == g
        xs, ys = x[sel].astype(np.int64), y[sel].astype(np.int64)
        n = int(sel.sum())
        r = out[g]
        assert r["n"] == n
        assert r["sum_x"] == int(xs.sum()) and r["sum_y"] == int(ys.sum())
        assert r["sum_xy"] == int((xs * ys).sum())
        assert r["cov_num"] == n * int((xs * ys).sum()) - int(xs.sum()) * int(
            ys.sum()
        )
        want_corr = np.corrcoef(xs.astype(float), ys.astype(float))[0, 1]
        assert abs(r["corr6"] - want_corr) < 1e-5


def test_group_moments_zero_variance_corr_is_nan(ray_session):
    from fs_schema_validator_ray.stages.agg import group_moments

    ds = _ds(
        {
            "k": pa.array(["z", "z"]),
            "x": pa.array([7, 7], pa.int64()),
            "y": pa.array([1, 2], pa.int64()),
        }
    )
    r = group_moments(ds, ["k"], "x", "y").take_all()[0]
    assert r["cov_num"] == 0
    assert r["corr6"] is None or np.isnan(r["corr6"])
