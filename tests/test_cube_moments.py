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


# --- iqr_outlier_filter -------------------------------------------------------


def test_iqr_outlier_filter_basic(ray_session):
    from fs_schema_validator_ray.stages.agg import iqr_outlier_filter

    # key 'a': values 1..9 plus a wild 1000 -> only 1000 is outside the fence
    vals = list(range(1, 10)) + [1000]
    ds = _ds(
        {
            "k": pa.array(["a"] * 10 + ["b"] * 3, pa.string()),
            "v": pa.array(vals + [5, 5, 5], pa.int64()),
            "rid": pa.array(range(13), pa.int64()),
        }
    )
    out = iqr_outlier_filter(ds, "k", "v", passthrough=["rid"]).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["k"] == "a" and r["v"] == 1000 and r["rid"] == 9
    assert r["q_25"] == 3 and r["q_75"] == 8  # quantile_disc semantics


def test_iqr_outlier_filter_nulls_and_all_null_key(ray_session):
    from fs_schema_validator_ray.stages.agg import iqr_outlier_filter

    ds = _ds(
        {
            "k": pa.array(["a", "a", "a", "a", "z", "z"], pa.string()),
            "v": pa.array([1, 2, 3, None, None, None], pa.int64()),
            "rid": pa.array(range(6), pa.int64()),
        }
    )
    # null values are never outliers; key 'z' has no non-null values ->
    # no bounds -> none of its rows emit
    out = iqr_outlier_filter(ds, "k", "v", passthrough=["rid"]).take_all()
    assert out == []


def test_iqr_outlier_filter_matches_duckdb(ray_session):
    import duckdb

    from fs_schema_validator_ray.stages.agg import iqr_outlier_filter

    rng = np.random.default_rng(5)
    k = rng.choice(["p", "q", "r"], size=300)
    v = rng.integers(-50, 50, size=300)
    v[::37] *= 100  # plant outliers
    tbl = pa.table(
        {
            "k": pa.array(k),
            "v": pa.array(v, pa.int64()),
            "rid": pa.array(range(300), pa.int64()),
        }
    )
    got = sorted(
        (r["rid"], r["k"], r["v"])
        for r in iqr_outlier_filter(
            _ds(dict(zip(tbl.column_names, tbl.columns))), "k", "v",
            passthrough=["rid"],
        ).take_all()
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = sorted(
        tuple(w)
        for w in con.execute(
            """
            WITH b AS (SELECT k, quantile_disc(v,0.25) q1,
                              quantile_disc(v,0.75) q3 FROM t GROUP BY k)
            SELECT rid, t.k, v FROM t JOIN b USING(k)
            WHERE 2*v < 2*q1 - 3*(q3-q1) OR 2*v > 2*q3 + 3*(q3-q1)
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_group_moments_slope_mode(ray_session):
    """include_slope=True: REGR_SLOPE(y, x) per key, float-exact over
    the int sums; no cov_num/corr6 in the schema (they would silently
    overflow at cents scale); zero-variance x → NaN slope."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.agg import group_moments

    rng = np.random.default_rng(4)
    x = rng.integers(1, 100, 400)
    y = 3 * x + rng.integers(-5, 6, 400)
    t = pa.table(
        {
            "k": pa.array(["a"] * 400 + ["const"] * 3, pa.string()),
            "x": pa.array(np.concatenate([x, [7, 7, 7]]), pa.int64()),
            "y": pa.array(np.concatenate([y, [1, 2, 3]]), pa.int64()),
        }
    )
    out = group_moments(
        ray.data.from_arrow(t).repartition(4), ["k"], "x", "y", include_slope=True
    ).to_pandas().set_index("k")
    assert "cov_num" not in out.columns and "corr6" not in out.columns
    ref = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    assert out.loc["a", "slope6"] == pytest.approx(ref, abs=1e-6)
    assert np.isnan(out.loc["const", "slope6"])  # zero x-variance
    # default mode schema unchanged (regression guard for corr callers)
    out2 = group_moments(
        ray.data.from_arrow(t).repartition(2), ["k"], "x", "y"
    ).to_pandas()
    assert {"cov_num", "corr6"} <= set(out2.columns)
    assert "slope6" not in out2.columns


def test_grouped_mannwhitney_vs_direct_definition(ray_session):
    """2·U_A must equal the direct pairwise definition
    Σ_{a∈A,b∈B} (2·[a>b] + [a==b]) on tied integer data, per key."""
    import pandas as pd
    import ray.data

    from fs_schema_validator_ray.stages.agg import grouped_mannwhitney

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], n),
            "v": rng.integers(0, 12, n),
            "s": rng.choice(["A", "B", "C"], n),
        }
    )
    # plant some null values and null sample tags (value nulls drop;
    # null sample counts as B)
    df.loc[df.index[:40], "v"] = None
    df.loc[df.index[40:60], "s"] = None
    ds = ray.data.from_pandas(df).repartition(5)
    got = grouped_mannwhitney(ds, "k", "v", "s", "A").to_pandas()
    for k, sub in df.dropna(subset=["v"]).groupby("k"):
        a = sub.loc[sub["s"] == "A", "v"].to_numpy()
        b = sub.loc[sub["s"] != "A", "v"].to_numpy()
        gt = a[:, None] > b[None, :]
        eq = a[:, None] == b[None, :]
        u2 = 2 * int(gt.sum()) + int(eq.sum())
        row = got[got["k"] == k].iloc[0]
        assert (row["n_a"], row["n_b"]) == (len(a), len(b))
        assert row["u2_a"] == u2, k
        assert row["u2_b"] == 2 * len(a) * len(b) - u2


def test_grouped_geo_harmonic_vs_numpy(ray_session):
    import pandas as pd
    import ray.data

    from fs_schema_validator_ray.stages.agg import grouped_geo_harmonic_mean

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.choice(["a", "b"], 2000), "v": rng.integers(1, 30, 2000)}
    )
    df.loc[df.index[:25], "v"] = None
    got = grouped_geo_harmonic_mean(
        ray.data.from_pandas(df).repartition(4), "k", "v"
    ).to_pandas()
    for k, sub in df.dropna(subset=["v"]).groupby("k"):
        v = sub["v"].to_numpy(dtype=float)
        row = got[got["k"] == k].iloc[0]
        assert row["n"] == len(v)
        assert abs(row["geomean6"] - np.exp(np.log(v).mean())) < 1e-5
        assert abs(row["harmonic6"] - len(v) / (1.0 / v).sum()) < 1e-5


def test_grouped_geo_harmonic_rejects_nonpositive(ray_session):
    import pandas as pd
    import ray.data

    from fs_schema_validator_ray.stages.agg import grouped_geo_harmonic_mean

    df = pd.DataFrame({"k": ["a", "a"], "v": [3, 0]})
    with pytest.raises(Exception, match="non-positive"):
        grouped_geo_harmonic_mean(ray.data.from_pandas(df), "k", "v").to_pandas()


def test_mutual_information_vs_direct(ray_session):
    """MI contributions must sum to the direct Σ p_ij·ln(p_ij/(p_i·p_j))
    and independence must give ≈0 MI."""
    import pandas as pd
    import ray.data

    from fs_schema_validator_ray.stages.agg import mutual_information

    rng = np.random.default_rng(9)
    # dependent: b copies a most of the time
    a = rng.choice(["x", "y", "z"], 4000)
    flip = rng.random(4000) < 0.2
    b = np.where(flip, rng.choice(["x", "y", "z"], 4000), a)
    df = pd.DataFrame({"a": a, "b": b})
    got = mutual_information(
        ray.data.from_pandas(df).repartition(4), "a", "b"
    ).to_pandas()
    joint = df.value_counts(["a", "b"]).rename("c").reset_index()
    n = len(df)
    pa_ = df["a"].value_counts() / n
    pb_ = df["b"].value_counts() / n
    mi_direct = sum(
        (r.c / n) * np.log((r.c / n) / (pa_[r.a] * pb_[r.b]))
        for r in joint.itertuples()
    )
    assert abs(got["mi_contrib6"].sum() - mi_direct) < 1e-4
    assert mi_direct > 0.3  # genuinely dependent

    indep = pd.DataFrame(
        {"a": rng.choice(["x", "y"], 20000), "b": rng.choice(["u", "v"], 20000)}
    )
    got_i = mutual_information(ray.data.from_pandas(indep), "a", "b").to_pandas()
    assert abs(got_i["mi_contrib6"].sum()) < 1e-3


# --- Kendall tau-b ----------------------------------------------------------


def _brute_tau(x, y):
    """O(n²) ground truth: concordant/discordant/tie pair counts."""
    import numpy as np

    n = len(x)
    c = d = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                txy += 1; tx += 1; ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    den = ((n0 - tx) * (n0 - ty)) ** 0.5
    return c - d, (None if den == 0 else (c - d) / den)


def test_grouped_kendall_tau_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from fs_schema_validator_ray.stages.agg import grouped_kendall_tau

    rng = np.random.default_rng(17)
    ks, xs, ys = [], [], []
    sizes = {0: 1, 1: 2, 2: 37, 3: 64, 4: 101, 5: 5}
    for key, size in sizes.items():
        ks += [key] * size
        xs += list(rng.integers(0, 12, size))  # heavy ties
        ys += list(rng.integers(-6, 6, size))
    # null pairs excluded
    tbl = pa.table(
        {
            "k": pa.array(ks + [0, 1], pa.int64()),
            "x": pa.array(xs + [None, 3], pa.int64()),
            "y": pa.array(ys + [1, None], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = {r["k"]: r for r in grouped_kendall_tau(ds, "k", "x", "y").take_all()}
    assert set(out) == set(sizes)
    i = 0
    for key, size in sizes.items():
        gx, gy = xs[i : i + size], ys[i : i + size]
        i += size
        cmd, tau = _brute_tau(gx, gy)
        assert out[key]["n"] == size
        assert out[key]["con_minus_dis"] == cmd, key
        if tau is None:
            assert out[key]["tau_b"] is None, key
        else:
            assert abs(out[key]["tau_b"] - round(tau, 6)) < 1e-9, key


def test_grouped_kendall_tau_perfect_orders(ray_session):
    import pyarrow as pa
    import ray

    from fs_schema_validator_ray.stages.agg import grouped_kendall_tau

    n = 50
    tbl = pa.table(
        {
            "k": pa.array(["up"] * n + ["down"] * n, pa.string()),
            "x": pa.array(list(range(n)) * 2, pa.int64()),
            "y": pa.array(list(range(n)) + list(range(n, 0, -1)), pa.int64()),
        }
    )
    out = {
        r["k"]: r
        for r in grouped_kendall_tau(
            ray.data.from_arrow(tbl), "k", "x", "y"
        ).take_all()
    }
    assert out["up"]["tau_b"] == 1.0
    assert out["down"]["tau_b"] == -1.0
