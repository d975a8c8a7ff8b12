"""Round-3 scale-safety regressions: broadcast IQR bounds at 100k+
keys, bucketed salted top-k at high key cardinality, weighted-sample
determinism with duplicate ids (VERDICT r2 items 3-4 + ADVICE)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_iqr_outlier_filter_100k_keys(ray_session):
    """Bounds travel via ray.put + vectorized per-worker index — exact
    Tukey fences at 100k distinct keys (driver-dict regression)."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import iqr_outlier_filter

    n_keys = 100_000
    # per key: values [1, 2, 3, 4, big] → q_25=2, q_75=4 (disc), fences
    # [-1, 7] at k=1.5 → exactly the big value (≥100) is an outlier
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), 5)
    base = np.tile(np.array([1, 2, 3, 4, 0], dtype=np.int64), n_keys)
    big = 100 + (np.arange(n_keys, dtype=np.int64) % 50)
    vals = base.copy()
    vals[4::5] = big
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = (
        iqr_outlier_filter(ray.data.from_arrow(t).repartition(16), "k", "v")
        .to_pandas()
        .sort_values("k")
    )
    assert len(out) == n_keys
    assert np.array_equal(out["k"].to_numpy(), np.arange(n_keys))
    assert np.array_equal(out["v"].to_numpy(), big)
    assert (out["q_25"] == 2).all() and (out["q_75"] == 4).all()


def test_salted_topk_high_cardinality_matches_pandas(ray_session):
    """Phase 1 must be bucket-vectorized (one call per bucket, not per
    (key, salt) group): 30k distinct keys incl. one hot key with 20k
    rows — result equals the pandas ground truth."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import salted_topk_per_key

    rng = np.random.default_rng(11)
    n_keys = 30_000
    keys = np.concatenate(
        [
            rng.integers(0, n_keys, 60_000),  # long tail
            np.zeros(20_000, dtype=np.int64),  # hot key 0
        ]
    )
    n = len(keys)
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 1_000_000, n).astype(np.int64)
    t = pa.table(
        {"k": pa.array(keys), "v": pa.array(vals), "id": pa.array(ids)}
    )
    out = (
        salted_topk_per_key(
            ray.data.from_arrow(t).repartition(16), "k", "v", k=3,
            tiebreak_column="id",
        )
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"k": keys, "v": vals, "id": ids})
    expect = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k", sort=True)
        .head(3)
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "v", "id"]], expect[["k", "v", "id"]])


def test_weighted_sample_duplicate_ids_deterministic(ray_session):
    """ADVICE r2: duplicate ids hash to identical priorities; the id
    tiebreak must make the sample independent of partitioning."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import weighted_sample

    ids = ["dup"] * 40 + [f"u{i}" for i in range(200)]
    w = [5.0] * 40 + [1.0 + (i % 7) for i in range(200)]
    t = pa.table({"id": pa.array(ids), "w": pa.array(w, pa.float64())})

    results = []
    for n_parts in (1, 3, 17):
        out = (
            weighted_sample(
                ray.data.from_arrow(t).repartition(n_parts), "id", "w", k=25
            )
            .to_pandas()
            .sort_values(["priority", "id"], ascending=[False, True])
            .reset_index(drop=True)
        )
        results.append(out)
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other)
    # the duplicate id's rows are interchangeable: identical (id, w,
    # priority) rows — the selected multiset is what must be stable
    assert len(results[0]) == 25


def test_grouped_mad_and_spearman_ground_truth(ray_session):
    """MAD vs hand-computed medians (incl. nulls dropped); Spearman vs a
    direct numpy fractional-rank Pearson on each group, incl. ties, a
    perfectly monotone group (rho=1) and an n=1 group (NULL)."""
    import ray.data

    from fs_schema_validator_ray.stages.agg import grouped_mad, grouped_spearman

    t = pa.table(
        {
            "k": pa.array(["a"] * 7 + ["b"] * 5 + ["c"]),
            "x": pa.array([1, 2, 2, 3, 10, None, 4, 1, 2, 3, 4, 5, 9], pa.int64()),
            "y": pa.array([5, 1, 1, 8, 9, 7, 2, 2, 4, 6, 8, 10, 3], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)

    mad = {
        r["k"]: (r["n"], r["mad"])
        for r in grouped_mad(ds, "k", "x").take_all()
    }
    # a: non-null x = [1,2,2,3,10,4] → median 2.5, |dev| = [1.5,.5,.5,.5,7.5,1.5] → median 1.0
    assert mad["a"] == (6, 1.0)
    # b: [1..5] → median 3, devs [2,1,0,1,2] → median 1
    assert mad["b"] == (5, 1.0)
    assert mad["c"] == (1, 0.0)

    def frac_ranks(v):
        v = np.asarray(v, float)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j - 1) / 2.0 + 1.0
            i = j
        return ranks

    got = {r["k"]: (r["n"], r["spearman"])
           for r in grouped_spearman(ds, "k", "x", "y").take_all()}
    df = t.to_pandas().dropna(subset=["x", "y"])
    for k, sub in df.groupby("k"):
        rx, ry = frac_ranks(sub["x"]), frac_ranks(sub["y"])
        n = len(sub)
        if n < 2 or rx.std() == 0 or ry.std() == 0:
            assert got[k] == (n, None)
            continue
        num = n * (rx * ry).sum() - rx.sum() * ry.sum()
        den = np.sqrt(
            (n * (rx * rx).sum() - rx.sum() ** 2)
            * (n * (ry * ry).sum() - ry.sum() ** 2)
        )
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(round(num / den, 6), abs=1e-9)
    # b is strictly monotone in both → rho exactly 1
    assert got["b"] == (5, 1.0)
    assert got["c"] == (1, None)
