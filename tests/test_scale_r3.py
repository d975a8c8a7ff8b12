"""Round-3 scale-safety regressions: broadcast IQR bounds at 100k+
keys, bucketed salted top-k at high key cardinality, weighted-sample
determinism with duplicate ids (VERDICT r2 items 3-4 + ADVICE)."""

import numpy as np
import pandas as pd
import pyarrow as pa


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
