"""Duplicate-aware broadcast join + cost-based strategy pick
(`broadcast_join_multi` / `join_auto`).

Parity contract: both strategies must produce IDENTICAL results to a
pandas merge on duplicate keys, null keys, and unmatched left rows —
the strategy pick is a physical-plan decision, never a semantic one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fs_schema_validator_ray.stages.joins import (
    broadcast_join_multi,
    hash_join,
    join_auto,
)


def _mk(ray_session, seed=7, n_left=400, n_right=120):
    import ray

    rng = np.random.default_rng(seed)
    lkey = rng.integers(0, 60, n_left).astype("float64")
    lkey[rng.random(n_left) < 0.05] = np.nan  # null probe keys
    left = pa.table(
        {
            "k": pa.array([None if np.isnan(v) else int(v) for v in lkey], pa.int64()),
            "lv": pa.array(np.arange(n_left, dtype=np.int64)),
        }
    )
    rkey = rng.integers(0, 40, n_right)  # dups + keys 40..59 unmatched on right
    right = pa.table(
        {
            "rk": pa.array(rkey, pa.int64()),
            "rv": pa.array([f"r{i}" for i in range(n_right)], pa.string()),
        }
    )
    return (
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        left.to_pandas(),
        right.to_pandas(),
    )


def _nonesort(rows):
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _expected(lpd, rpd, how):
    m = lpd.merge(rpd, left_on="k", right_on="rk", how=how)
    m = m[["k", "lv", "rv"]]
    return _nonesort(
        (None if pd.isna(k) else int(k), int(lv), None if pd.isna(rv) else rv)
        for k, lv, rv in m.itertuples(index=False)
    )


def _got(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")) if ds.count() else None
    if t is None:
        return []
    return _nonesort(
        (r["k"], r["lv"], r["rv"]) for r in t.select(["k", "lv", "rv"]).to_pylist()
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_multi_matches_pandas_and_hash_join(ray_session, how):
    lds, rds, lpd, rpd = _mk(ray_session)
    exp = _expected(lpd, rpd, how)
    got_b = _got(broadcast_join_multi(lds, rds, "k", "rk", ["lv"], ["rv"], how=how))
    assert got_b == exp
    got_h = _got(hash_join(lds, rds, "k", "rk", ["lv"], ["rv"], how=how))
    assert got_h == exp


def test_join_auto_picks_broadcast_for_small_side(ray_session):
    lds, rds, lpd, rpd = _mk(ray_session, seed=11)
    dec: dict = {}
    out = join_auto(
        lds, rds, "k", "rk", ["lv"], ["rv"], how="inner",
        broadcast_max_bytes=1 << 30, _decision=dec,
    )
    assert _got(out) == _expected(lpd, rpd, "inner")
    # from_arrow lineage reports exact in-memory size → decision is informed
    assert dec["strategy"] == "broadcast"
    assert dec["right_bytes_estimate"] is not None


def test_join_auto_falls_to_shuffle_over_threshold(ray_session):
    lds, rds, lpd, rpd = _mk(ray_session, seed=13)
    dec: dict = {}
    out = join_auto(
        lds, rds, "k", "rk", ["lv"], ["rv"], how="left",
        broadcast_max_bytes=1, _decision=dec,
    )
    assert dec["strategy"] == "shuffle"
    assert _got(out) == _expected(lpd, rpd, "left")


def test_join_auto_composite_and_outer_fall_to_shuffle(ray_session):
    import ray

    left = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([1, 2], pa.int64()),
                  "lv": pa.array([10, 20], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"c": pa.array([1, 3], pa.int64()), "d": pa.array([1, 3], pa.int64()),
                  "rv": pa.array(["x", "y"], pa.string())})
    )
    dec: dict = {}
    out = join_auto(
        left, right, ["a", "b"], ["c", "d"], ["lv"], ["rv"],
        broadcast_max_bytes=1 << 30, _decision=dec,
    )
    assert dec["strategy"] == "shuffle"
    rows = out.take_all()
    assert [(r["a"], r["lv"], r["rv"]) for r in rows] == [(1, 10, "x")]


def test_broadcast_multi_string_keys_and_empty_right(ray_session):
    import ray

    left = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", None], pa.string()),
                  "lv": pa.array([1, 2, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(["a", "a", None], pa.string()),
                  "rv": pa.array([10, 11, 99], pa.int64())})
    )
    got = broadcast_join_multi(left, right, "k", "rk", ["lv"], ["rv"], how="left")
    rows = _nonesort((r["k"], r["lv"], r["rv"]) for r in got.take_all())
    # "a" matches both build rows; "b" and the null-key row emit with null rv;
    # the null BUILD key never matches anything
    assert rows == [("a", 1, 10), ("a", 1, 11), ("b", 2, None), (None, 3, None)]

    empty_right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.string()), "rv": pa.array([], pa.int64())})
    )
    got_i = broadcast_join_multi(left, empty_right, "k", "rk", ["lv"], ["rv"])
    assert got_i.count() == 0
    got_l = broadcast_join_multi(left, empty_right, "k", "rk", ["lv"], ["rv"], how="left")
    rows = _nonesort((r["k"], r["lv"], r["rv"]) for r in got_l.take_all())
    assert rows == [("a", 1, None), ("b", 2, None), (None, 3, None)]
