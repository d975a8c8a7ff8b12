"""Dataset mixing (train-mix composer): deterministic copies rule,
proportion convergence, copy indexing, and input validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fs_schema_validator_ray.stages.mixing import _mix_hash, mix_sources


def _ds(n=2000, sources=("a", "b", "c")):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array([sources[i % len(sources)] for i in range(n)]),
            }
        )
    )


def _collect(ds):
    return [
        r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()
    ]


def test_integer_weights_exact_copies():
    rows = _collect(mix_sources(_ds(300), {"a": 2.0, "b": 1.0, "c": 0.0}))
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["copy_ix"])
    assert sorted(set(per["a"])) == [0, 1] and len(per["a"]) == 200
    assert set(per["b"]) == {0} and len(per["b"]) == 100
    assert "c" not in per


def test_fractional_weight_rate_converges():
    n = 9000
    rows = _collect(mix_sources(_ds(n, ("a",)), {"a": 0.37}))
    rate = len(rows) / n
    assert abs(rate - 0.37) < 0.02
    # exactly the keyed rule, not approximately
    kept = {r["doc_id"] for r in rows}
    keys = np.arange(n, dtype=np.int64)
    want = set(keys[_mix_hash(keys) < 3700].tolist())
    assert kept == want


def test_upsample_fraction_and_copy_index():
    rows = _collect(mix_sources(_ds(1000, ("a",)), {"a": 2.5}))
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], set()).add(r["copy_ix"])
    counts = {len(v) for v in by_id.values()}
    assert counts <= {2, 3}
    n3 = sum(1 for v in by_id.values() if len(v) == 3)
    assert abs(n3 / 1000 - 0.5) < 0.05
    for v in by_id.values():
        assert v == set(range(len(v)))  # contiguous 0-based copy_ix


def test_default_weight_and_validation():
    rows = _collect(
        mix_sources(_ds(90), {"a": 0.0}, default_weight=1.0)
    )
    assert {r["source"] for r in rows} == {"b", "c"}
    with pytest.raises(ValueError, match="finite"):
        mix_sources(_ds(10), {"a": float("nan")})
    with pytest.raises(ValueError, match=">= 0"):
        mix_sources(_ds(10), {"a": -1.0})


def test_determinism_across_runs():
    a = sorted(map(tuple, (r.values() for r in _collect(
        mix_sources(_ds(500), {"a": 1.25, "b": 0.4, "c": 3.0})))))
    b = sorted(map(tuple, (r.values() for r in _collect(
        mix_sources(_ds(500), {"a": 1.25, "b": 0.4, "c": 3.0})))))
    assert a == b


# --- leakage-free split -------------------------------------------------------


def _split_rows(ds):
    return [
        r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()
    ]


def test_split_duplicates_never_straddle():
    from fs_schema_validator_ray.stages.mixing import leakage_free_split

    # 60 distinct texts, each duplicated 1-3 times under different ids
    texts, ids = [], []
    nid = 0
    for i in range(60):
        t = f"document body number {i} with shared content"
        for _ in range(1 + i % 3):
            texts.append(t)
            ids.append(nid)
            nid += 1
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ).repartition(5)
    rows = _split_rows(leakage_free_split(ds))
    assert len(rows) == len(ids)
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r["rep"], set()).add(r["split"])
    # every duplicate cluster lands in exactly one split
    assert all(len(s) == 1 for s in by_rep.values())
    # rep is the min id of its cluster
    min_per_rep = {}
    for r in rows:
        min_per_rep[r["rep"]] = min(min_per_rep.get(r["rep"], r["doc_id"]), r["doc_id"])
    assert all(rep == m for rep, m in min_per_rep.items())


def test_split_fractions_converge():
    from fs_schema_validator_ray.stages.mixing import leakage_free_split

    n = 5000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": [f"unique text {i}" for i in range(n)],
            }
        )
    )
    rows = _split_rows(leakage_free_split(ds, fractions=(0.8, 0.1)))
    frac = {s: sum(1 for r in rows if r["split"] == s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_split_fraction_validation():
    from fs_schema_validator_ray.stages.mixing import leakage_free_split

    with pytest.raises(ValueError, match="fractions"):
        leakage_free_split(ray.data.range(4), fractions=(0.9, 0.2))
