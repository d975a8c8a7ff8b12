"""DecontaminateStage / benchmark_shingle_set and RepetitionStage."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_benchmark_shingle_set_distinct_and_sorted(ray_session):
    from fs_schema_validator_ray.stages.decontaminate import benchmark_shingle_set

    ds = _ds(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # identical trigrams across the two docs must dedup
            "text": pa.array(["the quick brown fox", "the quick brown fox"]),
        }
    )
    s = benchmark_shingle_set(ds, shingle_n=3)
    assert s.dtype == np.uint64
    assert len(s) == 2  # 'the quick brown', 'quick brown fox'
    assert np.all(np.diff(s.view(np.uint64).astype(object)) > 0)


def test_benchmark_shingle_set_cap_raises(ray_session):
    from fs_schema_validator_ray.stages.decontaminate import benchmark_shingle_set

    ds = _ds(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([" ".join(f"tok{i}" for i in range(40))]),
        }
    )
    with pytest.raises(ValueError, match="max_entries"):
        benchmark_shingle_set(ds, shingle_n=3, max_entries=5)


def test_decontaminate_flags_overlap(ray_session):
    from fs_schema_validator_ray.stages.decontaminate import decontaminate

    bench = _ds(
        {
            "doc_id": pa.array([100], pa.int64()),
            "text": pa.array(["alpha beta gamma delta"]),
        }
    )
    corpus = _ds(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta",  # full overlap -> contaminated
                    "alpha beta gamma zz yy xx ww vv",  # 1/6 shingles -> clean
                    "totally different words here now",  # 0 overlap -> clean
                    "a b",  # <3 tokens: zero shingles -> clean by definition
                ]
            ),
        }
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, threshold_pct=50).take_all()
    }
    assert rows[1]["contaminated"] and rows[1]["n_hit"] == rows[1]["n_shingles"] == 2
    assert not rows[2]["contaminated"] and rows[2]["n_hit"] == 1
    assert not rows[3]["contaminated"] and rows[3]["n_hit"] == 0
    assert not rows[4]["contaminated"] and rows[4]["n_shingles"] == 0


def test_decontaminate_empty_benchmark(ray_session):
    from fs_schema_validator_ray.stages.decontaminate import decontaminate

    bench = _ds({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    corpus = _ds(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["some words here"])}
    )
    r = decontaminate(corpus, bench).take_all()[0]
    assert r["n_hit"] == 0 and not r["contaminated"]


def test_repetition_counts_exact():
    from fs_schema_validator_ray.stages.text import RepetitionStage

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # bigrams: (a b) x3, (b a) x2 -> n=5, top=3
                    # 5-grams: 'a b a b a','b a b a b' -> all distinct? no:
                    # tokens a b a b a b -> 5grams: ababa, babab -> distinct
                    "a b a b a b",
                    "x y z w v u",  # all bigrams distinct, top=1
                    None,  # null text -> zeros
                ]
            ),
        }
    )
    out = {r["doc_id"]: r for r in RepetitionStage()(batch).to_pylist()}
    assert out[1]["n_bigrams"] == 5 and out[1]["top_bigram_n"] == 3
    assert out[1]["n_5grams"] == 2 and out[1]["dup_5gram_n"] == 0
    assert out[2]["n_bigrams"] == 5 and out[2]["top_bigram_n"] == 1
    assert out[3]["n_bigrams"] == 0 and out[3]["n_5grams"] == 0


def test_repetition_duplicate_5grams():
    from fs_schema_validator_ray.stages.text import RepetitionStage

    # 'a b c d e' x3: 'a b c d e' occurs 3x AND every cross-boundary
    # 5-gram ('b c d e a', ...) occurs 2x -> all 11 occurrences duplicated
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["a b c d e a b c d e a b c d e"]),
        }
    )
    r = RepetitionStage()(batch).to_pylist()[0]
    assert r["n_5grams"] == 11
    assert r["dup_5gram_n"] == 11
    # an aperiodic doc: only the explicit repeat duplicates
    batch2 = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["p q r s t u v w x p q r s t zz"]),
        }
    )
    r2 = RepetitionStage()(batch2).to_pylist()[0]
    assert r2["n_5grams"] == 11
    assert r2["dup_5gram_n"] == 2  # 'p q r s t' twice, everything else once


def test_repetition_matches_duckdb(ray_session):
    import duckdb

    from fs_schema_validator_ray.stages.text import RepetitionStage

    rng = np.random.default_rng(11)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(50)]
    tbl = pa.table(
        {"doc_id": pa.array(range(50), pa.int64()), "text": pa.array(texts)}
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["top_bigram_n"], r["n_5grams"], r["dup_5gram_n"])
        for r in RepetitionStage()(tbl).to_pylist()
    }
    con = duckdb.connect()
    con.register("documents", tbl)
    import __ray_entry__

    want = {
        int(r[0]): tuple(int(x) for x in r[1:])
        for r in con.execute(__ray_entry__.oracle_sql()["repetition_documents"]).fetchall()
    }
    assert got == want
