"""Unpivot/melt, hopping windows, inverted index / TF-IDF, and the audio
gain-normalize stage."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


# --- unpivot ---------------------------------------------------------------


def test_unpivot_basic(ray_session):
    from fs_schema_validator_ray.stages.reshape import unpivot

    ds = _ds(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([1.5, 2.5], pa.float64()),
            "b": pa.array([10, 20], pa.int64()),
        }
    )
    out = sorted(
        (r["id"], r["variable"], r["value"])
        for r in unpivot(ds, ["id"], ["a", "b"]).take_all()
    )
    assert out == [(1, "a", 1.5), (1, "b", 10.0), (2, "a", 2.5), (2, "b", 20.0)]


def test_unpivot_keeps_nulls_and_schema(ray_session):
    from fs_schema_validator_ray.stages.reshape import unpivot

    ds = _ds({"id": pa.array([7], pa.int64()), "a": pa.array([None], pa.float64())})
    res = unpivot(ds, ["id"], ["a"], var_name="m", value_name="v")
    rows = res.take_all()
    assert rows == [{"id": 7, "m": "a", "v": None}]


def test_unpivot_name_collision_rejected(ray_session):
    from fs_schema_validator_ray.stages.reshape import unpivot

    ds = _ds({"id": pa.array([1], pa.int64()), "a": pa.array([1.0])})
    with pytest.raises(ValueError):
        unpivot(ds, ["id"], ["a"], var_name="id")
    with pytest.raises(ValueError):
        unpivot(ds, ["id"], [])


# --- hopping window ----------------------------------------------------------


def test_hopping_window_membership(ray_session):
    from fs_schema_validator_ray.stages.agg import hopping_window

    # size 40, hop 10 → each ts lands in exactly 4 windows [w, w+40)
    ds = _ds({"ts": pa.array([25], pa.int64()), "x": pa.array(["p"])})
    out = hopping_window(ds, "ts", size_us=40, hop_us=10).take_all()
    starts = sorted(r["window_start_us"] for r in out)
    assert starts == [-10, 0, 10, 20]
    for w in starts:
        assert w <= 25 < w + 40
    assert all(r["x"] == "p" for r in out)


def test_hopping_window_timestamp_column(ray_session):
    from fs_schema_validator_ray.stages.agg import hopping_window

    ts = pa.array([np.datetime64("2024-01-01T00:20:00", "us")], pa.timestamp("us"))
    ds = _ds({"ts": ts})
    out = hopping_window(
        ds, "ts", size_us=3_600_000_000, hop_us=900_000_000
    ).take_all()
    assert len(out) == 4
    epoch = int(np.datetime64("2024-01-01T00:20:00", "us").astype(np.int64))
    base = epoch // 900_000_000 * 900_000_000
    assert sorted(r["window_start_us"] for r in out) == [
        base - 3 * 900_000_000, base - 2 * 900_000_000, base - 900_000_000, base
    ]


def test_hopping_window_requires_divisible(ray_session):
    from fs_schema_validator_ray.stages.agg import hopping_window

    ds = _ds({"ts": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        hopping_window(ds, "ts", size_us=100, hop_us=33)


# --- inverted index ----------------------------------------------------------


def test_inverted_index_postings_sorted_distinct(ray_session):
    from fs_schema_validator_ray.stages.textindex import inverted_index

    ds = _ds(
        {
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            # doc 3 repeats "apple" — distinct per doc; "Banana!" lowercases/splits
            "text": pa.array(["apple apple pie", "Banana! apple", None]),
        }
    )
    out = {r["token"]: (r["df"], r["postings"]) for r in inverted_index(ds).take_all()}
    assert out == {
        "apple": (2, "1,3"),
        "pie": (1, "3"),
        "banana": (1, "1"),
    }


def test_inverted_index_df_bounds(ray_session):
    from fs_schema_validator_ray.stages.textindex import inverted_index

    ds = _ds(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["the cat", "the dog", "the cat dog fox"]),
        }
    )
    out = {r["token"] for r in inverted_index(ds, min_df=2).take_all()}
    assert out == {"the", "cat", "dog"}
    out = {r["token"] for r in inverted_index(ds, min_df=2, max_df=2).take_all()}
    assert out == {"cat", "dog"}


def test_token_document_frequencies(ray_session):
    from fs_schema_validator_ray.stages.textindex import token_document_frequencies

    ds = _ds(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a", "b c"]),
        }
    )
    out = {r["token"]: r["df"] for r in token_document_frequencies(ds).take_all()}
    assert out == {"a": 1, "b": 2, "c": 1}


# --- tf-idf ------------------------------------------------------------------


def test_tfidf_top_terms_scores_and_ties(ray_session):
    from fs_schema_validator_ray.stages.textindex import tfidf_top_terms

    ds = _ds(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["rare rare common", "common zzz"]),
        }
    )
    rows = sorted(
        (r["doc_id"], r["rank"], r["token"], r["tf"], r["df"], r["score"])
        for r in tfidf_top_terms(ds, k=2).take_all()
    )
    # doc 1: rare tf=2 df=1 score=4; common tf=1 df=2 score=1
    # doc 2: zzz tf=1 df=1 score=2; common tf=1 df=2 score=1
    assert rows == [
        (1, 1, "rare", 2, 1, 4.0),
        (1, 2, "common", 1, 2, 1.0),
        (2, 1, "zzz", 1, 1, 2.0),
        (2, 2, "common", 1, 2, 1.0),
    ]


def test_tfidf_tie_breaks_token_ascending(ray_session):
    from fs_schema_validator_ray.stages.textindex import tfidf_top_terms

    ds = _ds({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["beta alfa"])})
    rows = sorted((r["rank"], r["token"]) for r in tfidf_top_terms(ds, k=2).take_all())
    assert rows == [(1, "alfa"), (2, "beta")]


def test_tfidf_empty_doc_emits_nothing(ray_session):
    from fs_schema_validator_ray.stages.textindex import tfidf_top_terms

    ds = _ds({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", "x"])})
    rows = tfidf_top_terms(ds, k=3).take_all()
    assert [(r["doc_id"], r["token"]) for r in rows] == [(2, "x")]


# --- review regressions --------------------------------------------------


def test_hopping_window_null_ts_yields_null_windows(ray_session):
    # a null timestamp must group under a NULL window key (epoch_us(NULL)
    # in SQL), never round-trip through float64 into garbage int64 keys
    from fs_schema_validator_ray.stages.agg import hopping_window

    ds = _ds({"ts": pa.array([100, None], pa.int64())})
    out = hopping_window(ds, "ts", size_us=40, hop_us=10).take_all()
    real = sorted(r["window_start_us"] for r in out if r["ts"] == 100)
    nulls = [r["window_start_us"] for r in out if r["ts"] is None]
    assert real == [70, 80, 90, 100]
    assert nulls == [None, None, None, None]


def test_unpivot_var_equals_value_rejected(ray_session):
    from fs_schema_validator_ray.stages.reshape import unpivot

    ds = _ds({"id": pa.array([1], pa.int64()), "a": pa.array([1.0])})
    with pytest.raises(ValueError):
        unpivot(ds, ["id"], ["a"], var_name="v", value_name="v")
    with pytest.raises(ValueError):
        unpivot(ds, ["id", "a"], ["a"])


def test_tfidf_stage_vocab_miss_policies(ray_session):
    import ray

    from fs_schema_validator_ray.stages.textindex import TfidfTopTermsStage

    vocab = np.array(["kept"], dtype=object)
    dfs = np.array([1], np.int64)
    ref = ray.put((vocab, dfs))
    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["kept pruned"])}
    )
    with pytest.raises(KeyError):
        TfidfTopTermsStage(ref, n_docs=2, k=3)(batch)
    out = TfidfTopTermsStage(ref, n_docs=2, k=3, on_missing="drop")(batch)
    assert out.column("token").to_pylist() == ["kept"]


def test_inverted_index_large_offsets_type(ray_session):
    # postings built through int64/LargeList offsets (int32 would wrap
    # past 2^31 flat postings per bucket); output stays plain string
    from fs_schema_validator_ray.stages.textindex import inverted_index

    ds = _ds({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b"])})
    res = inverted_index(ds)
    assert res.schema().base_schema.field("postings").type == pa.string()


# --- audio gain normalize ----------------------------------------------------


def _wav(samples, sr=16000):
    from fs_schema_validator_ray import audio

    return audio.encode(np.asarray(samples, np.float64), sr, "pcm_s16le")


def test_gain_normalize_reaches_target(ray_session):
    from fs_schema_validator_ray import audio
    from fs_schema_validator_ray.stages.audio_features import GainNormalizeStage

    t = np.sin(np.linspace(0, 40 * np.pi, 4000)) * 0.01  # very quiet sine
    batch = pa.table({"clip_id": pa.array(["c1"]), "bytes": pa.array([_wav(t)], pa.binary())})
    out = GainNormalizeStage(target_dbfs=-20.0)(batch)
    row = out.to_pylist()[0]
    assert row["decode_ok"] and not row["limited"]
    assert abs(row["rms_db_out"] - (-20.0)) < 0.1  # int16 quantization slack
    x, sr, _ = audio.decode(row["bytes"])
    assert sr == 16000 and len(x) == 4000


def test_gain_normalize_limiter_engages(ray_session):
    from fs_schema_validator_ray.stages.audio_features import GainNormalizeStage

    # near-full-scale peak: reaching -6 dBFS RMS would clip → limiter caps gain
    t = np.zeros(2000)
    t[::100] = 0.95  # spiky: high peak, low RMS
    batch = pa.table({"clip_id": pa.array(["c1"]), "bytes": pa.array([_wav(t)], pa.binary())})
    row = GainNormalizeStage(target_dbfs=-6.0)(batch).to_pylist()[0]
    assert row["decode_ok"] and row["limited"]
    assert row["rms_db_out"] < -6.0


def test_gain_normalize_silence_passthrough(ray_session):
    from fs_schema_validator_ray.stages.audio_features import GainNormalizeStage

    batch = pa.table(
        {"clip_id": pa.array(["s"]), "bytes": pa.array([_wav(np.zeros(100))], pa.binary())}
    )
    row = GainNormalizeStage()(batch).to_pylist()[0]
    assert row["decode_ok"] and row["gain_db"] == 0.0 and row["rms_db_in"] == -120.0


def test_gain_normalize_undecodable(ray_session):
    from fs_schema_validator_ray.stages.audio_features import GainNormalizeStage

    batch = pa.table(
        {"clip_id": pa.array(["bad"]), "bytes": pa.array([b"notawav"], pa.binary())}
    )
    row = GainNormalizeStage()(batch).to_pylist()[0]
    assert row["decode_ok"] is False and row["bytes"] is None


# --- BM25 --------------------------------------------------------------------


def test_corpus_query_stats_integers(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.textindex import corpus_query_stats

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["cat dog cat", "dog bird", None]  # null -> 0 tokens
                ),
            }
        )
    )
    n_docs, total, dfs = corpus_query_stats(ds, ["cat", "dog", "zz"])
    assert n_docs == 3 and total == 5
    assert dfs == {"cat": 1, "dog": 2, "zz": 0}


def test_bm25_contributions_rank_known_corpus(ray_session):
    import math

    import ray.data

    from fs_schema_validator_ray.stages.textindex import bm25_contributions

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "spark spark spark filler filler",
                        "spark filler filler filler filler",
                        "filler filler filler filler filler",
                    ]
                ),
            }
        )
    )
    rows = bm25_contributions(ds, ["spark"]).take_all()
    by_doc = {r["doc_id"]: r for r in rows}
    assert set(by_doc) == {1, 2}  # doc 3 has no match -> no row
    assert by_doc[1]["tf"] == 3 and by_doc[2]["tf"] == 1
    assert by_doc[1]["df"] == 2 and by_doc[1]["dl"] == 5
    # higher tf at equal dl -> strictly higher contribution
    assert by_doc[1]["score6"] > by_doc[2]["score6"] > 0
    # spot-check the formula
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    norm = (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * 5 * 3 / 15))
    assert by_doc[1]["score6"] == pytest.approx(idf * norm, abs=1e-6)


def test_bm25_empty_query_and_no_matches(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.textindex import bm25_contributions

    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["plain words"])}
        )
    )
    out = bm25_contributions(ds, ["absent"]).take_all()
    assert out == []


# --- standardize_columns -----------------------------------------------------


def test_standardize_matches_numpy_and_handles_nulls(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.reshape import standardize_columns

    x = np.array([1.0, 2.0, 3.0, 4.0, np.nan, 10.0])
    arr = pa.array([None if np.isnan(v) else v for v in x], pa.float64())
    t = pa.table(
        {
            "rid": pa.array(np.arange(6), pa.int64()),
            "x": arr,
            "const": pa.array([5.0] * 6, pa.float64()),
        }
    )
    out = (
        standardize_columns(
            ray.data.from_arrow(t).repartition(3), ["x", "const"], ["rid"]
        )
        .to_pandas()
        .set_index("rid")
    )
    v = x[~np.isnan(x)]
    mean, std = v.mean(), v.std(ddof=1)
    for rid in (0, 1, 2, 3, 5):
        assert out.loc[rid, "z_x"] == pytest.approx((x[rid] - mean) / std, rel=1e-12)
    assert np.isnan(out.loc[4, "z_x"])          # null in → null out
    assert out["z_const"].isna().all()          # constant column → null


def test_standardize_rejects_single_value(ray_session):
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.reshape import standardize_columns

    t = pa.table(
        {"rid": pa.array([0, 1], pa.int64()), "x": pa.array([1.0, None], pa.float64())}
    )
    with pytest.raises(ValueError):
        standardize_columns(ray.data.from_arrow(t), ["x"], ["rid"])


# --- unigram LM scoring ------------------------------------------------------


def test_unigram_logprob_ground_truth(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.textindex import unigram_logprob

    # corpus: 6 tokens total — "the"×3, "cat"×2, "sat"×1
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["the cat sat", "THE cat", "the", ""], pa.string()
            ),
        }
    )
    out = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob(
            ray.data.from_arrow(t).repartition(2), "text", "doc_id"
        ).take_all()
    }
    p = {"the": 3 / 6, "cat": 2 / 6, "sat": 1 / 6}
    assert out[1] == pytest.approx(
        (np.log(p["the"]) + np.log(p["cat"]) + np.log(p["sat"])) / 3
    )
    assert out[2] == pytest.approx((np.log(p["the"]) + np.log(p["cat"])) / 2)
    assert out[3] == pytest.approx(np.log(p["the"]))
    assert 4 not in out  # zero-token docs emit no row


def test_bigram_logprob_ground_truth(ray_session):
    """Hand-computed conditional bigram probabilities on a 3-doc corpus;
    a single-token doc emits no row (no bigram exists)."""
    import math

    import ray.data

    from fs_schema_validator_ray.stages.textindex import bigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b", "a b c", "solo"]),
        }
    )
    out = {
        r["doc_id"]: r["logprob"]
        for r in bigram_logprob(
            ray.data.from_arrow(t).repartition(2), "text", "doc_id"
        ).take_all()
    }
    # corpus bigrams: (a,b)x3 (b,a)x1 (b,c)x1 → ctx a=3, b=2
    p_ab, p_ba, p_bc = 3 / 3, 1 / 2, 1 / 2
    want1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1] == pytest.approx(want1, abs=1e-12)
    assert out[2] == pytest.approx(want2, abs=1e-12)
    assert 3 not in out  # single token → no bigram → no row


def test_unigram_copartitioned_parity(ray_session):
    """The at-scale co-partitioned scorer (no vocab broadcast) must match
    the broadcast path on the same corpus (float tolerance: sums may
    associate differently)."""
    import ray.data

    from fs_schema_validator_ray.stages.textindex import (
        unigram_logprob,
        unigram_logprob_copartitioned,
    )

    rng = np.random.default_rng(6)
    words = [f"w{i}" for i in range(40)]
    docs = [
        " ".join(words[j] for j in rng.integers(0, 40, rng.integers(1, 30)))
        for _ in range(120)
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(120, dtype=np.int64)), "text": pa.array(docs)}
    )
    ds = ray.data.from_arrow(t).repartition(6)

    broadcast = {
        r["doc_id"]: r["logprob"] for r in unigram_logprob(ds).take_all()
    }
    copart = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob_copartitioned(ds).take_all()
    }
    assert set(broadcast) == set(copart)
    for k in broadcast:
        assert copart[k] == pytest.approx(broadcast[k], abs=1e-10)

    # the auto-switch: a tiny max_broadcast_vocab forces the co-partition
    # path through the public entry point
    forced = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob(ds, max_broadcast_vocab=5).take_all()
    }
    for k in broadcast:
        assert forced[k] == pytest.approx(broadcast[k], abs=1e-10)


def test_pack_next_fit_greedy_spec(ray_session):
    """The greedy next-fit properties UNIQUELY determine the packing:
    (1) per-shard bins start at 0 and are non-decreasing in id order,
    (2) a bin's total never exceeds capacity unless it is a single
        oversize item,
    (3) the first item of every bin b>0 would have overflowed bin b-1,
    (4) fill is the running in-bin cumulative cost."""
    import pandas as pd
    import ray.data

    from fs_schema_validator_ray.stages.reshape import pack_next_fit

    rng = np.random.default_rng(11)
    n, cap = 3000, 1000
    ids = np.arange(n)
    cost = rng.integers(1, 700, n)
    cost[rng.choice(n, 5, replace=False)] = 1500  # oversize items
    ds = ray.data.from_pandas(pd.DataFrame({"id": ids, "cost": cost})).repartition(7)
    out = (
        pack_next_fit(ds, "id", "cost", capacity=cap, shard_size=256)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    assert (out["shard"].values == ids // 256).all()
    cost_by_id = dict(zip(ids, cost))
    for shard, g in out.groupby("shard"):
        g = g.sort_values("id")
        b = g["bin"].values
        assert b[0] == 0
        assert ((np.diff(b) == 0) | (np.diff(b) == 1)).all()
        fill = 0
        prev_bin = -1
        for _, row in g.iterrows():
            c = cost_by_id[row["id"]]
            if row["bin"] != prev_bin:
                assert prev_bin == -1 or fill + c > cap  # (3)
                fill = c
                prev_bin = row["bin"]
            else:
                fill += c
                assert fill <= cap or c > cap  # (2) via (4)
            assert row["fill"] == fill  # (4)


def test_tfidf_cosine_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.stages.textindex import tfidf_cosine_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        toks = rng.choice(vocab, size=rng.integers(5, 30)).tolist()
        docs.append(" ".join(toks))
    docs[10] = docs[3]  # planted exact duplicate → cosine 1.0
    t = pa.table(
        {"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(docs)}
    )
    min_df, max_df, thr = 2, 50, 0.5
    out = tfidf_cosine_pairs(
        ray.data.from_arrow(t), "text", "doc_id",
        min_df=min_df, max_df=max_df, threshold=thr, n_buckets=4,
    ).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["cos6"] for r in out}

    # brute force
    from collections import Counter

    n = len(docs)
    tfs = [Counter(d.split()) for d in docs]
    df = Counter()
    for c in tfs:
        for tok in c:
            df[tok] += 1
    keep = {tok for tok, d in df.items() if min_df <= d <= max_df}
    vecs = []
    for c in tfs:
        v = {tok: cnt * np.log(n / df[tok]) for tok, cnt in c.items() if tok in keep}
        nrm = np.sqrt(sum(x * x for x in v.values()))
        vecs.append({tok: x / nrm for tok, x in v.items()} if nrm > 0 else {})
    expected = {}
    for a in range(n):
        for b in range(a + 1, n):
            cos = sum(vecs[a].get(tok, 0.0) * w for tok, w in vecs[b].items())
            if cos >= thr:
                expected[(a, b)] = round(cos, 6)
    assert got.keys() == expected.keys()
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9
    assert got[(3, 10)] == 1.0  # the planted duplicate
