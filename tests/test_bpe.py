"""BPE tokenizer training/encoding: parity against an independently
written serial reference, forced driver↔distributed path switch, known
hand-checked merges, and the n_merges=0 ⇒ character-count identity."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fs_schema_validator_ray.stages.bpe import (
    BpeEncodeStage,
    _encode_word,
    bpe_encode,
    bpe_train,
)


def _reference_bpe(texts, n_merges):
    """Independent serial reference: different data structures (Counter,
    regex tokenizer inline, tuple words) than stages/bpe.py — a real
    cross-check, not a copy."""
    import re

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if w:
                words[w] += 1
    seqs = {w: tuple(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, cnt in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the lowest of the low, the widest of the wide",
]


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_train_matches_independent_reference():
    got = bpe_train(_ds(TEXTS), "text", n_merges=20, pin=True)
    want = _reference_bpe(TEXTS, 20)
    assert list(zip(got["left"].to_pylist(), got["right"].to_pylist())) == want


def test_forced_path_switch_parity():
    a = bpe_train(_ds(TEXTS), "text", n_merges=12, pin=True)
    b = bpe_train(_ds(TEXTS), "text", n_merges=12, pin=False)
    assert a.equals(b)


def test_train_corpus_parity_and_determinism():
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    a = bpe_train(ds, "text", n_merges=16, pin=True)
    texts = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    want = _reference_bpe(texts, 16)
    assert list(zip(a["left"].to_pylist(), a["right"].to_pylist())) == want
    # auto switch picks the driver path for this size and agrees
    assert bpe_train(ds, "text", n_merges=16).equals(a)


def test_known_merges_hand_checked():
    # "aaab" x3: pairs aa(6) ab(3) → merge (a,a); then (aa,a) 3 vs (a,b)3
    # → tie-break lexicographic left: ("a","b") < ("aa","a")
    got = bpe_train(_ds(["aaab aaab aaab"]), "text", n_merges=2, pin=True)
    assert list(zip(got["left"].to_pylist(), got["right"].to_pylist())) == [
        ("a", "a"),
        ("a", "b"),
    ]


def test_encode_word_rank_order():
    ranks = {("a", "a"): 0, ("a", "b"): 1}
    assert _encode_word("aaab", ranks) == ["aa", "ab"]
    assert _encode_word("xyz", ranks) == ["x", "y", "z"]


def test_encode_zero_merges_is_char_count():
    ds = _ds(TEXTS)
    merges = pa.table(
        {
            "rank": pa.array([], pa.int32()),
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "merged": pa.array([], pa.string()),
        }
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for b in bpe_encode(ds, merges).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    import re

    for i, t in enumerate(TEXTS):
        want = sum(len(w) for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
        assert got[i] == want


def test_encode_counts_match_serial():
    ds = _ds(TEXTS)
    merges = bpe_train(ds, "text", n_merges=10, pin=True)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges["left"].to_pylist(), merges["right"].to_pylist())
        )
    }
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for b in bpe_encode(ds, merges).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    import re

    for i, t in enumerate(TEXTS):
        want = sum(
            len(_encode_word(w, ranks))
            for w in re.split(r"[^a-z0-9]+", t.lower())
            if w
        )
        assert got[i] == want


def test_min_count_prunes_tail_words():
    texts = ["zq zq", "common common common common"]
    a = bpe_train(_ds(texts), "text", n_merges=3, min_count=3, pin=True)
    # only "common" survives the frequency floor: no (z, q) merge
    assert ("z", "q") not in set(
        zip(a["left"].to_pylist(), a["right"].to_pylist())
    )


def test_queries_registered():
    from fs_schema_validator_ray.pipelines.queries import QUERIES

    out = QUERIES["bpe_merges_documents"]("/root/testdata/sf0.001")
    rows = out.take_all()
    assert len(rows) == 48 and rows[0]["rank"] == 0
    enc = QUERIES["bpe_token_counts_documents"]("/root/testdata/sf0.001")
    n = enc.count()
    assert n == 500
