"""Multinomial Naive Bayes classifier: serial brute-force parity,
broadcast ↔ co-partitioned path parity (forced switch), edge cases."""

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pytest

from fs_schema_validator_ray.stages.classify import (
    nb_classify,
    nb_classify_copartitioned,
    nb_token_label_counts,
)


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def brute_force(texts, labels):
    """Serial NB reference: Laplace-smoothed multinomial, round-6 before
    argmax, tie → min label; zero-token docs emit nothing."""
    cnt = defaultdict(Counter)
    for text, lab in zip(texts, labels):
        cnt[lab].update(_toks(text))
    vocab = {t for c in cnt.values() for t in c}
    v = len(vocab)
    labs = sorted(set(labels))
    prior = {l: math.log(labels.count(l) / len(labels)) for l in labs}
    tot = {l: sum(cnt[l].values()) for l in labs}
    out = {}
    for doc_id, text in enumerate(texts):
        toks = _toks(text)
        if not toks:
            continue
        best = None
        for l in labs:
            s = prior[l] + sum(
                math.log((cnt[l].get(t, 0) + 1.0) / (tot[l] + v)) for t in toks
            )
            s = round(s, 6)
            if best is None or s > best[1]:
                best = (l, s)
        out[doc_id] = best
    return out


def _mk_ds(texts, labels, blocks=3):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(labels),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


TEXTS = [
    "the cat sat on the mat",
    "dogs bark loudly at cats",
    "stock market rallies today",
    "market prices fall on bad news",
    "cat and dog play in the park",
    "earnings beat market estimates again",
    "",
    "the the the market",
    "   ",
    "cat market",  # genuinely ambiguous: one token from each side
]
LABELS = ["pets", "pets", "finance", "finance", "pets", "finance",
          "pets", "finance", "finance", "pets"]


def test_brute_force_parity(ray_session):
    ds = _mk_ds(TEXTS, LABELS)
    got = {
        int(r.doc_id): (r.pred, float(r.score))
        for r in nb_classify(ds, "text", "source").to_pandas().itertuples()
    }
    want = brute_force(TEXTS, LABELS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert abs(got[d][1] - want[d][1]) < 2e-6


def test_counts_match_brute_force(ray_session):
    ds = _mk_ds(TEXTS, LABELS)
    got = Counter()
    for r in nb_token_label_counts(ds, "text", "source").to_pandas().itertuples():
        got[(r.source, r.token)] = int(r.cnt)
    want = Counter()
    for text, lab in zip(TEXTS, LABELS):
        for t in _toks(text):
            want[(lab, t)] += 1
    assert got == want


def test_copartitioned_parity_forced(ray_session):
    """Force the no-broadcast path and require identical verdicts."""
    ds = _mk_ds(TEXTS, LABELS, blocks=5)
    bc = (
        nb_classify(ds, "text", "source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cp = (
        nb_classify_copartitioned(ds, None, None, "text", "source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(bc["doc_id"]) == list(cp["doc_id"])
    assert list(bc["pred"]) == list(cp["pred"])
    assert np.allclose(bc["score"], cp["score"], atol=2e-6)


def test_auto_switch_threshold(ray_session):
    """max_broadcast_entries below the count-table size must route to
    the co-partitioned plan (same results either way)."""
    ds = _mk_ds(TEXTS, LABELS)
    out = (
        nb_classify(ds, "text", "source", max_broadcast_entries=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = brute_force(TEXTS, LABELS)
    assert {int(r.doc_id): r.pred for r in out.itertuples()} == {
        d: p for d, (p, _) in want.items()
    }


def test_single_label_and_unseen_blocks(ray_session):
    """One label: every non-empty doc predicts it with prior ln(1)=0."""
    texts = ["alpha beta", "beta gamma", ""]
    ds = _mk_ds(texts, ["only", "only", "only"], blocks=2)
    out = nb_classify(ds, "text", "source").to_pandas()
    assert set(out["pred"]) == {"only"}
    assert len(out) == 2
