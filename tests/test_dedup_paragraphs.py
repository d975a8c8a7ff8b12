"""Paragraph-window (C4/CCNet-style sub-document) dedup: brute-force
parity on planted corpora + edge cases (empty docs, short tails, window
boundaries, multi-block inputs)."""

import re

import pyarrow as pa
import pytest

from fs_schema_validator_ray.stages.dedup import dedup_paragraphs_keep_first


def brute_force(texts, window):
    """Serial reference: windows of `window` lower+alnum tokens, keep the
    first (doc_id, para_idx) per distinct window text."""
    seen = {}
    for doc_id, text in enumerate(texts):
        toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
        for k in range(0, len(toks), window):
            win = " ".join(toks[k : k + window])
            key = win
            if key not in seen:
                seen[key] = (doc_id, k // window, len(toks[k : k + window]))
    return sorted(seen.values())


def run_engine(texts, window, ray_session, blocks=1):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = dedup_paragraphs_keep_first(ds, "text", "doc_id", window=window).to_pandas()
    return sorted(
        (int(r.doc_id), int(r.para_idx), int(r.n_words)) for r in out.itertuples()
    )


BOILER = "subscribe to our newsletter for updates and exclusive offers today"


def corpus():
    return [
        # doc 0: unique + boilerplate window planted at a window boundary
        "alpha beta gamma delta epsilon zeta eta theta " + BOILER,
        # doc 1: same boilerplate later (must lose to doc 0)
        "one two three four five six seven eight " + BOILER + " tail words here now",
        # doc 2: exact duplicate of doc 0 (every window loses)
        "alpha beta gamma delta epsilon zeta eta theta " + BOILER,
        "",  # empty
        "short doc",  # sub-window tail only
        # punctuation/case: normalizes identically to doc 4's window
        "  SHORT, doc!!  ",
    ]


@pytest.mark.parametrize("window", [1, 3, 8])
def test_brute_force_parity(ray_session, window):
    texts = corpus()
    assert run_engine(texts, window, ray_session) == brute_force(texts, window)


def test_multi_block_invariance(ray_session):
    texts = corpus() * 5  # more duplicates across blocks
    expect = brute_force(texts, 4)
    assert run_engine(texts, 4, ray_session, blocks=1) == expect
    assert run_engine(texts, 4, ray_session, blocks=7) == expect


def test_first_occurrence_is_doc0(ray_session):
    texts = corpus()
    kept = run_engine(texts, 8, ray_session)
    # the boilerplate window: doc 0 window 1, never doc 1/2's copy
    boiler_rows = [r for r in kept if r[2] == 8 and r[0] in (0, 1, 2) and r[1] == 1]
    assert (0, 1, 8) in kept
    assert all(r[0] == 0 for r in boiler_rows)


def test_window_guard():
    with pytest.raises(ValueError):
        dedup_paragraphs_keep_first(None, window=0)


def test_id_overflow_guard(ray_session):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array([1 << 42], pa.int64()), "text": pa.array(["a b c"])}
    )
    with pytest.raises(Exception, match="combined"):
        dedup_paragraphs_keep_first(
            ray.data.from_arrow(tbl), "text", "doc_id", window=2
        ).to_pandas()
