"""Content-defined chunking: boundary invariants, insertion-shift
resistance, content-addressed hashing, corpus dedup stats, and the
clips-corpus query (planted duplicate payloads must share chunks)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fs_schema_validator_ray.stages.cdc import (
    CdcChunkStage,
    _chunk_payload,
    cdc_chunks,
    cdc_dedup_stats,
)

KW = dict(window=48, min_size=256, avg_size=1024, max_size=4096)


def _payload(n, seed):
    return np.random.default_rng(seed).integers(0, 256, n, np.uint8)


def test_boundaries_cover_payload_within_limits():
    data = _payload(60_000, 1)
    ends, hashes = _chunk_payload(data, **KW)
    lens = np.diff(np.concatenate([[0], ends]))
    assert ends[-1] == len(data)
    assert np.all(np.diff(ends) > 0)
    assert lens.max() <= KW["max_size"]
    # every chunk except possibly the final remainder honors min_size
    assert np.all(lens[:-1] >= KW["min_size"])
    assert len(hashes) == len(ends)
    # expected size ≈ avg_size (loose 2x band)
    assert KW["avg_size"] / 2 < lens.mean() < KW["avg_size"] * 2


def test_insertion_shift_resistance():
    data = _payload(50_000, 2)
    base_ends, base_h = _chunk_payload(data, **KW)
    ins = np.concatenate([data[:100], _payload(9, 3), data[100:]])
    _, h2 = _chunk_payload(ins, **KW)
    shared = len(set(base_h.tolist()) & set(h2.tolist()))
    # only the chunks overlapping the insertion point may change
    assert shared >= len(base_h) - 3


def test_content_addressed_hashes():
    a = _payload(30_000, 4)
    e1, h1 = _chunk_payload(a, **KW)
    e2, h2 = _chunk_payload(a.copy(), **KW)
    assert np.array_equal(e1, e2) and np.array_equal(h1, h2)
    # different content -> disjoint hashes (w.h.p.)
    _, h3 = _chunk_payload(_payload(30_000, 5), **KW)
    assert not (set(h1.tolist()) & set(h3.tolist()))


def test_empty_and_tiny_payloads():
    ends, hashes = _chunk_payload(np.zeros(0, np.uint8), **KW)
    assert len(ends) == 0 and len(hashes) == 0
    ends, hashes = _chunk_payload(np.arange(10, dtype=np.uint8), **KW)
    assert ends.tolist() == [10] and len(hashes) == 1
    stage = CdcChunkStage()
    out = stage(pa.table({"clip_id": ["x"], "bytes": pa.array([b""], pa.binary())}))
    assert out.num_rows == 0


def test_stage_param_validation():
    with pytest.raises(ValueError, match="min_size"):
        CdcChunkStage(min_size=10, window=48)


def test_dedup_stats_find_shared_segment():
    shared = _payload(20_000, 6)
    a = np.concatenate([_payload(5_000, 7), shared, _payload(5_000, 8)])
    b = np.concatenate([_payload(3_000, 9), shared, _payload(7_000, 10)])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "clip_id": ["a", "b"],
                "bytes": pa.array([a.tobytes(), b.tobytes()], pa.binary()),
            }
        )
    )
    stats = [
        r
        for blk in cdc_dedup_stats(ds).iter_batches(batch_format="pyarrow")
        for r in blk.to_pylist()
    ]
    dup_bytes = sum(
        r["logical_bytes"] // r["copies"] for r in stats if r["copies"] > 1
    )
    # the interior of the shared 20k segment must dedup
    assert dup_bytes > 10_000
    total_logical = sum(r["logical_bytes"] for r in stats)
    assert total_logical == len(a) + len(b)


def test_chunks_rows_match_stage():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "clip_id": ["p"],
                "bytes": pa.array([_payload(15_000, 11).tobytes()], pa.binary()),
            }
        )
    )
    rows = [
        r
        for b in cdc_chunks(ds).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    assert sum(r["length"] for r in rows) == 15_000
    assert [r["chunk_ix"] for r in sorted(rows, key=lambda r: r["offset"])] == list(
        range(len(rows))
    )


def test_query_planted_duplicates_share_all_chunks():
    from fs_schema_validator_ray.pipelines.queries import QUERIES

    stats = [
        r
        for b in QUERIES["cdc_dedup_clips"]("/root/testdata/sf0.001").iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    ]
    assert stats, "corpus produced no chunks"
    # the clips corpus plants full-payload duplicate copies: some chunk
    # hashes must have copies > 1
    assert any(r["copies"] > 1 for r in stats)
