"""Dataset mixing — deterministic per-source re-weighting of a
multi-source corpus to target proportions (the train-mix composer step
of a large-scale training-data pipeline: up-sample scarce high-quality
sources, down-sample bulk crawl).

No RNG and no shuffle: each row's fate is a pure function of its key,
``h = ((key * 48271) % 2147483647) % 10000`` (Lehmer multiplier; stays
far inside int64 so numpy and SQL agree bit-for-bit), and its source's
weight ``w``:

    copies(row) = floor(w) + (1 if h < frac(w) * 10000 else 0)

A weight of 0.37 keeps a deterministic 37% slice of that source; 2.5
emits every row twice plus a 50% slice a third time. Output carries a
``copy`` index (0-based) so repeats are distinguishable and the result
is hash-exact against a SQL oracle (UNION ALL copy layers).

Scale notes (10¹² rows): one stateless vectorized ``map_batches`` pass
— the weights map is a tiny closure constant, selection is a numpy
compare, repeats are one ``Table.take(np.repeat(...))`` per batch. No
driver materialization, no exchange; composes with any downstream
shuffle-free pipeline. Epoch re-mixing = change the multiplier salt."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_LEHMER = 48271
_MOD = 2147483647
_SCALE = 10_000


def _mix_hash(keys: np.ndarray) -> np.ndarray:
    return ((keys * _LEHMER) % _MOD) % _SCALE


def mix_sources(
    ds,
    weights: dict[str, float],
    key_column: str = "doc_id",
    source_column: str = "source",
    default_weight: float = 0.0,
):
    """Deterministically re-weight each source stratum of ``ds`` to its
    target ``weights[source]`` (missing sources get ``default_weight``).
    Output schema: ``(key_column, source_column, copy_ix:int32)``."""
    for s, w in weights.items():
        if w < 0 or not math.isfinite(w):
            raise ValueError(f"weight for {s!r} must be finite and >= 0")

    def apply(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(key_column), dtype=np.int64)
        srcs = batch.column(source_column).to_pylist()
        w = np.fromiter(
            (weights.get(s, default_weight) for s in srcs),
            dtype=np.float64,
            count=len(srcs),
        )
        full = np.floor(w).astype(np.int64)
        frac = np.round((w - full) * _SCALE).astype(np.int64)
        copies = full + (_mix_hash(keys) < frac).astype(np.int64)
        idx = np.repeat(np.arange(len(keys)), copies)
        ends = np.cumsum(copies)
        copy_ix = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - copies, copies
        )
        picked = batch.select([key_column, source_column]).take(pa.array(idx))
        return picked.append_column("copy_ix", pa.array(copy_ix.astype(np.int32)))

    return ds.select_columns([key_column, source_column]).map_batches(
        apply, batch_format="pyarrow"
    )
