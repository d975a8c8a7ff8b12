"""Benchmark decontamination: flag training documents whose word n-gram
shingles overlap an evaluation/benchmark corpus.

The standard pretraining hygiene pass (per the Gopher / GPT-3 appendix
recipes described in PAPERS.md): build the DISTINCT shingle set of the
benchmark side (small by definition — eval sets are orders of magnitude
smaller than the training corpus), broadcast it once via ``ray.put``, and
stream the training corpus through a stateless ``map_batches`` that counts
per-document shingle hits with one ``searchsorted`` against the sorted
broadcast array. No shuffle touches the big side; the only exchange is the
KB..MB-sized benchmark hash set resolved once per worker.

Scale notes:
* benchmark set is bounded by ``max_entries`` (fail loudly, don't OOM);
* shingles are 64-bit hashes (not strings) — 8 B/entry broadcast payload;
* tokenization matches the SQL-replicable contract of
  ``dedup._distinct_shingle_hashes`` (lowercase, split ``[^a-z0-9]+``),
  so the whole operator is oracle-exact modulo 64-bit hash collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.stages.dedup import _distinct_shingle_hashes


def benchmark_shingle_set(
    ds,
    text_column: str = "text",
    shingle_n: int = 3,
    max_entries: int = 50_000_000,
) -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of the benchmark corpus.

    Streams per-batch distinct partials to the driver (each partial is
    already deduplicated, so driver traffic is bounded by the TRUE
    distinct count, not the corpus size) and fails if the set exceeds
    ``max_entries`` — the broadcast pattern requires a small side."""

    def partial(batch: pa.Table) -> pa.Table:
        sh, _ = _distinct_shingle_hashes(
            batch.column(text_column).combine_chunks(), shingle_n
        )
        return pa.table({"h": pa.array(np.unique(sh).view(np.int64))})

    parts: list[np.ndarray] = []
    total = 0
    out = ds.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow"
    )
    for b in out.iter_batches(batch_format="pyarrow"):
        arr = np.asarray(b.column("h"), dtype=np.int64).view(np.uint64)
        parts.append(arr)
        total += len(arr)
        if total > max_entries * 2:  # pre-dedup guard against gross overflow
            raise ValueError(
                f"benchmark shingle partials exceed 2x max_entries="
                f"{max_entries}; the benchmark side must be small enough "
                "to broadcast"
            )
    if not parts:
        return np.empty(0, np.uint64)
    merged = np.unique(np.concatenate(parts))
    if len(merged) > max_entries:
        raise ValueError(
            f"benchmark shingle set has {len(merged)} entries "
            f"(> max_entries={max_entries})"
        )
    return merged


class DecontaminateStage:
    """Count per-document shingle hits against the broadcast benchmark set.

    Emits ``(id, n_shingles, n_hit, contaminated)`` where ``contaminated``
    is the integer predicate ``n_hit * 100 >= n_shingles * threshold_pct``
    (and ``n_shingles > 0``) — no float thresholds, so the flag is
    hash-exact against a SQL oracle."""

    def __init__(
        self,
        bench_ref,
        shingle_n: int = 3,
        threshold_pct: int = 50,
        text_column: str = "text",
        id_column: str = "doc_id",
    ) -> None:
        self.bench_ref = bench_ref
        self.shingle_n = shingle_n
        self.threshold_pct = threshold_pct
        self.text_column = text_column
        self.id_column = id_column
        self._bench: np.ndarray | None = None

    def _resolve(self) -> np.ndarray:
        if self._bench is None:
            import ray

            obj = self.bench_ref
            self._bench = ray.get(obj) if hasattr(obj, "hex") else obj
        return self._bench

    def __call__(self, batch: pa.Table) -> pa.Table:
        bench = self._resolve()
        n_rows = batch.num_rows
        sh, offsets = _distinct_shingle_hashes(
            batch.column(self.text_column).combine_chunks(), self.shingle_n
        )
        n_sh = np.diff(offsets).astype(np.int64)
        if len(bench) and len(sh):
            idx = np.searchsorted(bench, sh)
            hit = bench[np.minimum(idx, len(bench) - 1)] == sh
        else:
            hit = np.zeros(len(sh), dtype=bool)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_sh)
        n_hit = np.bincount(rows[hit], minlength=n_rows).astype(np.int64)
        contaminated = (n_sh > 0) & (n_hit * 100 >= n_sh * self.threshold_pct)
        return pa.table(
            {
                self.id_column: batch.column(self.id_column),
                "n_shingles": pa.array(n_sh),
                "n_hit": pa.array(n_hit),
                "contaminated": pa.array(contaminated),
            }
        )


def decontaminate(
    corpus_ds,
    benchmark_ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_n: int = 3,
    threshold_pct: int = 50,
):
    """Flag every corpus document whose distinct-shingle overlap with the
    benchmark corpus reaches ``threshold_pct`` percent."""
    import ray

    bench = benchmark_shingle_set(
        benchmark_ds, text_column=text_column, shingle_n=shingle_n
    )
    ref = ray.put(bench)
    return corpus_ds.map_batches(
        DecontaminateStage(
            ref,
            shingle_n=shingle_n,
            threshold_pct=threshold_pct,
            text_column=text_column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
    )
