"""Deterministic synthetic clips corpus with planted violations.

The columnar analogue of the reference's conformance fixture corpus
(`/root/reference/tests/fixtures/` — one good file per format plus
corrupted/truncated/mis-named variants, see FIXTURES.md): a clips table
(``clip_id, bytes, sr_hz, dur_ms, codec, transcript`` — BASELINE.json
``input_hint``) generated purely from a seed, with ~2% of rows planted
with violations at positions derivable from the row index, so golden
violation sets are exact.

Planted classes (reference analogues, FIXTURES.md §1):
truncated payload (corrupted.glb), codec mismatch (png-as-webp), empty
payload (empty file), out-of-range / null ``sr_hz``, zero / inconsistent
``dur_ms``, malformed ``clip_id``, invalid codec label, garbled
transcript, duplicate ``clip_id``, and rows missing from the transcript
manifest ("does not exist").

Generation is exposed both as a pure function (tests) and as a Ray Data
pipeline (``range(n) → map_batches(ClipBatchGenerator) → write_parquet``)
that scales the corpus without materializing it on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray import audio

#: bump when reference_signal / reference_transcript / planted classes
#: change — invalidates on-disk corpus caches keyed by this version
CORPUS_VERSION = 2

CLIPS_SCHEMA = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("sr_hz", pa.int32()),
        pa.field("dur_ms", pa.int32()),
        pa.field("codec", pa.string()),
        pa.field("transcript", pa.string()),
    ]
)

_SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
_SR_WEIGHTS = np.array([0.30, 0.40, 0.10, 0.10, 0.10])
# codec distribution is intentionally skewed (north_star: codec-skewed
# partitions exercise salting / actor-pool balance)
_CODEC_CHOICES = np.array(["pcm_s16le", "ulaw", "alaw", "pcm_u8"])
_CODEC_WEIGHTS = np.array([0.55, 0.20, 0.15, 0.10])

#: violation classes → residue of ``idx % plant_mod``. Residues are spaced
#: so no two classes ever hit the same or adjacent rows.
PLANTS = {
    "truncated_bytes": 17,
    "codec_mismatch": 59,
    "empty_bytes": 101,
    "sr_out_of_range": 149,
    "sr_null": 191,
    "dur_zero": 233,
    "dur_mismatch": 281,
    "bad_clip_id": 331,
    "codec_invalid": 373,
    "transcript_garbled": 419,
    "duplicate_clip_id": 461,
    "missing_in_manifest": 487,
}


@dataclass(frozen=True)
class ClipsConfig:
    n_rows: int = 1000
    rows_per_partition: int = 250
    seed: int = 42
    plant_mod: int = 509
    dur_lo_ms: int = 60
    dur_hi_ms: int = 240
    n_orphan_manifest_rows: int = 5

    def clip_id(self, idx: int) -> str:
        part, i = divmod(idx, self.rows_per_partition)
        return f"clip-{part:04d}-{i:06d}"

    def partition_of(self, idx: int) -> int:
        return idx // self.rows_per_partition

    def num_partitions(self) -> int:
        return (self.n_rows + self.rows_per_partition - 1) // self.rows_per_partition

    def plant_class(self, idx: int) -> Optional[str]:
        r = idx % self.plant_mod
        for name, residue in PLANTS.items():
            if r == residue:
                return name
        return None

    def planted_indices(self, cls: str) -> list[int]:
        residue = PLANTS[cls]
        first = residue if residue < self.n_rows else None
        if first is None:
            return []
        out = list(range(residue, self.n_rows, self.plant_mod))
        if cls == "duplicate_clip_id":
            out = [i for i in out if i > 0]
        return out


def _row_params(cfg: ClipsConfig, idx: int) -> tuple[int, int, str]:
    """Deterministic (sr_hz, dur_ms, codec) for a row, independent of any
    planted mutation."""
    rng = np.random.Generator(np.random.PCG64([cfg.seed, idx]))
    sr = int(_SR_CHOICES[rng.choice(len(_SR_CHOICES), p=_SR_WEIGHTS)])
    dur = int(rng.integers(cfg.dur_lo_ms, cfg.dur_hi_ms + 1))
    codec = str(_CODEC_CHOICES[rng.choice(len(_CODEC_CHOICES), p=_CODEC_WEIGHTS)])
    return sr, dur, codec


def _clean_row(cfg: ClipsConfig, idx: int) -> dict:
    clip_id = cfg.clip_id(idx)
    sr, dur, codec = _row_params(cfg, idx)
    signal = audio.reference_signal(clip_id, sr, dur)
    return {
        "clip_id": clip_id,
        "bytes": audio.encode(signal, sr, codec),
        "sr_hz": sr,
        "dur_ms": dur,
        "codec": codec,
        "transcript": audio.reference_transcript(clip_id),
    }


def generate_row(cfg: ClipsConfig, idx: int) -> dict:
    cls = cfg.plant_class(idx)
    if cls == "duplicate_clip_id" and idx > 0:
        # exact copy of the previous row → key uniqueness violation only
        return _clean_row(cfg, idx - 1)

    row = _clean_row(cfg, idx)
    if cls is None or cls in ("missing_in_manifest", "duplicate_clip_id"):
        return row

    clip_id = row["clip_id"]
    sr, dur, codec = row["sr_hz"], row["dur_ms"], row["codec"]
    if cls == "truncated_bytes":
        row["bytes"] = row["bytes"][:37]
    elif cls == "codec_mismatch":
        actual = str(_CODEC_CHOICES[(int(np.argmax(_CODEC_CHOICES == codec)) + 1) % 4])
        row["bytes"] = audio.encode(audio.reference_signal(clip_id, sr, dur), sr, actual)
    elif cls == "empty_bytes":
        row["bytes"] = b""
    elif cls == "sr_out_of_range":
        row["sr_hz"] = 3000
        row["bytes"] = audio.encode(audio.reference_signal(clip_id, 3000, dur), 3000, codec)
    elif cls == "sr_null":
        row["sr_hz"] = None
    elif cls == "dur_zero":
        row["dur_ms"] = 0
        row["bytes"] = audio.encode(np.zeros(0), sr, codec)
    elif cls == "dur_mismatch":
        longer = audio.reference_signal(clip_id, sr, dur + 80)
        row["bytes"] = audio.encode(longer, sr, codec)
    elif cls == "bad_clip_id":
        # regenerate content from the malformed id so only the key-format
        # rule fires (payload & transcript stay self-consistent)
        bad_id = f"CLIP_{idx}"
        row["clip_id"] = bad_id
        row["bytes"] = audio.encode(audio.reference_signal(bad_id, sr, dur), sr, codec)
        row["transcript"] = audio.reference_transcript(bad_id)
    elif cls == "codec_invalid":
        row["codec"] = "mp3"
    elif cls == "transcript_garbled":
        row["transcript"] = "@@@ " + row["transcript"][::-1]
    return row


def build_clips_table(cfg: ClipsConfig, indices: np.ndarray) -> pa.Table:
    """Generate the clip rows for ``indices`` as one Arrow table, with the
    checkpoint ``partition_id`` column attached."""
    rows = [generate_row(cfg, int(i)) for i in indices]
    table = pa.Table.from_pylist(rows, schema=CLIPS_SCHEMA)
    parts = pa.array((np.asarray(indices) // cfg.rows_per_partition).astype(np.int32))
    return table.append_column("partition_id", parts)


class ClipBatchGenerator:
    """``map_batches`` callable over ``ray.data.range(n)`` batches: turns the
    ``id`` column into generated clip rows. Plain function semantics — the
    config is tiny and immutable, no actor state needed."""

    def __init__(self, cfg: ClipsConfig) -> None:
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return build_clips_table(self.cfg, np.asarray(batch.column("id")))


def generate_clips_dataset(cfg: ClipsConfig, override_num_blocks: Optional[int] = None):
    """Distributed corpus generation: ``range(n) → map_batches``. Lazy —
    attach ``.write_parquet(out)`` or feed it straight into the validation
    pipeline."""
    import ray.data

    n_blocks = override_num_blocks or max(1, cfg.num_partitions())
    ds = ray.data.range(cfg.n_rows, override_num_blocks=n_blocks)
    return ds.map_batches(
        ClipBatchGenerator(cfg), batch_format="pyarrow", batch_size=4096
    )


def build_manifest_table(cfg: ClipsConfig) -> pa.Table:
    """Transcript manifest (small side of the referential check,
    FIXTURES.md §2): covers every clip id except the
    ``missing_in_manifest`` plants, plus a few orphan rows that exist only
    in the manifest."""
    missing = set(cfg.planted_indices("missing_in_manifest"))
    ids = [cfg.clip_id(i) for i in range(cfg.n_rows) if i not in missing]
    ids.extend(f"orphan-{k:06d}" for k in range(cfg.n_orphan_manifest_rows))
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "transcript": pa.array(
                [audio.reference_transcript(cid) for cid in ids], pa.string()
            ),
        }
    )
