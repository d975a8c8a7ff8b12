#!/usr/bin/env python
"""End-to-end training-data curation demo over the synthetic clips corpus:

1. validate      — full rule suite (scalar + audio decode/SNR + unique +
                   referential), violations → parquet checkpoints
2. featurize     — decode → per-clip audio features (RMS, ZCR, spectral
                   centroid, clipping/silence ratios)
3. filter        — drop clips failing quality screens (undecodable,
                   near-silent, clipped)
4. rate-normalize — resample survivors to 16 kHz PCM16
5. dedup         — exact transcript dedup (content fingerprint)

Usage: python examples/training_data_pipeline.py [/tmp/demo_corpus]
(run examples/generate_corpus.py first, or let this script build it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root: str = "/tmp/demo_corpus") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import pyarrow.compute as pc
    import ray.data

    from fs_schema_validator_ray.pipelines.validate import (
        ValidationRunConfig,
        run_validation,
    )
    from fs_schema_validator_ray.rules import RuleSet
    from fs_schema_validator_ray.stages.audio_features import (
        ResampleStage,
        audio_feature_dataset,
    )
    from fs_schema_validator_ray.stages.dedup import exact_dedup_keep_min

    clips = os.path.join(root, "clips")
    manifest = os.path.join(root, "transcripts.parquet")
    if not os.path.exists(manifest):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "generate_corpus.py"), root],
            check=True,
        )

    # 1. validate (resumable: rerun with the same out_dir to skip done work)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "clips-rules.yaml")) as f:
        rules = RuleSet.from_yaml(f.read())
    res = run_validation(
        ValidationRunConfig(
            input_path=clips,
            rules=rules,
            output_dir=os.path.join(root, "run"),
            manifest_path=manifest,
        )
    )
    print(f"validated {res.total_rows} clips → {res.total_violations} violations")

    # 2. featurize (decode once; undecodable clips carry decode_ok=false)
    ds = ray.data.read_parquet(clips, columns=["clip_id", "bytes"])
    feats = audio_feature_dataset(ds)

    # 3. quality screens, vectorized on the feature table
    good = feats.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(t.column("decode_ok"), pc.less(t.column("silence_ratio"), 0.5)),
                pc.less(t.column("clipping_ratio"), 0.05),
            )
        ),
        batch_format="pyarrow",
    )
    keep_ids = good.select_columns(["clip_id"])
    n_keep = keep_ids.count()
    print(f"quality screens kept {n_keep} clips")

    # 4. rate-normalize survivors to 16 kHz PCM16 (broadcast the keep set)
    import numpy as np
    import pyarrow as pa

    ids = set()
    for b in keep_ids.iter_batches(batch_format="pyarrow"):
        ids.update(b.column("clip_id").to_pylist())
    ids_arr = pa.array(sorted(ids))
    resampled = (
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("clip_id"), value_set=ids_arr)),
            batch_format="pyarrow",
        )
        .map_batches(ResampleStage(target_sr=16_000), batch_format="pyarrow", batch_size=512)
    )
    out_dir = os.path.join(root, "normalized")
    resampled.write_parquet(out_dir)
    print(f"wrote rate-normalized clips to {out_dir}")

    # 5. exact transcript dedup over the manifest (doc id derived from the
    # clip id hash — per-batch arange would collide across blocks)
    from fs_schema_validator_ray.state.sketches import hash64

    m = ray.data.read_parquet(manifest)
    m = m.map_batches(
        lambda t: t.append_column(
            "doc_id",
            pa.array(
                hash64(np.asarray(t.column("clip_id"), dtype=object)).view(np.int64)
            ),
        ),
        batch_format="pyarrow",
    )
    canonical = exact_dedup_keep_min(m, text_column="transcript", id_column="doc_id")
    print(f"transcript dedup: {m.count()} rows → {canonical.count()} distinct")

    ray.shutdown()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/demo_corpus"]))
