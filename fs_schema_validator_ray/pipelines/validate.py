"""The flagship pipeline: resumable, partitioned validation run.

Ray-Data-first rebuild of the reference's one-shot serial run
(``/root/reference/fs_schema_validator/__init__.py:71-80`` +
``__main__.py:76-96``) for a 10^12-row corpus:

* the input file list is grouped into **partitions** (the checkpoint
  unit; at scale: one per Lance fragment / file group),
* partitions are processed in **waves**; each wave is ONE streaming
  Dataset pipeline — ``read_parquet(columns=pruned) → attach partition_id
  → [scalar rules | decode actor pool | referential broadcast probe] →
  write violations parquet`` — so within a wave every stage pipelines
  with backpressure and all cores stay busy,
* after a wave completes, a **manifest row per partition** records
  lineage (input files), row/violation counts, drift statistics and wall
  time; a rerun anti-joins done partitions out of the plan and continues
  (north_rule: resumable from per-partition checkpoints with lineage +
  metrics),
* globally-scoped rules (key uniqueness) run once as a separate
  keys-only pass — the only all-to-all exchange in the system, shuffling
  pre-aggregated ``(key, count)`` rows, never payloads.

Violation output is one directory per wave (plus one for the global
pass): rerun-friendly, never one giant file.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.pipelines.stats import compute_histogram, drift_check
from fs_schema_validator_ray.report import VIOLATION_SCHEMA
from fs_schema_validator_ray.rules import RuleSet
from fs_schema_validator_ray.stages.decode import AudioValidateStage
from fs_schema_validator_ray.stages.referential import ReferentialStage, build_membership
from fs_schema_validator_ray.stages.scalar import PARTITION_COLUMN, ScalarRuleStage
from fs_schema_validator_ray.stages.unique import uniqueness_violations
from fs_schema_validator_ray.state import Histogram


@dataclass
class ValidationRunConfig:
    input_path: Any                      # dir, glob, file, or list of files
    rules: RuleSet
    output_dir: str
    key_column: str = "clip_id"
    manifest_path: Optional[str] = None  # parquet for referential rules
    manifest_key_column: Optional[str] = None
    baselines: dict = field(default_factory=dict)  # rule_id -> Histogram
    partitions: Optional[int] = None     # group files into this many partitions
    wave_size: int = 16
    decode_batch_size: int = 512
    decode_concurrency: Any = (2, 16)
    read_columns: Optional[list[str]] = None


@dataclass
class RunResult:
    output_dir: str
    partition_metrics: dict
    global_metrics: dict
    total_violations: int
    total_rows: int
    waves_run: int
    partitions_skipped: int

    def okay(self) -> bool:
        return self.total_violations == 0

    def exit_code(self) -> int:
        return 0 if self.okay() else 1

    def violations_dataset(self):
        import ray.data

        paths = sorted(
            glob.glob(os.path.join(self.output_dir, "violations", "**", "*.parquet"), recursive=True)
        )
        if not paths:
            return ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())
        return ray.data.read_parquet(paths)


def _input_files(input_path: Any) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(str(p) for p in input_path)
    p = str(input_path)
    if os.path.isdir(p):
        return sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
    if any(ch in p for ch in "*?["):
        return sorted(glob.glob(p))
    return [p]


def plan_partitions(files: list[str], partitions: Optional[int]) -> list[tuple[int, list[str]]]:
    """Group input files into checkpoint partitions (default: one per
    file — the fragment-granularity analogue)."""
    if not files:
        raise ValueError("no input files found")
    k = partitions or len(files)
    k = min(k, len(files))
    groups: list[list[str]] = [[] for _ in range(k)]
    for i, f in enumerate(files):
        groups[i % k].append(f)
    return [(pid, grp) for pid, grp in enumerate(groups) if grp]


def _manifest_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "manifest")


def _load_done(output_dir: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in glob.glob(os.path.join(_manifest_dir(output_dir), "*.json")):
        with open(path) as f:
            doc = json.load(f)
        out[doc["id"]] = doc
    return out


def _write_manifest(output_dir: str, doc: dict) -> None:
    os.makedirs(_manifest_dir(output_dir), exist_ok=True)
    path = os.path.join(_manifest_dir(output_dir), f"{doc['id']}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)  # atomic: a manifest row exists only when complete


def _attach_partition_id(pid: int):
    def fn(batch: pa.Table) -> pa.Table:
        col = pa.array(np.full(batch.num_rows, pid, dtype=np.int32))
        if PARTITION_COLUMN in batch.column_names:
            batch = batch.drop_columns([PARTITION_COLUMN])
        return batch.append_column(PARTITION_COLUMN, col)

    return fn


def _read_partitions(groups: list[tuple[int, list[str]]], columns: Optional[list[str]]):
    """Union of per-group reads, each tagged with its partition id. Column
    pruning is pushed into the parquet read."""
    import ray.data

    datasets = []
    for pid, files in groups:
        ds = ray.data.read_parquet(files, columns=columns)
        datasets.append(ds.map_batches(_attach_partition_id(pid), batch_format="pyarrow"))
    out = datasets[0]
    if len(datasets) > 1:
        out = out.union(*datasets[1:])
    return out


def _partial_count_by_pid(ds) -> dict[int, int]:
    """Per-partition row counts without a shuffle: per-batch partial counts
    merged on the driver (tiny)."""
    def partial(batch: pa.Table) -> pa.Table:
        if PARTITION_COLUMN in batch.column_names:
            parts = np.asarray(batch.column(PARTITION_COLUMN).combine_chunks().cast(pa.int32()))
        else:
            parts = np.full(batch.num_rows, -1, np.int32)
        pids, counts = np.unique(parts, return_counts=True)
        return pa.table({"pid": pa.array(pids, pa.int32()), "n": pa.array(counts, pa.int64())})

    df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {int(k): int(v) for k, v in df.groupby("pid")["n"].sum().items()}


def run_validation(cfg: ValidationRunConfig) -> RunResult:
    """Execute (or resume) a validation run. Ray must already be
    initialized by the caller (driver contract)."""
    import ray
    import ray.data

    rules = cfg.rules
    os.makedirs(cfg.output_dir, exist_ok=True)
    files = _input_files(cfg.input_path)
    groups = plan_partitions(files, cfg.partitions)
    done = _load_done(cfg.output_dir)

    read_columns = cfg.read_columns
    if read_columns is None:
        needed = set(rules.required_columns(cfg.key_column))
        read_columns = sorted(needed)

    # --- global pass: uniqueness (keys-only; the one shuffling rule) -----
    global_metrics: dict[str, Any] = {}
    g_violations = 0
    if "global" in done:
        global_metrics = done["global"].get("metrics", {})
        g_violations = done["global"].get("violations", 0)
    elif rules.unique_rules():
        t0 = time.perf_counter()
        out_dir = os.path.join(cfg.output_dir, "violations", "global")
        all_v = []
        for rule in rules.unique_rules():
            key_ds = _read_partitions(groups, [rule.column])
            v = uniqueness_violations(key_ds, rule)
            all_v.append(v)
        vds = all_v[0]
        if len(all_v) > 1:
            vds = vds.union(*all_v[1:])
        vds.write_parquet(out_dir)
        g_violations = ray.data.read_parquet(out_dir).count()
        global_metrics = {"wall_s": time.perf_counter() - t0, "violations": g_violations}
        _write_manifest(
            cfg.output_dir,
            {"id": "global", "status": "done", "violations": g_violations,
             "metrics": global_metrics},
        )

    pending = [(pid, grp) for pid, grp in groups if f"part-{pid}" not in done]

    # --- referential membership (built once, broadcast via ray.put) ------
    membership_refs = {}
    if pending and rules.referential_rules():
        if cfg.manifest_path is None:
            raise ValueError("ruleset has referential rules but no manifest_path configured")
        import pyarrow.parquet as pq

        for rule in rules.referential_rules():
            mcol = cfg.manifest_key_column or rule.column
            keys = pq.read_table(cfg.manifest_path, columns=[mcol]).column(mcol)
            membership = build_membership(
                np.asarray(keys, dtype=object), use_bloom=rule.use_bloom, fpp=rule.bloom_fpp
            )
            membership_refs[rule.rule_id] = ray.put(membership)

    # --- drift baselines --------------------------------------------------
    baselines: dict[str, Histogram] = dict(cfg.baselines)
    for rule in rules.drift_rules() if pending else []:
        if rule.rule_id not in baselines:
            # self-baseline: whole-input histogram (one keys-free pass over
            # just the drift column); per-partition drift is then measured
            # against the global distribution
            base_ds = _read_partitions(groups, [rule.column])
            baselines[rule.rule_id] = compute_histogram(
                base_ds, rule.column, rule.lo, rule.hi, rule.bins
            )

    # --- waves over pending partitions ------------------------------------
    skipped = len(groups) - len(pending)
    partition_metrics: dict[int, dict] = {
        int(doc["partition_id"]): doc
        for doc in done.values()
        if "partition_id" in doc
    }

    waves = [pending[i : i + cfg.wave_size] for i in range(0, len(pending), cfg.wave_size)]
    scalar_stage = ScalarRuleStage(rules.column_rules(), key_column=cfg.key_column)

    for wave_no, wave in enumerate(waves):
        t0 = time.perf_counter()
        wave_ids = [pid for pid, _ in wave]
        ds = _read_partitions(wave, read_columns)

        v_streams = []
        if rules.column_rules():
            v_streams.append(ds.map_batches(scalar_stage, batch_format="pyarrow"))
        for rule in rules.audio_rules():
            v_streams.append(
                ds.map_batches(
                    AudioValidateStage,
                    fn_constructor_args=(rule, cfg.key_column),
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                    concurrency=cfg.decode_concurrency,
                    num_cpus=1,
                )
            )
        for rule in rules.referential_rules():
            v_streams.append(
                ds.map_batches(
                    ReferentialStage,
                    fn_constructor_args=(rule, membership_refs[rule.rule_id]),
                    batch_format="pyarrow",
                    concurrency=(1, 8),
                    num_cpus=1,
                )
            )

        wave_tag = "wave-" + "-".join(str(i) for i in (wave_ids[0], wave_ids[-1]))
        out_dir = os.path.join(cfg.output_dir, "violations", wave_tag)
        rows_by_pid = _partial_count_by_pid(ds)
        if v_streams:
            vds = v_streams[0]
            if len(v_streams) > 1:
                vds = vds.union(*v_streams[1:])
            vds.write_parquet(out_dir)
            viol_by_pid = _partial_count_by_pid(ray.data.read_parquet(out_dir))
        else:
            viol_by_pid = {}

        drift_metrics: dict[int, dict] = {}
        for rule in rules.drift_rules():
            dviol, dmetrics = drift_check(ds, rule, baselines[rule.rule_id])
            if dviol.num_rows:
                import ray.data as rd

                rd.from_arrow(dviol).write_parquet(
                    os.path.join(cfg.output_dir, "violations", f"{wave_tag}-drift")
                )
            drifted_pids = set(dviol.column("partition_id").to_pylist())
            for pid, m in dmetrics.items():
                drift_metrics.setdefault(pid, {})[rule.rule_id] = m
                if pid in drifted_pids:
                    viol_by_pid[pid] = viol_by_pid.get(pid, 0) + 1

        wall = time.perf_counter() - t0
        for pid, grp in wave:
            doc = {
                "id": f"part-{pid}",
                "partition_id": pid,
                "status": "done",
                "files": grp,
                "rows": rows_by_pid.get(pid, 0),
                "violations": viol_by_pid.get(pid, 0),
                "violations_path": out_dir,
                "drift": drift_metrics.get(pid, {}),
                "wave_wall_s": wall,
            }
            _write_manifest(cfg.output_dir, doc)
            partition_metrics[pid] = doc

    total_viols = g_violations + sum(m.get("violations", 0) for m in partition_metrics.values())
    total_rows = sum(m.get("rows", 0) for m in partition_metrics.values())
    return RunResult(
        output_dir=cfg.output_dir,
        partition_metrics=partition_metrics,
        global_metrics=global_metrics,
        total_violations=int(total_viols),
        total_rows=int(total_rows),
        waves_run=len(waves),
        partitions_skipped=skipped,
    )
