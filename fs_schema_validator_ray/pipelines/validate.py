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

Violation output is one hive directory per PARTITION (plus one each
for the global/drift/plan passes): a resumed run deletes and rewrites
exactly the partitions it reprocesses — rerun-safe, never one giant
file.
"""

from __future__ import annotations

import glob
import json
import shutil
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fs_schema_validator_ray.pipelines.stats import drift_self_check
from fs_schema_validator_ray.report import VIOLATION_SCHEMA
from fs_schema_validator_ray.rules import RuleSet
from fs_schema_validator_ray.stages.combined import CombinedValidateStage
from fs_schema_validator_ray.stages.referential import build_membership
from fs_schema_validator_ray.stages.scalar import PARTITION_COLUMN
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
    #: True → run the fused per-row stage as an actor pool (stateful
    #: decoders); False → stateless tasks (no actor spin-up latency)
    decode_actor_pool: bool = False
    read_columns: Optional[list[str]] = None
    #: columns to snapshot per-partition mergeable sketch state for in
    #: the checkpoint manifest (north_rule: checkpoints record sketch
    #: state): numeric columns get a t-digest, everything else an HLL.
    #: A resumed/extended run re-derives corpus quantiles / distinct
    #: estimates by merging manifest blobs — no re-read of finished
    #: partitions (see :func:`merged_stats_sketches`).
    stats_sketch_columns: Optional[list[str]] = None


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

        def normalize(t: pa.Table) -> pa.Table:
            cols = []
            for f in VIOLATION_SCHEMA:
                c = t.column(f.name) if f.name in t.column_names else pa.nulls(
                    t.num_rows, f.type
                )
                cols.append(c.cast(f.type))
            return pa.Table.from_arrays(cols, schema=VIOLATION_SCHEMA)

        sources = []
        # per-partition (hive-partitioned) row-rule violations: read the
        # directory so partition_id is restored from the path
        parts_root = os.path.join(self.output_dir, "violations", "parts")
        if glob.glob(os.path.join(parts_root, "**", "*.parquet"), recursive=True):
            sources.append(ray.data.read_parquet(parts_root))
        # global/drift violations carry partition_id as a normal column
        flat = sorted(
            p
            for p in glob.glob(
                os.path.join(self.output_dir, "violations", "**", "*.parquet"),
                recursive=True,
            )
            if not p.startswith(parts_root + os.sep)
        )
        if flat:
            sources.append(ray.data.read_parquet(flat))
        if not sources:
            return ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())
        out = sources[0]
        if len(sources) > 1:
            out = out.map_batches(normalize, batch_format="pyarrow").union(
                *(s.map_batches(normalize, batch_format="pyarrow") for s in sources[1:])
            )
            return out
        return out.map_batches(normalize, batch_format="pyarrow")


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


def _cluster_cpus() -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:  # noqa: BLE001 - conservative fallback pre-init
        return 8


def _wave_stats_sketches(
    wave: list[tuple[int, list[str]]],
    columns: list[str],
    file_schema: Optional[pa.Schema],
) -> dict[int, dict[str, dict[str, str]]]:
    """Per-partition mergeable sketch snapshots for one wave — the
    north_rule's 'checkpoints record sketch state'. One columns-pruned
    read of the wave's files; per-block partials emit ``(pid, column,
    kind, blob)`` rows (t-digest for numeric columns, HLL otherwise),
    merged per (pid, column) on the driver (a wave is ≤ wave_size
    partitions × KB-sized blobs)."""
    from fs_schema_validator_ray.state.sketches import HyperLogLog, TDigest

    def partial(batch: pa.Table) -> pa.Table:
        pids_arr = np.asarray(batch.column(PARTITION_COLUMN), dtype=np.int32)
        out_pid, out_col, out_kind, out_blob = [], [], [], []
        for pid in np.unique(pids_arr):
            mask = pa.array(pids_arr == pid)
            sub = batch.filter(mask)
            for col in columns:
                arr = sub.column(col)
                atype = arr.type
                if pa.types.is_integer(atype) or pa.types.is_floating(atype):
                    vals = np.asarray(
                        arr.combine_chunks().drop_null(), dtype=np.float64
                    )
                    td = TDigest()
                    if len(vals):
                        td.add(vals)
                    kind, blob = "tdigest", td.to_bytes()
                else:
                    hll = HyperLogLog()
                    dropped = arr.combine_chunks().drop_null()
                    if len(dropped):
                        hll.add(dropped.to_numpy(zero_copy_only=False))
                    kind, blob = "hll", hll.to_bytes()
                out_pid.append(int(pid))
                out_col.append(col)
                out_kind.append(kind)
                out_blob.append(blob)
        return pa.table(
            {
                "pid": pa.array(out_pid, pa.int32()),
                "column": pa.array(out_col, pa.string()),
                "kind": pa.array(out_kind, pa.string()),
                "blob": pa.array(out_blob, pa.binary()),
            }
        )

    sds = _read_partitions(wave, columns, file_schema=file_schema)
    merged: dict[tuple[int, str], Any] = {}
    kinds: dict[tuple[int, str], str] = {}
    for b in sds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            key = (r["pid"], r["column"])
            sk = (
                TDigest.from_bytes(r["blob"])
                if r["kind"] == "tdigest"
                else HyperLogLog.from_bytes(r["blob"])
            )
            merged[key] = sk if key not in merged else merged[key].merge(sk)
            kinds[key] = r["kind"]
    out: dict[int, dict[str, dict[str, str]]] = {}
    for (pid, col), sk in merged.items():
        out.setdefault(pid, {})[col] = {
            "kind": kinds[(pid, col)],
            "blob": sk.to_bytes().hex(),
        }
    return out


def merged_stats_sketches(output_dir: str) -> dict[str, Any]:
    """Merge every partition manifest's sketch blobs into one global
    sketch per column — corpus quantiles / distinct estimates WITHOUT
    re-reading any finished partition (the resume-friendly read path
    for the checkpointed sketch state)."""
    from fs_schema_validator_ray.state.sketches import HyperLogLog, TDigest

    out: dict[str, Any] = {}
    for path in glob.glob(os.path.join(_manifest_dir(output_dir), "part-*.json")):
        with open(path) as f:
            doc = json.load(f)
        for col, entry in doc.get("stats_sketches_hex", {}).items():
            blob = bytes.fromhex(entry["blob"])
            sk = (
                TDigest.from_bytes(blob)
                if entry["kind"] == "tdigest"
                else HyperLogLog.from_bytes(blob)
            )
            out[col] = sk if col not in out else out[col].merge(sk)
    return out


def _read_partitions(
    groups: list[tuple[int, list[str]]],
    columns: Optional[list[str]],
    override_num_blocks: Optional[int] = None,
    file_schema: Optional[pa.Schema] = None,
):
    """ONE parquet read over every file of every group (full read
    parallelism, one plan op), with the partition id derived per batch
    from the file path (``include_paths``) — no per-partition read fan-out
    and no union of N dataset plans. Column pruning is pushed into the
    read. ``override_num_blocks``: for narrow (key-only) passes feeding a
    shuffle, cap blocks near the CPU count — shuffle fan-out is
    blocks², and thousands of tiny blocks cost more in object-store
    round-trips than they buy in parallelism.

    ``file_schema`` (the footer-unified schema): when given, pruning is
    expressed as ``schema=<pruned subset>`` instead of ``columns=`` —
    pyarrow then null-fills columns absent from individual files, so a
    schema-evolved corpus (rule column only in newer files) reads cleanly
    instead of failing on the first old file."""
    import ray.data

    path_to_pid = {f: pid for pid, files in groups for f in files}
    if columns is not None and file_schema is not None:
        read_kwargs = {
            "schema": pa.schema([file_schema.field(c) for c in columns])
        }
    else:
        read_kwargs = {"columns": columns}
    ds = ray.data.read_parquet(
        sorted(path_to_pid),
        include_paths=True,
        **read_kwargs,
        **({"override_num_blocks": override_num_blocks} if override_num_blocks else {}),
    )

    def attach(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").combine_chunks()
        enc = paths.dictionary_encode()
        uniq = [p.as_py() for p in enc.dictionary]
        unknown = [p for p in uniq if p not in path_to_pid]
        if unknown:
            # fail LOUDLY: silently mapping to -1 would drop these rows
            # from every per-partition count and cleanup path
            raise ValueError(
                f"read returned path(s) not in the partition plan: {unknown[:3]}"
            )
        lut = np.asarray([path_to_pid[p] for p in uniq], dtype=np.int32)
        pids = lut[np.asarray(enc.indices, dtype=np.int64)]
        batch = batch.drop_columns(["path"])
        if PARTITION_COLUMN in batch.column_names:
            batch = batch.drop_columns([PARTITION_COLUMN])
        return batch.append_column(PARTITION_COLUMN, pa.array(pids, pa.int32()))

    return ds.map_batches(attach, batch_format="pyarrow")


def _footer_row_count(directory: str) -> int:
    """Row count from parquet footers — no data read, no Ray job."""
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(directory, "**", "*.parquet"), recursive=True)
    )


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

    # --- resume safety under a CHANGED corpus (incremental runs) --------
    # A manifest row is only valid for the exact input slice it was
    # computed from. Whole-corpus docs (plan/global/drift) carry the
    # corpus signature and are re-run when any file is added/removed;
    # per-partition docs carry their file list and stay valid exactly
    # when the partition plan still maps the same files to that pid
    # (appending sorted-later files keeps existing one-file-per-partition
    # pids stable → a true incremental run; any shifted pid recomputes).
    import hashlib

    corpus_sig = hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
    done = {
        k: d
        for k, d in done.items()
        if (k.startswith("part-") or d.get("corpus_sig") == corpus_sig)
    }
    group_files = dict(groups)
    done = {
        k: d
        for k, d in done.items()
        if not k.startswith("part-")
        or group_files.get(d.get("partition_id")) == d.get("files")
    }
    # purge on-disk state for partitions invalidated above (shifted or
    # removed from the corpus): their manifest rows and violation dirs
    # must not leak into violations_dataset() / merged_stats_sketches().
    # Reprocessed pids are rewritten by the wave loop anyway; removed
    # pids have nothing else to clear them.
    parts_root_ = os.path.join(cfg.output_dir, "violations", "parts")
    for path in glob.glob(os.path.join(_manifest_dir(cfg.output_dir), "part-*.json")):
        key = os.path.basename(path)[: -len(".json")]
        if key not in done:
            os.remove(path)
            pid_s = key[len("part-"):]
            shutil.rmtree(
                os.path.join(parts_root_, f"partition_id={pid_s}"),
                ignore_errors=True,
            )

    # --- plan-time schema check: a rule targeting an absent column emits
    # ONE violation (reference's compile-level "does not exist") and is
    # dropped from the data plane — otherwise every batch of every block
    # would re-emit it (or crash the read) and counts would depend on
    # partitioning. Schema = union over ALL file footers (footer-only
    # reads are cheap; the wave loop re-reads them for row counts anyway)
    # so a schema-evolved corpus whose rule column appears only in later
    # files is never falsely reported as missing.
    input_columns: set[str] = set()
    file_schemas = []
    seen_schema_ids: set[tuple] = set()
    for f in files:
        s = pq.ParquetFile(f).schema_arrow
        key = tuple((n, str(s.field(n).type)) for n in s.names)
        if key not in seen_schema_ids:
            seen_schema_ids.add(key)
            file_schemas.append(s)
        input_columns |= set(s.names)
    try:
        unified_schema = pa.unify_schemas(file_schemas)
    except pa.ArrowException:  # conflicting types across files: let reads
        unified_schema = None  # use plain columns= and surface the error there

    def _rule_columns(r) -> list[str]:
        from fs_schema_validator_ray.rules import (
            AssetRule,
            AudioRule,
            ColumnRule,
            DriftRule,
            JsonRule,
            ReferentialRule,
            UniqueRule,
        )

        if isinstance(r, ColumnRule):
            return [r.column]
        if isinstance(r, AudioRule):
            cols = [r.bytes_column, r.codec_column, r.sr_column, r.dur_column]
            if r.check_transcript:
                cols.append(r.transcript_column)
            return cols
        if isinstance(r, AssetRule):
            return [r.bytes_column] + ([r.format_column] if r.format_column else [])
        if isinstance(r, (JsonRule, UniqueRule, ReferentialRule, DriftRule)):
            return [r.column]
        return []

    missing_col_rules = [
        r
        for r in rules.rules
        if any(c not in input_columns for c in _rule_columns(r))
    ]
    missing_ids = {r.rule_id for r in missing_col_rules}
    active_column_rules = [
        r for r in rules.column_rules() if r.rule_id not in missing_ids
    ]
    if missing_ids:
        # drop EVERY rule family member that targets an absent column —
        # they were reported once at plan time
        rules = RuleSet(
            rules=[r for r in rules.rules if r.rule_id not in missing_ids],
            bindings=rules.bindings,
        )
    plan_violations = len(missing_col_rules)
    if missing_col_rules and "plan" not in done:
        plan_dir = os.path.join(cfg.output_dir, "violations", "plan")
        shutil.rmtree(plan_dir, ignore_errors=True)
        os.makedirs(plan_dir, exist_ok=True)
        tbl = pa.Table.from_arrays(
            [
                pa.array([-1] * plan_violations, pa.int32()),
                pa.array([None] * plan_violations, pa.string()),
                pa.array([r.rule_id for r in missing_col_rules], pa.string()),
                pa.array(
                    [
                        "column `"
                        + next(
                            c for c in _rule_columns(r) if c not in input_columns
                        )
                        + "` does not exist"
                        for r in missing_col_rules
                    ],
                    pa.string(),
                ),
            ],
            schema=VIOLATION_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(plan_dir, "plan-violations.parquet"))
        _write_manifest(
            cfg.output_dir,
            {"id": "plan", "status": "done", "violations": plan_violations,
             "corpus_sig": corpus_sig,
             "rules": [r.rule_id for r in missing_col_rules]},
        )
    elif "plan" in done:
        plan_violations = done["plan"].get("violations", 0)

    phase_wall: dict[str, float] = {}
    _t = time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _t
        now = time.perf_counter()
        phase_wall[name] = round(phase_wall.get(name, 0.0) + now - _t, 3)
        _t = now

    read_columns = cfg.read_columns
    if read_columns is None:
        needed = set(rules.required_columns(cfg.key_column))
        # absent columns were already reported as plan violations; asking
        # the parquet reader for them would fail the whole read
        read_columns = sorted(needed & input_columns)

    # --- global pass: uniqueness (keys-only; the one shuffling rule) -----
    global_metrics: dict[str, Any] = {}
    g_violations = 0
    if "global" in done:
        global_metrics = done["global"].get("metrics", {})
        g_violations = done["global"].get("violations", 0)
    elif rules.unique_rules():
        t0 = time.perf_counter()
        out_dir = os.path.join(cfg.output_dir, "violations", "global")
        # a crash between write and manifest leaves stale files: clear them
        # so the re-run cannot double-count (manifest rows are written only
        # AFTER output is complete, so this is always safe)
        shutil.rmtree(out_dir, ignore_errors=True)
        all_v = []
        for rule in rules.unique_rules():
            # composite rules need ALL their key columns in the pruned read
            key_cols = list(getattr(rule, "columns", None) or [rule.column])
            key_ds = _read_partitions(
                groups, key_cols, override_num_blocks=_cluster_cpus(),
                file_schema=unified_schema,
            )
            v = uniqueness_violations(key_ds, rule)
            all_v.append(v)
        vds = all_v[0]
        if len(all_v) > 1:
            vds = vds.union(*all_v[1:])
        vds.write_parquet(out_dir)
        # footer sum (zero violations → write_parquet emits no files → 0)
        g_violations = _footer_row_count(out_dir)
        global_metrics = {"wall_s": time.perf_counter() - t0, "violations": g_violations}
        _write_manifest(
            cfg.output_dir,
            {"id": "global", "status": "done", "violations": g_violations,
             "corpus_sig": corpus_sig, "metrics": global_metrics},
        )

    _mark("unique")
    pending = [(pid, grp) for pid, grp in groups if f"part-{pid}" not in done]

    # --- referential membership (built once, broadcast via ray.put) ------
    membership_refs = {}
    if pending and rules.referential_rules():
        if cfg.manifest_path is None:
            raise ValueError("ruleset has referential rules but no manifest_path configured")


        for rule in rules.referential_rules():
            composite = getattr(rule, "columns", None)
            if composite:
                from fs_schema_validator_ray.stages.referential import (
                    canonical_tuple_strings,
                )

                mt = pq.read_table(cfg.manifest_path, columns=list(composite))
                keys = canonical_tuple_strings(mt, composite)
            else:
                mcol = cfg.manifest_key_column or rule.column
                keys = pq.read_table(cfg.manifest_path, columns=[mcol]).column(
                    mcol
                )
            # pass the Arrow column: build_membership canonicalizes it the
            # same way the probe side does (dtype-stable under nulls)
            membership = build_membership(
                keys, use_bloom=rule.use_bloom, fpp=rule.bloom_fpp
            )
            membership_refs[rule.rule_id] = ray.put(membership)

    _mark("membership")
    # --- drift: ONE pruned pass per rule over all partitions --------------
    # Per-partition histograms and the (self-)baseline come out of the same
    # read; nothing about drift touches the payload-bearing wave pass.
    drift_by_rule: dict[str, dict[int, dict]] = {}
    drift_viol_by_pid: dict[int, int] = {}
    # drift counts computed THIS run (vs loaded from a done manifest):
    # partitions skipped by the wave loop still need these in the total
    fresh_drift_by_pid: dict[int, int] = {}
    for rule in rules.drift_rules():
        doc_id = f"drift-{rule.rule_id}"
        if doc_id in done:
            stored = done[doc_id]
            drift_by_rule[rule.rule_id] = {
                int(k): v for k, v in stored.get("metrics", {}).items()
            }
            for pid_s, nv in stored.get("violations_by_pid", {}).items():
                pid = int(pid_s)
                drift_viol_by_pid[pid] = drift_viol_by_pid.get(pid, 0) + nv
                # a partition manifest written BEFORE this drift rule ran
                # never folded these counts into its own `violations` —
                # treat loaded counts like fresh ones for such docs, or a
                # no-op rerun silently flips exit code 1 → 0 while the
                # drift violations still exist on disk
                part_doc = done.get(f"part-{pid}")
                if part_doc is not None and rule.rule_id not in part_doc.get(
                    "drift", {}
                ):
                    fresh_drift_by_pid[pid] = fresh_drift_by_pid.get(pid, 0) + nv
            continue
        t0 = time.perf_counter()
        dds = _read_partitions(
            groups, [rule.column], override_num_blocks=_cluster_cpus(),
            file_schema=unified_schema,
        )
        if getattr(rule, "categorical", False):
            from fs_schema_validator_ray.pipelines.stats import (
                categorical_drift_self_check,
            )

            dviol, dmetrics, dsketches = categorical_drift_self_check(
                dds, rule, cfg.baselines.get(rule.rule_id), return_sketches=True
            )
        else:
            dviol, dmetrics, dsketches = drift_self_check(
                dds, rule, cfg.baselines.get(rule.rule_id), return_sketches=True
            )
        drift_out = os.path.join(cfg.output_dir, "violations", doc_id)
        shutil.rmtree(drift_out, ignore_errors=True)
        if dviol.num_rows:
            import ray.data as rd

            rd.from_arrow(dviol).write_parquet(drift_out)
        vb: dict[int, int] = {}
        for pid in dviol.column("partition_id").to_pylist():
            vb[int(pid)] = vb.get(int(pid), 0) + 1
        for pid, nv in vb.items():
            drift_viol_by_pid[pid] = drift_viol_by_pid.get(pid, 0) + nv
            fresh_drift_by_pid[pid] = fresh_drift_by_pid.get(pid, 0) + nv
        drift_by_rule[rule.rule_id] = dmetrics
        _write_manifest(
            cfg.output_dir,
            {"id": doc_id, "status": "done", "corpus_sig": corpus_sig,
             "metrics": {str(k): v for k, v in dmetrics.items()},
             "violations_by_pid": {str(k): v for k, v in vb.items()},
             # mergeable sketch state per partition (hex histogram blobs):
             # a resumed/extended run can re-derive the global baseline by
             # merging these without re-reading finished partitions
             "sketches_hex": {str(k): v.hex() for k, v in dsketches.items()},
             "wall_s": time.perf_counter() - t0},
        )

    _mark("drift")
    # --- waves over pending partitions ------------------------------------
    # ONE fused pass per wave: every per-row rule (scalar + audio decode +
    # referential probe) runs inside a single map_batches over a single
    # read — branching streams would each re-execute the payload read.
    skipped = len(groups) - len(pending)
    partition_metrics: dict[int, dict] = {
        int(doc["partition_id"]): doc
        for doc in done.values()
        if "partition_id" in doc
    }

    waves = [pending[i : i + cfg.wave_size] for i in range(0, len(pending), cfg.wave_size)]
    ref_pairs = (
        [(rule, membership_refs[rule.rule_id]) for rule in rules.referential_rules()]
        if pending
        else []
    )
    has_row_rules = bool(
        active_column_rules
        or rules.audio_rules()
        or rules.json_rules()
        or rules.asset_rules()
        or ref_pairs
    )

    # violations are laid out ONE DIRECTORY PER PARTITION (the checkpoint
    # unit), not per wave: a resumed run deletes and rewrites exactly the
    # partitions it reprocesses, so `violations_dataset()` can never see a
    # stale or duplicated copy (crash-between-write-and-manifest safe).
    parts_root = os.path.join(cfg.output_dir, "violations", "parts")

    for wave_no, wave in enumerate(waves):
        t0 = time.perf_counter()
        wave_ids = [pid for pid, _ in wave]
        for pid in wave_ids:
            shutil.rmtree(
                os.path.join(parts_root, f"partition_id={pid}"), ignore_errors=True
            )

        # per-partition row counts from parquet footers — no data read
        rows_by_pid = {
            pid: sum(pq.ParquetFile(f).metadata.num_rows for f in grp)
            for pid, grp in wave
        }

        viol_by_pid: dict[int, int] = {}
        if has_row_rules:
            ds = _read_partitions(wave, read_columns, file_schema=unified_schema)
            stage_args = (
                active_column_rules, rules.audio_rules(), ref_pairs,
                cfg.key_column, rules.json_rules(), rules.asset_rules(),
            )
            if cfg.decode_actor_pool:
                # stateful-decoder shape: callable class → actor pool,
                # setup once per worker in __init__
                vds = ds.map_batches(
                    CombinedValidateStage,
                    fn_constructor_args=stage_args,
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                    concurrency=cfg.decode_concurrency,
                    num_cpus=1,
                )
            else:
                # stateless decode: instance → plain tasks, instant fan-out
                vds = ds.map_batches(
                    CombinedValidateStage(*stage_args),
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                )
            vds.write_parquet(parts_root, partition_cols=["partition_id"])
            # violation counts per pid straight from the parquet footers
            for pid in wave_ids:
                files = glob.glob(
                    os.path.join(parts_root, f"partition_id={pid}", "*.parquet")
                )
                if files:
                    viol_by_pid[pid] = sum(
                        pq.ParquetFile(f).metadata.num_rows for f in files
                    )

        sketches_by_pid: dict[int, dict[str, dict[str, str]]] = {}
        if cfg.stats_sketch_columns:
            scols = [c for c in cfg.stats_sketch_columns if c in input_columns]
            if scols:
                sketches_by_pid = _wave_stats_sketches(
                    wave, scols, unified_schema
                )

        wall = time.perf_counter() - t0
        for pid, grp in wave:
            n_viol = viol_by_pid.get(pid, 0) + drift_viol_by_pid.get(pid, 0)
            doc = {
                "id": f"part-{pid}",
                "partition_id": pid,
                "status": "done",
                "files": grp,
                "rows": rows_by_pid.get(pid, 0),
                "violations": n_viol,
                "violations_path": os.path.join(parts_root, f"partition_id={pid}"),
                "drift": {
                    rid: metrics[pid]
                    for rid, metrics in drift_by_rule.items()
                    if pid in metrics
                },
                "wave_wall_s": wall,
            }
            if sketches_by_pid.get(pid):
                doc["stats_sketches_hex"] = sketches_by_pid[pid]
            _write_manifest(cfg.output_dir, doc)
            partition_metrics[pid] = doc

    _mark("waves")
    global_metrics["phase_wall"] = phase_wall
    # freshly-computed drift violations on partitions the wave loop
    # skipped (their manifests predate the drift rule) are counted here;
    # reprocessed partitions already folded them into their new docs
    pending_pids = {pid for pid, _ in pending}
    drift_on_skipped = sum(
        n for pid, n in fresh_drift_by_pid.items() if pid not in pending_pids
    )
    total_viols = (
        plan_violations
        + g_violations
        + drift_on_skipped
        + sum(m.get("violations", 0) for m in partition_metrics.values())
    )
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
