"""CLI surface: exit codes, bounded --verbose rendering (VERDICT r1 item 7).

Runs ``python -m fs_schema_validator_ray`` in a subprocess because the CLI
owns its own Ray session (init + shutdown), which must not disturb the
session-scoped test fixture.
"""

import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from fs_schema_validator_ray.sources.clips import ClipsConfig, build_clips_table

RULES = """
rules:
  - rule: sr_hz_range
    type: int
    column: sr_hz
    min: 8000
    max: 48000
  - rule: dur_ms_range
    type: int
    column: dur_ms
    min: 20
    max: 30000
"""


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    cfg = ClipsConfig(n_rows=600, rows_per_partition=300)
    clips = root / "clips"
    clips.mkdir()
    for pid in range(cfg.num_partitions()):
        lo = pid * cfg.rows_per_partition
        hi = min(cfg.n_rows, lo + cfg.rows_per_partition)
        t = build_clips_table(cfg, np.arange(lo, hi)).drop_columns(["partition_id"])
        pq.write_table(t, clips / f"part-{pid:04d}.parquet")
    rules = root / "rules.yaml"
    rules.write_text(RULES)
    return {"clips": str(clips), "rules": str(rules), "cfg": cfg}


def run_cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "fs_schema_validator_ray", *argv],
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_verbose_render_is_capped(cli_corpus, tmp_path):
    n_bad = len(cli_corpus["cfg"].planted_indices("sr_out_of_range")) + len(
        cli_corpus["cfg"].planted_indices("sr_null")
    ) + len(cli_corpus["cfg"].planted_indices("dur_zero"))
    assert n_bad > 2, "corpus must plant >2 violations for the cap to bite"

    proc = run_cli(
        cli_corpus["rules"],
        "-i", cli_corpus["clips"],
        "-o", str(tmp_path / "run"),
        "-v", "--max-render", "2",
        "--num-cpus", "2",
    )
    assert proc.returncode == 1, proc.stderr
    fails = [l for l in proc.stdout.splitlines() if l.startswith("FAIL ")]
    assert 0 < len(fails) <= 2
    assert "more violation(s) not rendered (--max-render 2)" in proc.stdout
    # deterministic head: sorted by key, so the first FAIL is the min key
    rendered_keys = [l.split()[1] for l in fails]
    assert rendered_keys == sorted(rendered_keys)


def test_violations_head_no_global_sort(ray_session, monkeypatch):
    """VERDICT r2 item 6: the verbose render must use per-block local
    top-N + driver merge, never an all-to-all Dataset.sort — and produce
    byte-identical output to sort().limit()."""
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.__main__ import _violations_head
    from fs_schema_validator_ray.report import VIOLATION_SCHEMA

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.Table.from_arrays(
        [
            pa.array(rng.integers(0, 8, n).astype(np.int32)),
            pa.array([f"clip-{i:05d}" for i in rng.integers(0, 2000, n)]),
            pa.array([f"rule_{i}" for i in rng.integers(0, 5, n)]),
            pa.array([f"reason {i}" for i in rng.integers(0, 3, n)]),
        ],
        schema=VIOLATION_SCHEMA,
    )
    ds = ray.data.from_arrow(t).repartition(16)
    expect = (
        t.to_pandas()
        .sort_values(["key", "rule_id", "reason"], kind="stable")
        .head(100)
        .reset_index(drop=True)[["key", "rule_id", "reason"]]
    )

    def no_sort(self, *a, **k):  # any global sort in the render path fails
        raise AssertionError("render path must not call Dataset.sort")

    monkeypatch.setattr(ray.data.Dataset, "sort", no_sort)
    got = _violations_head(ds, 100).to_pandas().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[["key", "rule_id", "reason"]], expect)


def test_invalid_ruleset_exit_127(cli_corpus, tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("rules:\n  - rule: x\n    type: nosuchtype\n    column: c\n")
    proc = run_cli(str(bad), "-i", cli_corpus["clips"], "--num-cpus", "2")
    assert proc.returncode == 127
