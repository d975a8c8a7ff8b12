"""Table source abstraction: parquet path + gated lance path."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fs_schema_validator_ray.sources.table import lance_available, read_table


def test_parquet_fallback(ray_session, tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}), p)
    ds = read_table(str(p), columns=["a"])
    assert ds.count() == 3
    assert ds.schema().names == ["a"]


def test_lance_requires_package(tmp_path):
    if lance_available():  # pragma: no cover - not in this sandbox
        pytest.skip("lance installed; gated error not applicable")
    with pytest.raises(ImportError, match="Lance"):
        read_table(str(tmp_path / "t.lance"))


def test_read_table_csv_jsonl(ray_session, tmp_path):
    """CSV and JSONL go through the same read_table interface with
    post-read column pruning."""
    import pandas as pd

    from fs_schema_validator_ray.sources.table import read_table

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]})
    csv_p = str(tmp_path / "t.csv")
    jsonl_p = str(tmp_path / "t.jsonl")
    df.to_csv(csv_p, index=False)
    df.to_json(jsonl_p, orient="records", lines=True)

    out_csv = read_table(csv_p, columns=["a", "b"]).take_all()
    assert sorted((r["a"], r["b"]) for r in out_csv) == [(1, "x"), (2, "y"), (3, "z")]
    assert set(out_csv[0].keys()) == {"a", "b"}

    out_jl = read_table(jsonl_p, columns=["a", "c"]).take_all()
    assert sorted((r["a"], r["c"]) for r in out_jl) == [(1, 0.5), (2, 1.5), (3, 2.5)]


def test_write_partitioned_parquet_roundtrip(ray_session, tmp_path):
    """Hive-partitioned write → per-partition pruned read-back."""
    import pyarrow as pa
    import ray.data

    from fs_schema_validator_ray.sinks import (
        read_partition_pruned,
        write_partitioned_parquet,
    )

    t = pa.table(
        {
            "shard": pa.array(["a", "a", "b", "b", "b"]),
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = str(tmp_path / "out")
    parts = write_partitioned_parquet(
        ray.data.from_arrow(t).repartition(2), out, ["shard"]
    )
    assert any("shard=a" in p for p in parts) and any("shard=b" in p for p in parts)
    back = read_partition_pruned(out, "shard", "b").take_all()
    assert sorted(r["v"] for r in back) == [3, 4, 5]
