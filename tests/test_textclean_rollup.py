"""TextCleanStage, RedactStage, and rollup_sum."""

import pyarrow as pa


def _ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_text_clean_pipeline(ray_session):
    from fs_schema_validator_ray.stages.text import TextCleanStage

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "  a\t\tb\x00c \n d  ",  # ctrl char + ws runs + edges
                    chr(0xE9) + "cole",  # non-ascii passes through untouched
                    None,
                ]
            ),
        }
    )
    out = TextCleanStage()(batch).to_pylist()
    assert out[0]["clean_text"] == "a bc d"
    assert out[1]["clean_text"] == chr(0xE9) + "cole"
    assert out[1]["n_chars_clean"] == 5
    assert out[2]["clean_text"] == "" and out[2]["n_chars_clean"] == 0


def test_redact_order_and_counts(ray_session):
    from fs_schema_validator_ray.stages.text import RedactStage

    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(
                # the email inside the URL must count as URL, not email
                ["see https://x.io/a@b.com and mail me@q.org or +1 (22) 333-4455 end"]
            ),
        }
    )
    row = RedactStage()(batch).to_pylist()[0]
    assert row["n_urls"] == 1 and row["n_emails"] == 1 and row["n_phones"] == 1
    assert row["redacted_text"] == "see <URL> and mail <EMAIL> or <PHONE> end"


def test_redact_no_pii_passthrough(ray_session):
    from fs_schema_validator_ray.stages.text import RedactStage

    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["plain words only"])}
    )
    row = RedactStage()(batch).to_pylist()[0]
    assert row["redacted_text"] == "plain words only"
    assert row["n_urls"] == row["n_emails"] == row["n_phones"] == 0


def test_rollup_sum_levels(ray_session):
    from fs_schema_validator_ray.stages.agg import rollup_sum

    ds = _ds(
        {
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array(["p", "q", "p"], pa.string()),
            "v": pa.array([1, 2, 4], pa.int64()),
        }
    )
    rows = {
        (r["a"], r["b"]): (r["v"], r["n"])
        for r in rollup_sum(ds, ["a", "b"], ["v"]).take_all()
    }
    assert rows == {
        ("x", "p"): (1, 1),
        ("x", "q"): (2, 1),
        ("y", "p"): (4, 1),
        ("x", None): (3, 2),
        ("y", None): (4, 1),
        (None, None): (7, 3),
    }


def test_rollup_sum_single_key_matches_duckdb(ray_session):
    import duckdb

    from fs_schema_validator_ray.stages.agg import rollup_sum

    tbl = pa.table(
        {
            "k": pa.array(["a", "b", "a", "c"], pa.string()),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    res = rollup_sum(_ds(dict(zip(tbl.column_names, tbl.columns))), ["k"], ["v"])
    got = sorted(
        ((r["k"], r["v"], r["n"]) for r in res.take_all()),
        key=lambda t: (t[0] is None, t),
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = sorted(
        con.execute(
            "SELECT k, CAST(SUM(v) AS BIGINT), COUNT(*) FROM t GROUP BY ROLLUP(k)"
        ).fetchall(),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [tuple(w) for w in want]


def test_rollup_null_key_columns_are_typed(ray_session):
    from fs_schema_validator_ray.stages.agg import rollup_sum

    ds = _ds(
        {
            "a": pa.array([1], pa.int64()),
            "b": pa.array(["z"], pa.string()),
            "v": pa.array([5], pa.int64()),
        }
    )
    res = rollup_sum(ds, ["a", "b"], ["v"])
    schema = res.schema().base_schema
    assert schema.field("a").type == pa.int64()
    assert schema.field("b").type == pa.string()
    assert res.count() == 3  # (a,b), (a), ()
