"""Round-4 additions: TPC-H Q3/Q5/Q18 plan shapes + the first-order
Markov event-transition matrix (all four are also hash-exact vs their
DuckDB oracles at sf0.001/sf0.01 — tools/check_oracles.py; these tests
assert the semantic invariants the hash alone doesn't spell out)."""

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))


def test_q3_top10_sorted_and_bounded(ray_session):
    t = _table(QUERIES["tpch_q3_shipping_priority"](SF))
    assert t.num_rows == 10
    rev = t.column("rev_micros").to_pylist()
    assert rev == sorted(rev, reverse=True)
    # keys unique (one row per order)
    keys = t.column("l_orderkey").to_pylist()
    assert len(set(keys)) == len(keys)


def test_q5_same_nation_only(ray_session):
    t = _table(QUERIES["tpch_q5_local_supplier_volume"](SF))
    assert t.num_rows >= 1
    assert set(t.column_names) == {"n_name", "rev_micros", "n"}
    assert all(v > 0 for v in t.column("rev_micros").to_pylist())


def test_q18_having_threshold(ray_session):
    t = _table(QUERIES["tpch_q18_large_volume_customers"](SF))
    assert t.num_rows >= 1
    assert min(t.column("qty").to_pylist()) > 150
    # one row per qualifying order
    keys = t.column("l_orderkey").to_pylist()
    assert len(set(keys)) == len(keys)


def test_markov_rows_are_probability_distributions(ray_session):
    t = _table(QUERIES["event_transitions_markov"](SF))
    assert t.num_rows >= 1
    prev = t.column("prev_type").to_pylist()
    prob = np.asarray(t.column("prob6").to_pylist())
    cnt = np.asarray(t.column("cnt").to_pylist())
    assert (cnt > 0).all()
    for p in set(prev):
        mask = np.array([x == p for x in prev])
        # rounded-to-6 probabilities sum to 1 within rounding slack
        assert abs(prob[mask].sum() - 1.0) < 1e-4


def test_label_centroid_cosine_bounds(ray_session):
    t = _table(QUERIES["label_centroid_cosine_embeddings"](SF))
    # 10 labels -> 45 unordered pairs, every cosine in [-1, 1]
    assert t.num_rows == 45
    cos = t.column("cos6").to_pylist()
    assert all(-1.0 <= c <= 1.0 for c in cos)
    pairs = list(zip(t.column("label_a").to_pylist(), t.column("label_b").to_pylist()))
    assert all(a < b for a, b in pairs)
    assert len(set(pairs)) == 45


def test_adpcm_contract_matches_decodability(ray_session):
    t = _table(QUERIES["audio_adpcm_transcode_contract"](SF))
    assert t.num_rows == 1500
    # exactly the two planted undecodable classes fail (6 rows at n=1500)
    assert t.column("adpcm_ok").to_pylist().count(False) == 6


def test_key_skew_audit_consistency(ray_session):
    t = _table(QUERIES["key_skew_audit_lineitem"](SF))
    r = t.to_pylist()[0]
    assert r["min_cnt"] <= r["p50_cnt"] <= r["p99_cnt"] <= r["max_cnt"]
    assert r["n_keys"] > 0


def test_welch_t_matches_direct_computation(ray_session):
    import pyarrow.parquet as pq

    t = _table(QUERIES["welch_ttest_lineitem"](SF))
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_linestatus", "l_quantity", "l_returnflag"])
    df_status = li.column("l_linestatus").to_pylist()
    q = np.round(np.asarray(li.column("l_quantity").to_pylist()))
    flag = np.asarray([f == "R" for f in li.column("l_returnflag").to_pylist()])
    for row in t.to_pylist():
        mask = np.array([s == row["l_linestatus"] for s in df_status])
        a, b = q[mask & flag], q[mask & ~flag]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        expect = (a.mean() - b.mean()) / np.sqrt(va / len(a) + vb / len(b))
        assert abs(row["t6"] - expect) < 1e-5


def test_minmax_scale_range(ray_session):
    t = _table(QUERIES["minmax_scale_events"](SF))
    s = np.asarray(t.column("scaled6").to_pylist())
    assert len(s) == 1000
    assert s.min() >= 0.0 and s.max() <= 1.0
    # each type hits both bounds (min->0, max->1)
    types = t.column("event_type").to_pylist()
    for ty in set(types):
        vals = s[np.array([x == ty for x in types])]
        assert vals.min() == 0.0 and vals.max() == 1.0


def test_mom_change_first_month_null(ray_session):
    t = _table(QUERIES["mom_change_events"](SF))
    rows = sorted(t.to_pylist(), key=lambda r: (r["event_type"], r["window"]))
    seen = set()
    for r in rows:
        first = r["event_type"] not in seen
        seen.add(r["event_type"])
        assert (r["delta_cents"] is None) == first


def test_q10_top20_sorted(ray_session):
    t = _table(QUERIES["tpch_q10_returned_items"](SF))
    assert 0 < t.num_rows <= 20
    rev = t.column("rev_micros").to_pylist()
    assert rev == sorted(rev, reverse=True)


def test_q19_scalar_consistent(ray_session):
    t = _table(QUERIES["tpch_q19_disjunctive_revenue"](SF))
    r = t.to_pylist()[0]
    assert (r["revenue_micros"] > 0) == (r["n_lineitems"] > 0)


def test_q6_and_q14_scalars(ray_session):
    q6 = _table(QUERIES["tpch_q6_forecast_revenue"](SF)).to_pylist()[0]
    assert q6["revenue_4dp"] >= 0
    q14 = _table(QUERIES["tpch_q14_promo_share"](SF)).to_pylist()[0]
    assert 0.0 <= q14["promo_share6"] <= 100.0
    assert q14["promo_rev_micros"] <= q14["total_rev_micros"]


def test_gap_median_positive(ray_session):
    t = _table(QUERIES["interevent_gap_median_events"](SF))
    assert t.num_rows >= 1
    assert all(v >= 0 for v in t.column("q_50").to_pylist())


def test_calendar_profiles_cover_domain(ray_session):
    h = _table(QUERIES["hour_profile_events"](SF))
    assert set(h.column("hour").to_pylist()) <= set(range(24))
    w = _table(QUERIES["weekday_profile_orders"](SF))
    assert set(w.column("isodow").to_pylist()) <= set(range(1, 8))
    # counts re-sum to the full table sizes
    assert sum(h.column("n").to_pylist()) == 1000
    assert sum(w.column("n").to_pylist()) == 1500


def test_zipf_slope_negative(ray_session):
    t = _table(QUERIES["zipf_slope_documents"](SF)).to_pylist()[0]
    # term frequencies decay with rank => negative slope
    assert t["n_terms"] > 10 and t["slope6"] < 0
