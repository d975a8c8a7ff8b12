"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation-suite pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column
names, so the driver's sorted-column value-hash matches).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: the full scalar + uniqueness +
    referential validation suite over the TPC-H-ish tables, one unioned
    violations Dataset out."""
    from fs_schema_validator_ray.pipelines import queries as q

    parts = [
        q.scalar_lineitem(SF0001),
        q.scalar_orders(SF0001),
        q.scalar_part(SF0001),
        q.scalar_customer(SF0001),
        q.unique_lineitem_orderkey(SF0001),
        q.referential_lineitem_supplier(SF0001),
    ]
    return reduce(lambda a, b: a.union(b), parts)


def queries() -> dict[str, Callable[[str], Any]]:
    from fs_schema_validator_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "nearest_centroid_confusion_embeddings": r"""
WITH u AS (
  SELECT vec_id, label,
         CAST(GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS INT) AS pos,
         CAST(round_even(CAST(UNNEST(embedding) AS DOUBLE) * 1048576.0, 0)
              AS BIGINT) AS q
  FROM embeddings),
c AS (SELECT label AS clabel, pos, SUM(q) AS s FROM u GROUP BY 1, 2),
cn AS (SELECT clabel, SUM(CAST(s AS HUGEINT) * s) AS n2 FROM c GROUP BY 1),
qn AS (SELECT vec_id,
              SUM(CAST(q AS DOUBLE) * CAST(q AS DOUBLE)) AS q2
       FROM u GROUP BY 1),
d AS (SELECT u.vec_id, c.clabel, SUM(CAST(u.q AS HUGEINT) * c.s) AS dot
      FROM u JOIN c ON u.pos = c.pos GROUP BY 1, 2),
sc AS (SELECT d.vec_id, d.clabel,
              CAST(d.dot AS DOUBLE)
                / (SQRT(qn.q2) * SQRT(CAST(cn.n2 AS DOUBLE))) AS cosv
       FROM d JOIN qn USING (vec_id) JOIN cn USING (clabel)),
pick AS (SELECT vec_id, clabel,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cosv DESC, clabel ASC) AS rn
         FROM sc)
SELECT e.label, CAST(p.clabel AS INT) AS assigned, COUNT(*) AS n
FROM pick p JOIN embeddings e ON p.vec_id = e.vec_id
WHERE p.rn = 1
GROUP BY 1, 2
""",
        "cumulative_daily_share_events": r"""
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS "window",
         COUNT(*) AS n
  FROM events GROUP BY 1)
SELECT "window", n,
       CAST(SUM(n) OVER (ORDER BY "window") AS BIGINT) AS cum_n,
       round_even(CAST(SUM(n) OVER (ORDER BY "window") AS DOUBLE)
                  / CAST(SUM(n) OVER () AS DOUBLE), 6) AS cum_share6
FROM d
""",
        "tpch_q19_disjunctive_revenue": r"""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 10000) AS BIGINT)), 0) AS BIGINT)
         AS revenue_micros,
       COUNT(*) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 25 AND 50)
""",
        "weekday_profile_orders": r"""
SELECT o_orderpriority, CAST(isodow(o_orderdate) AS INT) AS isodow,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2
""",
        "interevent_gap_median_events": r"""
WITH s AS (
  SELECT user_id,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap
  FROM events),
g AS (SELECT user_id, gap FROM s WHERE gap IS NOT NULL)
SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS q_50
FROM g GROUP BY user_id
""",
        "tpch_q10_returned_items": r"""
WITH r AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS rev_micros
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY o.o_custkey)
SELECT r.o_custkey, c.c_name, c.c_nationkey,
       CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       r.rev_micros
FROM r JOIN customer c ON r.o_custkey = c.c_custkey
ORDER BY r.rev_micros DESC, r.o_custkey ASC
LIMIT 20
""",
        "zipf_slope_documents": r"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
top AS (SELECT c,
               ROW_NUMBER() OVER (ORDER BY c DESC, t ASC) AS r
        FROM cnt ORDER BY c DESC, t ASC LIMIT 200),
-- integer-anchored OLS: each ln term quantized to int64 with the same
-- round_even(ln*1e6) kernel the engine calls through duckdb, then exact
-- (order-independent) integer sums; each cast operand fits int64 so the
-- HUGEINT->DOUBLE casts are single correctly-rounded conversions
q AS (SELECT CAST(round_even(ln(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT) AS lx,
             CAST(round_even(ln(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT) AS ly
      FROM top),
s AS (SELECT COUNT(*) AS n,
             SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM q)
SELECT n AS n_terms,
       round_even((CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                  / NULLIF(CAST(n * sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE), 0),
                  6) AS slope6,
       round_even((CAST(sy AS DOUBLE)
                   - ((CAST(n * sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE))
                      / NULLIF(CAST(n * sxx AS DOUBLE)
                               - CAST(sx * sx AS DOUBLE), 0))
                     * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 1000000.0), 6) AS intercept6
FROM s
""",
        "tpch_q6_forecast_revenue": r"""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_4dp
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
        "tpch_q14_promo_share": r"""
WITH m AS (
  SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                  THEN CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_rev_micros,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS total_rev_micros
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00')
SELECT promo_rev_micros, total_rev_micros,
       round_even(100.0 * CAST(promo_rev_micros AS DOUBLE)
                  / CAST(total_rev_micros AS DOUBLE), 6) AS promo_share6
FROM m
""",
        "hour_profile_events": r"""
SELECT event_type, CAST(hour(ts) AS INT) AS hour, COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
        "tpch_q4_order_priority": r"""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
        "minmax_scale_events": r"""
WITH c AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (
  SELECT event_id, event_type, cents,
         MIN(cents) OVER (PARTITION BY event_type) AS lo,
         MAX(cents) OVER (PARTITION BY event_type) AS hi
  FROM c)
SELECT event_id, event_type,
       CASE WHEN hi > lo
            THEN round_even((CAST(cents AS DOUBLE) - CAST(lo AS DOUBLE))
                            / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)), 6)
            ELSE 0.0 END AS scaled6
FROM b
""",
        "mom_change_events": r"""
WITH m AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS "window", event_type,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2),
l AS (
  SELECT "window", event_type, value_cents,
         LAG(value_cents) OVER (PARTITION BY event_type ORDER BY "window")
           AS prev_cents
  FROM m)
SELECT "window", event_type, value_cents,
       value_cents - prev_cents AS delta_cents,
       CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
            THEN round_even(CAST(value_cents - prev_cents AS DOUBLE)
                            / CAST(prev_cents AS DOUBLE), 6)
            END AS pct6
FROM l
""",
        "welch_ttest_lineitem": r"""
WITH m AS (
  SELECT l_linestatus,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(round(l_quantity) AS BIGINT)
                            * CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS ss_a,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN 0 ELSE CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS s_b,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN 0 ELSE CAST(round(l_quantity) AS BIGINT)
                                   * CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS ss_b
  FROM lineitem GROUP BY l_linestatus)
SELECT l_linestatus, n_a, n_b,
       round_even(
         (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / SQRT(
             ((CAST(ss_a AS DOUBLE)
               - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
              / CAST(n_a - 1 AS DOUBLE)) / CAST(n_a AS DOUBLE)
             + ((CAST(ss_b AS DOUBLE)
                 - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                / CAST(n_b - 1 AS DOUBLE)) / CAST(n_b AS DOUBLE)),
         6) AS t6
FROM m WHERE n_a >= 2 AND n_b >= 2
""",
        "key_skew_audit_lineitem": r"""
WITH c AS (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
SELECT COUNT(*) AS n_keys,
       CAST(MIN(cnt) AS BIGINT) AS min_cnt,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       CAST(quantile_disc(cnt, 0.5) AS BIGINT) AS p50_cnt,
       CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt
FROM c
""",
        "label_centroid_cosine_embeddings": r"""
WITH u AS (
  SELECT label,
         CAST(GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS INT) AS pos,
         CAST(round_even(CAST(UNNEST(embedding) AS DOUBLE) * 1048576.0, 0)
              AS BIGINT) AS q
  FROM embeddings),
s AS (SELECT label, pos, SUM(q) AS s FROM u GROUP BY 1, 2),
p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         SUM(CAST(a.s AS HUGEINT) * b.s) AS dot
  FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2),
n AS (SELECT label, SUM(CAST(s AS HUGEINT) * s) AS n2 FROM s GROUP BY 1)
SELECT p.label_a, p.label_b,
       round_even(CAST(p.dot AS DOUBLE)
                  / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))),
                  6) AS cos6
FROM p JOIN n na ON p.label_a = na.label JOIN n nb ON p.label_b = nb.label
""",
        "audio_adpcm_transcode_contract": r"""
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS adpcm_ok
FROM src
""",
        "tpch_q3_shipping_priority": r"""
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS rev_micros
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY rev_micros DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
        "tpch_q5_local_supplier_volume": r"""
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS rev_micros,
       COUNT(*) AS n
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
        "tpch_q18_large_volume_customers": r"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 150)
SELECT c.c_name, o.o_custkey, b.l_orderkey, o.o_orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents,
       b.qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
        "event_transitions_markov": r"""
WITH s AS (
  SELECT event_type AS prev_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
c AS (
  SELECT prev_type, next_type, COUNT(*) AS cnt
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, cnt,
       round_even(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY prev_type), 6)
         AS prob6
FROM c
""",
        # LSH recall contracts: identical text => identical MinHash
        # signature / SimHash — the planted verbatim copies MUST come
        # back as pairs at similarity exactly 1.0 (see
        # minhash_planted_contract / simhash_planted_contract)
        "activity_islands_events": r"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS epoch_day
  FROM events WHERE ts IS NOT NULL),
g AS (
  SELECT user_id, epoch_day,
         epoch_day - row_number() OVER (PARTITION BY user_id ORDER BY epoch_day)
           AS grp
  FROM d)
SELECT user_id, MIN(epoch_day) AS island_start, MAX(epoch_day) AS island_end,
       COUNT(*) AS island_len
FROM g GROUP BY user_id, grp
""",
        "per_key_sample_events": r"""
WITH h AS (
  SELECT user_id, event_id,
         ((xor((event_id * 2654435761) % 4294967296,
               ((event_id * 2654435761) % 4294967296) // 65536)) * 40503)
         % 4294967296 AS hk
  FROM events)
SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY hk, event_id) AS rn
  FROM h) WHERE rn <= 5
""",
        "kendall_tau_events": r"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS x,
         CAST(ROUND(value*100) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
p AS (
  SELECT a.user_id AS k,
         COUNT(*) AS n0,
         SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
             THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
             THEN 1 ELSE 0 END) AS d
  FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
  GROUP BY 1),
cnt AS (SELECT user_id AS k, COUNT(*) AS n FROM e GROUP BY 1)
SELECT cnt.k AS user_id, cnt.n,
       CAST(COALESCE(p.c - p.d, 0) AS BIGINT) AS con_minus_dis,
       CASE WHEN p.n0 - p.n1 > 0 AND p.n0 - p.n2 > 0
            THEN ROUND((p.c - p.d) / sqrt(CAST((p.n0-p.n1)*(p.n0-p.n2) AS DOUBLE)), 6)
            ELSE NULL END AS tau_b
FROM cnt LEFT JOIN p ON cnt.k = p.k
""",
        "rolling_median_events": r"""
SELECT event_id, user_id,
  ROUND(median(CAST(ROUND(value*100) AS BIGINT)) OVER (
     PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS median5_value_cents
FROM events
""",
        "audio_loudness_contract": r"""
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS decode_ok,
       CAST(CASE WHEN s % 509 IN (17, 101, 233) THEN NULL
                 WHEN s % 9 = 4 THEN 0 ELSE 1 END AS BIGINT) AS loud_i
FROM src
""",
        "auto_join_lineitem_part": r"""
SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, p.p_brand, p.p_size
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""",
        "auto_join_shuffle_orders_customer": r"""
SELECT o.o_custkey, o.o_orderkey, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
        # SemDeDup planted-duplicate contract: identical vector => same
        # cluster => the ascending-id greedy prune drops the later copy
        "semdedup_contract_embeddings": r"""
SELECT vec_id + 1000000 AS vec_id, CAST(false AS BOOLEAN) AS keep
FROM embeddings WHERE vec_id % 7 = 0
""",
        "minhash_planted_contract": r"""
SELECT doc_id AS a, doc_id + 10000000 AS b, CAST(1.0 AS DOUBLE) AS similarity
FROM documents WHERE doc_id % 10 = 0
""",
        "simhash_planted_contract": r"""
SELECT doc_id AS a, doc_id + 10000000 AS b, CAST(1.0 AS DOUBLE) AS similarity
FROM documents WHERE doc_id % 10 = 0
""",
        "geo_harmonic_lineitem": r"""
WITH c AS (
  SELECT l_returnflag AS k, l_quantity AS v, COUNT(*) AS cnt
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2)
SELECT k AS l_returnflag,
       CAST(SUM(cnt) AS BIGINT) AS n,
       ROUND(exp(SUM(cnt * ln(CAST(v AS DOUBLE))) / SUM(cnt)), 6) AS geomean6,
       ROUND(CAST(SUM(cnt) AS DOUBLE) / SUM(cnt / CAST(v AS DOUBLE)), 6) AS harmonic6
FROM c GROUP BY k
""",
        "mutual_information_documents": r"""
WITH c AS (
  SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
t AS (
  SELECT lang, source, cnt,
         SUM(cnt) OVER (PARTITION BY lang) AS row_tot,
         SUM(cnt) OVER (PARTITION BY source) AS col_tot,
         SUM(cnt) OVER () AS n
  FROM c)
SELECT lang, source, cnt AS observed,
       ROUND(ln(CAST(cnt AS DOUBLE) * n / (row_tot * col_tot)), 6) AS pmi6,
       ROUND(CAST(cnt AS DOUBLE) / n
             * ln(CAST(cnt AS DOUBLE) * n / (row_tot * col_tot)), 6) AS mi_contrib6
FROM t
""",
        "tpch_q1_pricing_summary": r"""
WITH m AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_tax * 100) AS BIGINT) AS x
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 6) AS sum_base_price,
       ROUND(CAST(SUM(cents * (100 - d)) AS DOUBLE) / 1e4, 6) AS sum_disc_price,
       ROUND(CAST(SUM(cents * (100 - d) * (100 + x)) AS DOUBLE) / 1e6, 6) AS sum_charge,
       ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(cents) AS DOUBLE) / (COUNT(*) * 100.0), 6) AS avg_price,
       ROUND(CAST(SUM(d) AS DOUBLE) / (COUNT(*) * 100.0), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM m GROUP BY l_returnflag, l_linestatus
""",
        "mannwhitney_lineitem": r"""
WITH c AS (
  SELECT l_linestatus AS g, l_quantity AS v,
         COUNT(*) FILTER (WHERE l_returnflag = 'R') AS cnt_a,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT g, cnt_a, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS le
  FROM c)
SELECT g AS l_linestatus,
       CAST(SUM(cnt_a) AS BIGINT) AS n_a,
       CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
       CAST(SUM(cnt_a * (1 + lt + le))
            - SUM(cnt_a) * (SUM(cnt_a) + 1) AS BIGINT) AS u2_a,
       CAST(2 * SUM(cnt_a) * SUM(cnt - cnt_a)
            - (SUM(cnt_a * (1 + lt + le))
               - SUM(cnt_a) * (SUM(cnt_a) + 1)) AS BIGINT) AS u2_b
FROM r GROUP BY g
""",
        "triangles_parts": r"""
WITH e AS (
  SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) AS a,
                  GREATEST(l1.l_partkey, l2.l_partkey) AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
n AS (
  SELECT x AS node FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t)
SELECT node, COUNT(*) AS triangles FROM n GROUP BY node
""",
        "funnel_events": r"""
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1)
SELECT s1.user_id,
       1 + CAST(s2.t2 IS NOT NULL AS BIGINT)
         + CAST(s3.t3 IS NOT NULL AS BIGINT) AS steps_completed,
       s1.t1, s2.t2, s3.t3
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
""",
        "cohort_retention_events": r"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
c AS (SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY 1)
SELECT c.cohort, uw.week - c.cohort AS week_offset, COUNT(*) AS n_users
FROM uw JOIN c USING (user_id) GROUP BY 1, 2
""",
        "gapfill_events_daily": r"""
WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT event_type, day, COUNT(*) AS n FROM e GROUP BY 1, 2),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
cal AS (SELECT b.lo + u.x AS day
        FROM b, (SELECT unnest(range(0, 100000)) AS x) u
        WHERE u.x <= b.hi - b.lo),
types AS (SELECT DISTINCT event_type FROM e)
SELECT t.event_type, cal.day, COALESCE(c.n, 0) AS n
FROM types t CROSS JOIN cal
LEFT JOIN c ON c.event_type = t.event_type AND c.day = cal.day
""",
        "tfidf_cosine_pairs_documents": r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok WHERE token <> '' GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS w
  FROM tf JOIN df USING (token) CROSS JOIN n
  WHERE df.df BETWEEN 2 AND 50),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
wn AS (SELECT w.doc_id, w.token, w.w / nrm.nrm AS wn
       FROM w JOIN nrm USING (doc_id) WHERE nrm.nrm > 0),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.wn * b.wn) AS cos
  FROM wn a JOIN wn b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, ROUND(cos, 6) AS cos6 FROM p WHERE cos >= 0.3
""",
        "psi_nchars_by_source": r"""
WITH v AS (SELECT source, LEAST(n_chars // 64, 9) AS bin FROM documents),
c AS (SELECT source, bin, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
tot AS (SELECT source, SUM(cnt) AS t FROM c GROUP BY 1),
g AS (SELECT bin, SUM(cnt) AS gcnt FROM c GROUP BY 1),
gt AS (SELECT SUM(gcnt) AS gt FROM g),
grid AS (
  SELECT s.source, b.bin
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN (SELECT DISTINCT bin FROM g) b),
pq AS (
  SELECT grid.source,
         GREATEST(COALESCE(c.cnt, 0) / CAST(tot.t AS DOUBLE), 1e-6) AS p,
         GREATEST(g.gcnt / CAST(gt.gt AS DOUBLE), 1e-6) AS q
  FROM grid
  LEFT JOIN c ON c.source = grid.source AND c.bin = grid.bin
  JOIN tot ON tot.source = grid.source
  JOIN g ON g.bin = grid.bin
  CROSS JOIN gt)
SELECT source, ROUND(SUM((p - q) * ln(p / q)), 6) AS psi6 FROM pq GROUP BY 1
""",
        "audio_levels_contract": r"""
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS decode_ok,
       CAST(CASE WHEN s % 509 IN (17, 101) THEN NULL
                 WHEN s % 509 = 233 THEN 0
                 WHEN s % 7 = 3 THEN 1 ELSE 0 END AS BIGINT) AS clipped,
       CAST(CASE WHEN s % 509 IN (17, 101) THEN NULL
                 WHEN s % 509 = 233 THEN 1
                 WHEN s % 11 = 5 THEN 0 ELSE 1 END AS BIGINT) AS dc_ok
FROM src
""",
        "chi2_events_type_bucket": r"""
WITH c AS (
  SELECT event_type, user_id % 8 AS cohort, COUNT(*) AS observed
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT a.event_type, b.cohort
  FROM (SELECT DISTINCT event_type FROM c) a
  CROSS JOIN (SELECT DISTINCT cohort FROM c) b),
g AS (
  SELECT grid.event_type, grid.cohort, COALESCE(c.observed, 0) AS observed
  FROM grid LEFT JOIN c USING (event_type, cohort)),
tot AS (SELECT CAST(SUM(observed) AS DOUBLE) AS n FROM g),
ra AS (SELECT event_type, CAST(SUM(observed) AS DOUBLE) AS rt FROM g GROUP BY 1),
cb AS (SELECT cohort, CAST(SUM(observed) AS DOUBLE) AS ct FROM g GROUP BY 1),
e AS (
  SELECT g.event_type, g.cohort, g.observed,
         ra.rt * cb.ct / tot.n AS expected
  FROM g JOIN ra USING (event_type) JOIN cb USING (cohort) CROSS JOIN tot)
SELECT event_type, cohort, observed,
       ROUND(expected, 6) AS expected6,
       ROUND(((observed - expected) * (observed - expected)) / expected, 6) AS contrib6
FROM e
""",
        "pack_documents_chars": r"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id // 512 AS shard, n_chars,
         ROW_NUMBER() OVER (PARTITION BY doc_id // 512 ORDER BY doc_id) AS rn
  FROM documents),
r AS (
  SELECT shard, rn, doc_id, CAST(0 AS BIGINT) AS bin, n_chars AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id,
         CASE WHEN r.fill + d.n_chars > 4096 THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.fill + d.n_chars > 4096 THEN d.n_chars
              ELSE r.fill + d.n_chars END
  FROM r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1)
SELECT doc_id, shard, bin, fill FROM r
""",
        "embedding_validate_contract": r"""
WITH m AS (
  SELECT vec_id,
         CASE WHEN vec_id % 97 = 13
              THEN list_slice(embedding, 1, len(embedding) - 3)
              ELSE embedding END AS v,
         NOT (vec_id % 89 = 7 AND vec_id % 97 <> 13) AS fin
  FROM embeddings)
SELECT vec_id, len(v) AS dim, len(v) = 64 AS dim_ok, fin AS finite_ok,
       CASE WHEN fin THEN
         ROUND(sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * x))), 6)
       END AS norm6
FROM m
""",
        "schema_drift_orders": r"""
WITH b AS (
  SELECT CASE WHEN o_orderkey % 211 = 5 THEN NULL
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders),
n AS (SELECT COUNT(*) AS n FROM orders),
zb AS (SELECT COUNT(*) - COUNT(o_orderstatus) AS z FROM b)
SELECT * FROM (VALUES
  ('o_channel',       'added',        CAST(NULL AS VARCHAR), 'string',
   CAST(NULL AS BIGINT), (SELECT n FROM n), CAST(NULL AS BIGINT), CAST(0 AS BIGINT)),
  ('o_custkey',       'common',       'int64', 'int64',
   (SELECT n FROM n), (SELECT n FROM n), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('o_orderdate',     'common',       'timestamp[us]', 'timestamp[us]',
   (SELECT n FROM n), (SELECT n FROM n), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('o_orderkey',      'common',       'int64', 'int64',
   (SELECT n FROM n), (SELECT n FROM n), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('o_orderpriority', 'removed',      'string', CAST(NULL AS VARCHAR),
   (SELECT n FROM n), CAST(NULL AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT)),
  ('o_orderstatus',   'common',       'string', 'string',
   (SELECT n FROM n), (SELECT n FROM n), CAST(0 AS BIGINT), (SELECT z FROM zb)),
  ('o_totalprice',    'type_changed', 'double', 'int64',
   (SELECT n FROM n), (SELECT n FROM n), CAST(0 AS BIGINT), CAST(0 AS BIGINT))
) t("column", status, dtype_a, dtype_b, n_a, n_b, nulls_a, nulls_b)
""",
        "wav_header_contract": r"""
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS header_ok,
       CAST(CASE WHEN s % 509 IN (17, 101) THEN NULL
                 WHEN s % 509 IN (59, 373) THEN 0 ELSE 1 END AS BIGINT)
         AS declared_match,
       CAST(CASE WHEN s % 509 IN (17, 101) THEN NULL
                 ELSE 1 END AS BIGINT) AS rate_ok
FROM src
""",
        "winsorize_orders_totalprice": r"""
WITH c AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
b AS (SELECT quantile_disc(cents, 0.015625) AS lo,
             quantile_disc(cents, 0.984375) AS hi FROM c)
SELECT o_orderkey, cents,
       LEAST(GREATEST(cents, lo), hi) AS cents_w,
       CAST(cents < lo OR cents > hi AS BIGINT) AS clipped
FROM c CROSS JOIN b
""",
        "scalar_lineitem": """
SELECT CAST(l_orderkey AS VARCHAR) AS "key", 'qty_range' AS rule_id,
       '`l_quantity`: Input should be less than or equal to 30' AS reason
FROM lineitem WHERE l_quantity > 30
UNION ALL
SELECT CAST(l_orderkey AS VARCHAR), 'qty_range',
       '`l_quantity`: Input should be greater than or equal to 1'
FROM lineitem WHERE l_quantity < 1
UNION ALL
SELECT CAST(l_orderkey AS VARCHAR), 'discount_max',
       '`l_discount`: Input should be less than or equal to 0.07'
FROM lineitem WHERE l_discount > 0.07
UNION ALL
SELECT CAST(l_orderkey AS VARCHAR), 'returnflag_enum',
       '`l_returnflag`: Input should be ''A'' or ''N'' or ''R'''
FROM lineitem WHERE l_returnflag NOT IN ('A','N','R')
""",
        "scalar_orders": """
SELECT CAST(o_orderkey AS VARCHAR) AS "key", 'status_enum' AS rule_id,
       '`o_orderstatus`: Input should be ''O'' or ''F''' AS reason
FROM orders WHERE o_orderstatus NOT IN ('O','F')
UNION ALL
SELECT CAST(o_orderkey AS VARCHAR), 'totalprice_min',
       '`o_totalprice`: Input should be greater than 0'
FROM orders WHERE o_totalprice <= 0
""",
        "scalar_part": """
SELECT CAST(p_partkey AS VARCHAR) AS "key", 'name_len' AS rule_id,
       '`p_name`: String should have at most 9 characters' AS reason
FROM part WHERE length(p_name) > 9
UNION ALL
SELECT CAST(p_partkey AS VARCHAR), 'size_range',
       '`p_size`: Input should be less than or equal to 50'
FROM part WHERE p_size > 50
UNION ALL
SELECT CAST(p_partkey AS VARCHAR), 'size_range',
       '`p_size`: Input should be greater than or equal to 1'
FROM part WHERE p_size < 1
""",
        "scalar_customer": """
SELECT CAST(c_custkey AS VARCHAR) AS "key", 'name_shape' AS rule_id,
       '`c_name`: String should match pattern ''^Customer#[0-9]{9}$''' AS reason
FROM customer WHERE NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'acctbal_max',
       '`c_acctbal`: Input should be less than or equal to 9000'
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'nation_range',
       '`c_nationkey`: Input should be less than or equal to 24'
FROM customer WHERE c_nationkey > 24
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'nation_range',
       '`c_nationkey`: Input should be greater than or equal to 0'
FROM customer WHERE c_nationkey < 0
""",
        "json_events_props": """
SELECT CAST(event_id AS VARCHAR) AS "key", 'props_spec' AS rule_id,
       '`props`: k: Input should be less than or equal to 80' AS reason
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 80
UNION ALL
SELECT CAST(event_id AS VARCHAR), 'props_spec',
       '`props`: k: Input should be greater than or equal to 0'
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 0
""",
        "unique_lineitem_orderkey": """
SELECT CAST(l_orderkey AS VARCHAR) AS "key", 'unique_l_orderkey' AS rule_id,
       'duplicate key (appears ' || CAST(cnt AS VARCHAR) || ' times)' AS reason
FROM (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(*) > 1)
""",
        "referential_lineitem_supplier": """
SELECT CAST(l_suppkey AS VARCHAR) AS "key", 'ref_l_suppkey' AS rule_id,
       'does not exist in manifest `supplier`' AS reason
FROM lineitem
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 90)
""",
        "stats_lineitem": """
SELECT 'l_quantity' AS col, COUNT(*) AS n, COUNT(*) - COUNT(l_quantity) AS nulls,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v, CAST(MAX(l_quantity) AS DOUBLE) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
FROM lineitem
""",
        "agg_events_by_type": """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type
""",
        "agg_events_by_user": """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
""",
        "pivot_events_user_type": """
SELECT user_id,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS click_cents,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS view_cents,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS purchase_cents,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS signup_cents,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS error_cents,
  COUNT(*) AS n
FROM events GROUP BY user_id
""",
        "topk_events_users": """
SELECT user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
ORDER BY value_cents DESC, user_id LIMIT 20
""",
        "topk_per_event_type": """
SELECT event_type, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
FROM (SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC,
                                         event_id) AS rn
      FROM events) t
WHERE rn <= 3
""",
        "revenue_by_segment": """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_micros,
       COUNT(*) AS n
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        "windowed_events_daily": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS "window", event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
        "count_distinct_user_type": """
SELECT COUNT(*) AS n_distinct
FROM (SELECT DISTINCT user_id, event_type FROM events)
""",
        "orders_above_customer_avg": """
WITH c AS (SELECT o_orderkey, o_custkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
a AS (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS sum_cents,
             COUNT(*) AS n
      FROM c GROUP BY o_custkey)
SELECT c.o_orderkey, c.o_custkey, c.cents
FROM c JOIN a USING (o_custkey)
WHERE c.cents * a.n > a.sum_cents
""",
        "pushdown_filter_lineitem": """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_cents
FROM lineitem WHERE l_quantity > 45
""",
        "windowed_events_monthly": """
SELECT strftime(date_trunc('month', ts), '%Y-%m') AS "window", event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
        "windowed_events_weekly": """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS "window", event_type,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
        "setop_union_all_keys": """
SELECT o_custkey FROM orders UNION ALL SELECT user_id FROM events
""",
        "sessionize_events": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
     flagged AS (
       SELECT user_id, ts_us,
              CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                        > 30 * 60 * 1000000 OR
                   LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                   THEN 1 ELSE 0 END AS new_session
       FROM e),
     sess AS (
       SELECT user_id, ts_us,
              SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                     ROWS UNBOUNDED PRECEDING) AS sid
       FROM flagged)
SELECT user_id, MIN(ts_us) AS session_start, MAX(ts_us) AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
        "asof_events_orders": """
SELECT e.event_id, epoch_ms(o.o_orderdate) AS order_ts_ms
FROM events e ASOF JOIN orders o
ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
        "semi_join_composite_events": """
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE e.value > 50 AND EXISTS (
  SELECT 1 FROM events l
  WHERE l.value <= 50 AND l.user_id = e.user_id
    AND l.event_type = e.event_type)
""",
        "asof_tolerance_events_orders": """
WITH m AS (
  SELECT e.event_id, epoch_ms(o.o_orderdate) AS order_ts_ms,
         epoch_us(o.o_orderdate) AS order_ts_us,
         epoch_us(e.ts) AS ts_us
  FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
SELECT event_id, order_ts_ms FROM m
WHERE ts_us - order_ts_us <= CAST(8500 AS BIGINT) * 24 * 3600 * 1000000
""",
        # nearest as-of: integer epoch_us distance argmin, backward
        # preferred on ties (events ts are microsecond-unique per user)
        "asof_nearest_events_orders": """
SELECT o_orderkey, event_id FROM (
  SELECT o.o_orderkey, e.event_id,
         ROW_NUMBER() OVER (
           PARTITION BY o.o_orderkey
           ORDER BY ABS(epoch_us(e.ts) - epoch_us(o.o_orderdate)),
                    CASE WHEN e.ts <= o.o_orderdate THEN 0 ELSE 1 END,
                    e.event_id) AS rn
  FROM orders o JOIN events e ON o.o_custkey = e.user_id)
WHERE rn = 1
""",
        "asof_forward_events_orders": """
SELECT o.o_orderkey, e.event_id
FROM orders o ASOF JOIN events e
ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
""",
        "range_join_events_attribution": """
SELECT p.event_id AS purchase_id, k.event_id AS click_id,
       epoch_us(k.ts) AS click_ts_us
FROM events p JOIN events k
  ON p.user_id = k.user_id
 AND p.event_type = 'purchase' AND k.event_type = 'click'
 AND p.ts >= k.ts AND p.ts < k.ts + INTERVAL 60 MINUTE
""",
        "broadcast_join_events_customer": """
SELECT e.event_id, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
        "distinct_part_brands": """
SELECT DISTINCT p_brand FROM part
""",
        "sample_orders_mod": """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 16 = 0
""",
        "stratified_sample_events": """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn % 20 = 1
""",
        "hash_join_lineitem_orders": """
SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
        "left_join_customer_orders": """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
""",
        "right_join_orders_customer": """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
        "range_window_events": """
SELECT event_id, user_id,
       CAST(SUM(value_cents) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS win_value_cents
FROM (SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      FROM events)
""",
        "mode_event_type_per_user": """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2)
SELECT user_id, cnt, event_type, n FROM (
  SELECT user_id, cnt, event_type,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type DESC) AS rn
  FROM c) WHERE rn = 1
""",
        "distinct_users_by_type": """
SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1
""",
        "orderkeys_agg_per_customer": """
SELECT o_custkey,
       STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS vals,
       COUNT(o_orderkey) AS n
FROM orders GROUP BY 1
""",
        "entropy_lang_by_source": """
WITH c AS (SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang)
SELECT source, CAST(SUM(c) AS BIGINT) AS n,
       ROUND(LN(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE),
             6) AS entropy6
FROM c GROUP BY source
""",
        "histogram_orders_totalprice": """
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders)
SELECT CAST(FLOOR(CAST(v AS DOUBLE) / 2000000) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
FROM c GROUP BY 1
""",
        "latest_order_per_customer": """
SELECT o_custkey, o_orderdate, o_orderkey, n FROM (
  SELECT o_custkey, o_orderdate, o_orderkey,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) WHERE rn = 1
""",
        "composite_join_lineitem": """
SELECT l.l_orderkey, l.l_linenumber,
       CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS qty_cents,
       CAST(ROUND(r.l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem l
JOIN (SELECT * FROM lineitem WHERE l_discount > 0.05) r
  ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber
""",
        "prefiltered_join_events_customer": """
SELECT e.user_id, e.event_id,
       CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE c.c_acctbal > 9000.0
""",
        "salted_join_lineitem_orders": """
SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
        "rank_orders_per_customer": """
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderpriority, o_orderkey) AS rn,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS "rank",
       DENSE_RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderpriority) AS dense_rank
FROM orders
""",
        "join3_revenue_segment_priority": """
SELECT c.c_mktsegment, o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS rev_micros,
       COUNT(*) AS n
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderpriority
""",
        "diff_orders_snapshots": """
WITH old AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
novel AS (
  SELECT k, CASE WHEN k % 101 = 0 THEN cents + 100 ELSE cents END AS cents
  FROM old WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 1000000000 AS k, cents FROM old WHERE k % 89 = 0)
SELECT COALESCE(o.k, n.k) AS k,
       CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM old o FULL OUTER JOIN novel n ON o.k = n.k
WHERE o.k IS NULL OR n.k IS NULL OR o.cents IS DISTINCT FROM n.cents
""",
        "heavy_hitters_events": """
SELECT user_id, COUNT(*) AS cnt
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING COUNT(*) >=
  (SELECT (COUNT(user_id) + 124) // 125 FROM events)
""",
        "weighted_avg_discount_by_flag": """
SELECT l_returnflag,
       ROUND(
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                  * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
         / 100.0, 6) AS wavg_discount,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
        "cross_join_nation_region": """
SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name
FROM nation n CROSS JOIN region r
""",
        "fuzzy_join_part_names": """
WITH base AS (
  SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey % 4 = 0),
pert AS (
  SELECT p_partkey + 10000000 AS id,
         substr(p_name, 1, p_partkey % length(p_name)) ||
         substr(p_name, (p_partkey % length(p_name)) + 2) AS s
  FROM part WHERE p_partkey % 4 = 0),
u AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
SELECT x.id AS a, y.id AS b,
       CAST(levenshtein(x.s, y.s) AS BIGINT) AS dist
FROM u x JOIN u y
  ON x.id < y.id AND abs(length(x.s) - length(y.s)) <= 1
WHERE levenshtein(x.s, y.s) <= 1
""",
        "zscore_lineitem": """
SELECT l_orderkey, l_linenumber,
       ROUND((l_quantity - AVG(l_quantity) OVER ())
             / STDDEV_SAMP(l_quantity) OVER (), 6) AS z_l_quantity,
       ROUND((l_extendedprice - AVG(l_extendedprice) OVER ())
             / STDDEV_SAMP(l_extendedprice) OVER (), 6) AS z_l_extendedprice
FROM lineitem
""",
        "unigram_logprob_documents": """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT tok.doc_id,
       ROUND(SUM(ln(CAST(c AS DOUBLE) / n)) / COUNT(*), 6) AS logprob
FROM tok JOIN cnt USING (t) CROSS JOIN tot
GROUP BY tok.doc_id
""",
        "bigram_logprob_documents": """
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
tok AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS i FROM arr),
big AS (SELECT a.doc_id, a.t AS w1, b.t AS w2
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
cnt AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c) AS n FROM cnt GROUP BY w1)
SELECT big.doc_id,
       ROUND(SUM(ln(CAST(c AS DOUBLE) / n)) / COUNT(*), 6) AS logprob
FROM big JOIN cnt USING (w1, w2) JOIN ctx USING (w1)
GROUP BY big.doc_id
""",
        "sentence_split_documents": r"""
WITH arr AS (
  SELECT doc_id,
         string_split_regex(coalesce(text, ''), '[.!?]+\s+') AS a
  FROM documents),
frags AS (
  SELECT doc_id, unnest(a) AS sentence,
         generate_subscripts(a, 1) AS orig_idx
  FROM arr)
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY orig_idx) AS sent_idx,
       sentence,
       CAST(length(sentence) AS BIGINT) AS nchars
FROM frags WHERE sentence <> ''
""",
        "percent_rank_orders": """
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderpriority, o_orderkey) AS rn,
       RANK() OVER w AS "rank",
       DENSE_RANK() OVER w AS dense_rank,
       PERCENT_RANK() OVER w AS percent_rank,
       CUME_DIST() OVER w AS cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
""",
        "shift_orders_per_customer": """
SELECT o_orderkey, o_custkey,
       LEAD(cents, 1) OVER w AS lead_cents,
       FIRST_VALUE(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS first_cents,
       LAST_VALUE(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS last_cents
FROM (SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "full_join_customer_orders": """
SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
       c.c_mktsegment, o.o_orderkey
FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0) c
FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
""",
        "text_langid_documents": r"""
WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(t)), '\s+'),
                     x -> x <> '') AS toks,
         len(regexp_extract_all(t, '\S+')) AS n_tokens
  FROM base
),
sc AS (
  SELECT doc_id,
    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','eine','zu','mit','auf','für','von','im','den','des','sich','dem'))) AS DOUBLE) / GREATEST(n_tokens, 1) AS s_de,
    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for','on','with','as','was','at','by','an','be','this','are'))) AS DOUBLE) / GREATEST(n_tokens, 1) AS s_en,
    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','una','es','los','las','por','con','para','del','se','no','al'))) AS DOUBLE) / GREATEST(n_tokens, 1) AS s_es,
    CAST(len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','est','un','une','du','que','pour','dans','qui','sur','pas','au','ce'))) AS DOUBLE) / GREATEST(n_tokens, 1) AS s_fr,
    CAST(len(list_filter(toks, x -> x IN ('的','了','是','我','在','有','他','这','不','们','就','人','都','一个','上','也','和','要'))) AS DOUBLE) / GREATEST(n_tokens, 1) AS s_zh
  FROM tok
)
SELECT doc_id,
  CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) <= 0.0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS lang_pred,
  GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS lang_score
FROM sc
""",
        "text_quality_documents": r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
counts AS (
  SELECT doc_id,
         length(t) AS n_chars,
         len(regexp_extract_all(t, '\S+')) AS n_tokens,
         len(list_distinct(list_filter(
             string_split_regex(trim(t), '\s+'), x -> x <> ''))) AS nu_raw,
         len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
         len(regexp_extract_all(t, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(t, '[0-9]')) AS n_digit,
         len(regexp_extract_all(t, '[A-Za-z]')) AS n_alpha
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0 ELSE nu_raw END AS n_unique_tokens,
       n_bpe_tokens,
       CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE nu_raw END AS DOUBLE)
         / GREATEST(n_tokens, 1) AS ttr,
       CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1) AS punct_ratio,
       CAST(n_digit AS DOUBLE) / GREATEST(n_chars, 1) AS digit_ratio,
       CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1) AS alpha_ratio,
       CAST(n_chars - GREATEST(n_tokens - 1, 0) AS DOUBLE)
         / GREATEST(n_tokens, 1) AS mean_token_len,
       CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.35
         + LEAST(CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE nu_raw END AS DOUBLE)
                 / GREATEST(n_tokens, 1), 1.0) * 0.25
         + CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1) * 0.30
         + (1.0 - LEAST(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1) * 4.0,
                        1.0)) * 0.10
       END AS quality
FROM counts
""",
        "dedup_exact_documents": """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
""",
        "dedup_ngram_jaccard_documents": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents)
),
sh AS (
  SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ov AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT ov.a, ov.b,
       CAST(ov.i AS DOUBLE) / (sa.n + sb.n - ov.i) AS similarity
FROM ov
JOIN sz sa ON sa.doc_id = ov.a
JOIN sz sb ON sb.doc_id = ov.b
WHERE CAST(ov.i AS DOUBLE) / (sa.n + sb.n - ov.i) >= 0.7
""",
        "pack_documents": """
WITH d AS (SELECT doc_id, length(coalesce(text, '')) AS nchars FROM documents),
r AS (SELECT doc_id, nchars,
             CAST(SUM(nchars) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rn
      FROM d)
SELECT doc_id, nchars,
       (rn - nchars) // 4096 AS seq_id,
       (rn - nchars) % 4096 AS seq_offset
FROM r
""",
        "dedup_clusters_documents": """
WITH RECURSIVE toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents)
),
sh AS (
  SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ov AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT ov.a, ov.b FROM ov
  JOIN sz sa ON sa.doc_id = ov.a
  JOIN sz sb ON sb.doc_id = ov.b
  WHERE CAST(ov.i AS DOUBLE) / (sa.n + sb.n - ov.i) >= 0.7
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM cc GROUP BY node
""",
        "dedup_embedding_cosine": """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
""",
        "ann_topk_pq": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
     s AS (SELECT q.qid, e.vec_id AS nid,
                  list_cosine_similarity(q.qe, e.embedding) AS sc
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
SELECT qid AS query_id, nid AS neighbor_id, rnk AS "rank"
FROM (SELECT qid, nid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sc DESC, nid) AS rnk
      FROM s) t
WHERE rnk <= 10
""",
        "ann_topk_embeddings": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
     s AS (SELECT q.qid, e.vec_id AS nid,
                  list_cosine_similarity(q.qe, e.embedding) AS sc
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
SELECT qid AS query_id, nid AS neighbor_id, rnk AS "rank"
FROM (SELECT qid, nid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sc DESC, nid) AS rnk
      FROM s) t
WHERE rnk <= 10
""",
        "text_clean_documents": r"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(coalesce(text, ''),
                                            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]',
                                            '', 'g'),
                             '\s+', ' ', 'g'), ' ') AS clean_text
  FROM documents)
SELECT doc_id, clean_text, length(clean_text) AS n_chars_clean FROM c
""",
        "redact_pii_documents": r"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com via https://ex.net/p/' || CAST(doc_id AS VARCHAR)
           || ' or call +1 (555) 010-' || CAST(doc_id AS VARCHAR) || ' now' AS t
  FROM documents),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_urls,
              regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t
       FROM base),
s2 AS (SELECT doc_id, n_urls,
              len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
       FROM s1),
s3 AS (SELECT doc_id, n_urls, n_emails,
              len(regexp_extract_all(t, '\+?[0-9][0-9()\-\s]{7,}[0-9]')) AS n_phones,
              regexp_replace(t, '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g') AS t
       FROM s2)
SELECT doc_id, n_urls, n_emails, n_phones, t AS redacted_text FROM s3
""",
        "rollup_lineitem_status": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
        "decontaminate_documents": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents)
),
sh AS (
  SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0),
agg AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM sh s LEFT JOIN bench b ON b.g = s.g
  WHERE s.doc_id % 10 <> 0
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(a.n_hit, 0) AS BIGINT) AS n_hit,
       (COALESCE(a.n_shingles, 0) > 0
        AND COALESCE(a.n_hit, 0) * 100 >= COALESCE(a.n_shingles, 0) * 50)
         AS contaminated
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
WHERE d.doc_id % 10 <> 0
""",
        "repetition_documents": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS l
        FROM documents)
),
bg AS (
  SELECT a.doc_id, a.t || ' ' || b.t AS g
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
bga AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_n
        FROM bgc GROUP BY doc_id),
fg AS (
  SELECT a.doc_id,
         a.t || ' ' || b.t || ' ' || c.t || ' ' || d.t || ' ' || e.t AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
  JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
),
fgc AS (SELECT doc_id, g, COUNT(*) AS c FROM fg GROUP BY doc_id, g),
fga AS (SELECT doc_id, SUM(c) AS n_5grams,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_5gram_n
        FROM fgc GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(bga.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(bga.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(COALESCE(fga.n_5grams, 0) AS BIGINT) AS n_5grams,
       CAST(COALESCE(fga.dup_5gram_n, 0) AS BIGINT) AS dup_5gram_n
FROM documents d
LEFT JOIN bga ON bga.doc_id = d.doc_id
LEFT JOIN fga ON fga.doc_id = d.doc_id
""",
        "iqr_outliers_events": """
WITH c AS (SELECT event_id, event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS value_cents
           FROM events),
b AS (SELECT event_type,
             quantile_disc(value_cents, 0.25) AS q_25,
             quantile_disc(value_cents, 0.75) AS q_75
      FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type, c.value_cents, b.q_25, b.q_75
FROM c JOIN b USING (event_type)
WHERE 2 * c.value_cents < 2 * b.q_25 - 3 * (b.q_75 - b.q_25)
   OR 2 * c.value_cents > 2 * b.q_75 + 3 * (b.q_75 - b.q_25)
""",
        "bm25_contrib_documents": """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
              (SELECT COUNT(*) FROM toks) AS total),
q AS (SELECT unnest(['spark', 'window', 'hash', 'merge']) AS t),
tf AS (SELECT toks.doc_id, toks.t, COUNT(*) AS tf
       FROM toks JOIN q ON q.t = toks.t GROUP BY toks.doc_id, toks.t),
df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM toks
       WHERE t IN (SELECT t FROM q) GROUP BY t)
SELECT tf.doc_id, tf.t AS token, CAST(tf.tf AS BIGINT) AS tf,
       CAST(dl.dl AS BIGINT) AS dl, CAST(df.df AS BIGINT) AS df,
       ROUND(LN(1 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (CAST(tf.tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                            * CAST(st.n_docs AS DOUBLE)
                            / CAST(st.total AS DOUBLE)))),
             6) AS score6
FROM tf JOIN dl ON dl.doc_id = tf.doc_id JOIN df ON df.t = tf.t CROSS JOIN st
""",
        "cube_lineitem_status": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       COUNT(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
        "shuffle_deterministic_documents": """
WITH h AS (
  SELECT doc_id,
         ((xor((doc_id * 2654435761) % 4294967296,
               ((doc_id * 2654435761) % 4294967296) // 65536)) * 40503)
         % 4294967296 AS hk
  FROM documents)
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS shuffle_pos
FROM h
""",
        "shard_export_documents": """
WITH h AS (
  SELECT doc_id, n_chars,
         (((xor((doc_id * 2654435761) % 4294967296,
                ((doc_id * 2654435761) % 4294967296) // 65536)) * 40503)
          % 4294967296) % 16 AS shard
  FROM documents)
SELECT shard, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM h GROUP BY shard
""",
        "audio_flac_roundtrip_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS lossless
FROM src
""",
        "audio_decode_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       s % 509 NOT IN (17, 101) AS decode_ok
FROM src
""",
        "audio_resample_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)),
src AS (SELECT i,
               CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM idx)
SELECT CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       CASE WHEN s % 509 NOT IN (17, 101) THEN CAST(16000 AS INTEGER) END AS sr_hz,
       s % 509 NOT IN (17, 101) AS decode_ok,
       CAST(CASE WHEN s % 509 NOT IN (17, 101) THEN 1 END AS BIGINT) AS len_ok
FROM src
""",
        "windowed_events_watermark": """
WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS "window",
                  event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  ((event_id * 2654435761) % 4294967296) % 90 AS jit
           FROM events)
SELECT "window", event_type,
       CAST(SUM(CASE WHEN jit <= 45 THEN cents ELSE 0 END) AS BIGINT) AS on_time_cents,
       CAST(SUM(CASE WHEN jit > 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY "window", event_type
""",
        "limit_offset_orders": """
WITH r AS (SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders)
SELECT o_orderkey, price_cents, rnk FROM r WHERE rnk > 50 AND rnk <= 150
""",
        "value_band_join_events": """
WITH p AS (SELECT event_id AS purchase_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'),
k AS (SELECT event_id AS click_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'click')
SELECT p.purchase_id, k.click_id,
       GREATEST(p.c - 50, k.c) AS overlap_lo,
       LEAST(p.c + 51, k.c + 1) AS overlap_hi
FROM p JOIN k ON ABS(p.c - k.c) <= 50
""",
        "asset_validate_corpus": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1199) t(x))
SELECT CAST(-1 AS INTEGER) AS partition_id,
       'asset-' || lpad(CAST(i AS VARCHAR), 6, '0') AS "key",
       'asset_decode' AS rule_id,
       CASE
         WHEN i % 101 = 0 THEN CASE i % 3
           WHEN 0 THEN 'failed to deserialize: (<class ''json.decoder.JSONDecodeError''>) Expecting value: line 1 column 1 (char 0)'
           WHEN 1 THEN 'failed to deserialize: (<class ''struct.error''>) unpack requires a buffer of 8 bytes'
           ELSE 'File is not a zip file' END
         WHEN i % 113 = 0 THEN 'cannot be empty'
         ELSE CASE WHEN i % 3 = 2 THEN 'crc checks failed'
                   ELSE 'file does not contain nodes' END
       END AS reason
FROM idx
WHERE i % 101 = 0 OR i % 113 = 0 OR i % 89 = 0
""",
        "leakage_free_split_documents": """
WITH rep AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
  FROM documents),
s AS (SELECT doc_id, rep, ((rep * 48271) % 2147483647) % 100 AS h FROM rep)
SELECT doc_id, rep,
       CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
FROM s
""",
        "mix_sources_documents": """
WITH base AS (
  SELECT doc_id, source,
         ((doc_id * 48271) % 2147483647) % 10000 AS h,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
                     WHEN 'src3' THEN 0.0 WHEN 'src4' THEN 1.75
                     WHEN 'src7' THEN 0.25 ELSE 1.0 END AS w
  FROM documents),
c AS (
  SELECT doc_id, source,
         CAST(floor(w) AS BIGINT)
           + CASE WHEN h < CAST(round((w - floor(w)) * 10000) AS BIGINT)
                  THEN 1 ELSE 0 END AS copies
  FROM base)
SELECT doc_id, source, CAST(0 AS INTEGER) AS copy_ix FROM c WHERE copies >= 1
UNION ALL
SELECT doc_id, source, CAST(1 AS INTEGER) FROM c WHERE copies >= 2
UNION ALL
SELECT doc_id, source, CAST(2 AS INTEGER) FROM c WHERE copies >= 3
""",
        "multimodal_violations": """
WITH img AS (
  SELECT 'image' AS modality,
         'img-' || lpad(CAST(i AS VARCHAR), 6, '0') AS "key",
         CASE
           WHEN i % 97 = 0 AND i % 4 = 1 THEN 'failed to parse gif header'
           WHEN i % 97 = 0 AND i % 4 = 2 THEN 'failed to parse jpeg header'
           WHEN i % 97 = 0 THEN 'file does not contain a valid image'
           WHEN i % 89 = 0 THEN 'payload is not in '
                || CASE (i + 1) % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                                    WHEN 2 THEN 'jpeg' ELSE 'webp' END
                || ' format (got '
                || CASE i % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                              WHEN 2 THEN 'jpeg' ELSE 'webp' END
                || ')'
           ELSE 'file does not contain a valid image'
         END AS reason
  FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1999) t(x))
  WHERE i % 97 = 0 OR i % 89 = 0 OR i % 101 = 0),
aud AS (
  SELECT 'audio' AS modality,
         CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
              ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                   || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
         END AS "key",
         'payload failed to decode' AS reason
  FROM (SELECT CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
        FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)))
  WHERE s % 509 IN (17, 101)),
vid AS (
  SELECT 'video' AS modality,
         'vid-' || lpad(CAST(i AS VARCHAR), 5, '0') || '#'
           || CAST(i % nf AS VARCHAR) AS "key",
         'frame failed to decode' AS reason
  FROM (SELECT CAST(x AS BIGINT) AS i, 3 + CAST(x AS BIGINT) % 6 AS nf
        FROM generate_series(0, 299) t(x))
  WHERE i % 23 <> 0 AND i % 11 = 0)
SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
UNION ALL
SELECT 'asset' AS modality,
       'asset-' || lpad(CAST(i AS VARCHAR), 6, '0') AS "key",
       CASE
         WHEN i % 101 = 0 THEN CASE i % 3
           WHEN 0 THEN 'failed to deserialize: (<class ''json.decoder.JSONDecodeError''>) Expecting value: line 1 column 1 (char 0)'
           WHEN 1 THEN 'failed to deserialize: (<class ''struct.error''>) unpack requires a buffer of 8 bytes'
           ELSE 'File is not a zip file' END
         WHEN i % 113 = 0 THEN 'cannot be empty'
         ELSE CASE WHEN i % 3 = 2 THEN 'crc checks failed'
                   ELSE 'file does not contain nodes' END
       END AS reason
FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1199) t(x))
WHERE i % 101 = 0 OR i % 113 = 0 OR i % 89 = 0
UNION ALL
SELECT 'audio' AS modality,
       CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS "key",
       'signal clipped' AS reason
FROM (SELECT CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
      FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)))
WHERE s % 509 NOT IN (17, 101, 233) AND s % 7 = 3
UNION ALL
SELECT 'audio' AS modality,
       CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS "key",
       'dc offset out of range' AS reason
FROM (SELECT CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
      FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)))
WHERE s % 509 NOT IN (17, 101, 233) AND s % 11 = 5
UNION ALL
SELECT 'audio' AS modality,
       CASE WHEN s % 509 = 331 THEN 'CLIP_' || CAST(s AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(s // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(s % 375 AS VARCHAR), 6, '0')
       END AS "key",
       'container codec does not match declared codec' AS reason
FROM (SELECT CASE WHEN i % 509 = 461 AND i > 0 THEN i - 1 ELSE i END AS s
      FROM (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x)))
WHERE s % 509 IN (59, 373)
""",
        "unnest_embeddings": """
WITH u AS (
  SELECT vec_id,
         UNNEST(embedding) AS val,
         GENERATE_SUBSCRIPTS(embedding, 1) AS i
  FROM embeddings)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim_idx,
       ROUND(CAST(val AS DOUBLE), 6) AS v6
FROM u
""",
        "upsert_orders_snapshot": """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1 AS price_cents,
       'upd' AS src
FROM orders WHERE o_orderkey % 5 = 0
UNION ALL
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       'base' AS src
FROM orders WHERE o_orderkey % 5 <> 0
""",
        "skew_kurtosis_lineitem": """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(q) AS s1, SUM(q*q) AS s2, SUM(q*q*q) AS s3, SUM(q*q*q*q) AS s4
  FROM (SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS q
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
       ROUND((CAST(s3 AS DOUBLE)/n - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
              + 2*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
             / POWER(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1.5), 6) AS skew6,
       ROUND((CAST(s4 AS DOUBLE)/n - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
              + 6*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
              - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
             / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                * (CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))) - 3.0, 6) AS kurt6
FROM s
""",
        "bool_agg_orders": """
SELECT o_orderpriority,
       CAST(MIN(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS all_above,
       CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS any_f
FROM orders GROUP BY o_orderpriority
""",
        # persisted-IVF contract: an exact-copy query must return its
        # own source id at cosine 1.0 (same nearest centroid => same list)
        "ann_index_contract": r"""
SELECT vec_id AS query_id, vec_id AS top1, CAST(1.0 AS DOUBLE) AS cos6
FROM embeddings WHERE vec_id % 9 = 0
""",
        # incremental-dedup store contract: accepted = distinct new
        # content per ingest (nulls fingerprint as '' in the engine)
        "dedup_incremental_documents": r"""
WITH h1 AS (SELECT coalesce(text, '') AS t FROM documents WHERE doc_id % 2 = 0),
h2 AS (SELECT coalesce(text, '') AS t FROM documents WHERE doc_id % 2 = 1)
SELECT CAST(1 AS INTEGER) AS ingest,
       (SELECT COUNT(*) FROM h1) AS n_batch,
       (SELECT COUNT(DISTINCT t) FROM h1) AS n_accepted
UNION ALL
SELECT CAST(2 AS INTEGER),
       (SELECT COUNT(*) FROM h2),
       (SELECT COUNT(DISTINCT t) FROM h2
        WHERE t NOT IN (SELECT t FROM h1))
""",
        # equi-depth: boundaries = exact octile quantile_disc values
        # (dyadic q => bit-exact rank rule), buckets half-open (lb, ub]
        "histogram_equidepth_lineitem": r"""
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
b AS (SELECT quantile_disc(cents,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS qs FROM c),
e AS (SELECT CAST(t.x AS BIGINT) AS k, b.qs[CAST(t.x AS INTEGER)] AS ub
      FROM b, generate_series(1, 8) t(x)),
b2 AS (SELECT k, ub, lag(ub) OVER (ORDER BY k) AS lb FROM e)
SELECT CAST(k AS INTEGER) AS bucket,
       CAST(ub AS BIGINT) AS upper_cents,
       (SELECT COUNT(*) FROM c
        WHERE cents <= b2.ub AND (b2.lb IS NULL OR cents > b2.lb)) AS cnt
FROM b2
""",
        # categorical PSI per cohort vs global mix (eps floor 1e-6,
        # same protocol as psi_nchars_by_source)
        "catpsi_events_type_by_bucket": r"""
WITH v AS (SELECT CAST(user_id % 8 AS INTEGER) AS bucket, event_type AS cat
           FROM events),
c AS (SELECT bucket, cat, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
tot AS (SELECT bucket, SUM(cnt) AS t FROM c GROUP BY 1),
g AS (SELECT cat, SUM(cnt) AS gcnt FROM c GROUP BY 1),
gt AS (SELECT SUM(gcnt) AS gt FROM g),
grid AS (
  SELECT b.bucket, k.cat
  FROM (SELECT DISTINCT bucket FROM c) b
  CROSS JOIN (SELECT DISTINCT cat FROM g) k),
pq AS (
  SELECT grid.bucket,
         GREATEST(COALESCE(c.cnt, 0) / CAST(tot.t AS DOUBLE), 1e-6) AS p,
         GREATEST(g.gcnt / CAST(gt.gt AS DOUBLE), 1e-6) AS q
  FROM grid
  LEFT JOIN c ON c.bucket = grid.bucket AND c.cat = grid.cat
  JOIN tot ON tot.bucket = grid.bucket
  JOIN g ON g.cat = grid.cat
  CROSS JOIN gt)
SELECT bucket, ROUND(SUM((p - q) * ln(p / q)), 6) AS psi6
FROM pq GROUP BY 1
""",
        # composite uniqueness: planted duplicates = event_id % 17 == 0;
        # canonical tuple key = user_id || US || event_id
        "composite_unique_contract_events": """
SELECT CAST(user_id AS VARCHAR) || chr(31) || CAST(event_id AS VARCHAR)
         AS "key",
       'unique_user_id_event_id' AS rule_id,
       'duplicate key (appears 2 times)' AS reason
FROM events WHERE event_id % 17 = 0
""",
        "dense_rank_orders": r"""
SELECT o_orderkey,
       CAST(DENSE_RANK() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS dr
FROM orders
""",
        # cume_dist = count(<= value)/n per partition — proportion-<=
        # definition, identical integer division both sides
        "cume_dist_orders": r"""
SELECT o_orderkey,
       round_even(CUME_DIST() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)), 6) AS cd6
FROM orders
""",
        # exact 2-sample KS: max over values of |c1*n2 - c2*n1| (exact
        # int cross-product), single division at the end
        "ks_lineitem_halves": r"""
WITH c AS (
  SELECT CAST(l_orderkey % 2 AS INTEGER) AS half,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
g AS (SELECT half, cents, COUNT(*) AS n FROM c GROUP BY 1, 2),
v AS (SELECT DISTINCT cents FROM g),
cum AS (
  SELECT v.cents,
         (SELECT COALESCE(SUM(n), 0) FROM g
          WHERE g.half = 0 AND g.cents <= v.cents) AS cum0,
         (SELECT COALESCE(SUM(n), 0) FROM g
          WHERE g.half = 1 AND g.cents <= v.cents) AS cum1
  FROM v),
tot AS (SELECT
          (SELECT COALESCE(SUM(n), 0) FROM g WHERE half = 0) AS n0,
          (SELECT COALESCE(SUM(n), 0) FROM g WHERE half = 1) AS n1)
SELECT CAST(tot.n0 AS BIGINT) AS n_half0,
       CAST(tot.n1 AS BIGINT) AS n_half1,
       round_even(CAST(CAST(MAX(ABS(cum.cum0 * tot.n1 - cum.cum1 * tot.n0))
                            AS BIGINT) AS DOUBLE)
                  / CAST(CAST(tot.n0 * tot.n1 AS BIGINT) AS DOUBLE),
                  6) AS ks6
FROM cum, tot GROUP BY tot.n0, tot.n1
""",
        "quantile_drift_lineitem": r"""
WITH c AS (
  SELECT CAST(l_orderkey % 2 AS INTEGER) AS half,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
b AS (SELECT half, quantile_disc(cents,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS qs
      FROM c GROUP BY 1),
e AS (SELECT CAST(t.x AS INTEGER) AS octile,
             MAX(CASE WHEN half = 0 THEN qs[CAST(t.x AS INTEGER)] END) AS h0,
             MAX(CASE WHEN half = 1 THEN qs[CAST(t.x AS INTEGER)] END) AS h1
      FROM b, generate_series(1, 8) t(x) GROUP BY 1)
SELECT octile, CAST(h0 AS BIGINT) AS half0_cents,
       CAST(h1 AS BIGINT) AS half1_cents,
       CAST(ABS(h0 - h1) AS BIGINT) AS abs_shift_cents
FROM e
""",
        "trend_events_by_type": r"""
WITH d AS (
  SELECT event_type,
         CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01'
              AS BIGINT) AS day,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(c) AS BIGINT) AS sy,
             CAST(SUM(day * day) AS BIGINT) AS sxx,
             CAST(SUM(day * c) AS BIGINT) AS sxy
      FROM d GROUP BY 1)
SELECT event_type, n AS n_days,
       round_even((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope6
FROM s
""",
        "vocab_spectrum_documents": r"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t)
SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
       round_even(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr6
FROM cnt
""",
        # shared counting rule: words=[a-z0-9]+ runs on lower(text),
        # syllables=[aeiouy]+ runs, sentences=[.!?]+ runs floored at 1
        "readability_by_source": r"""
WITH c AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
              AS BIGINT) AS w,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+'))
              AS BIGINT) AS s,
         GREATEST(CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+'))
                       AS BIGINT), 1) AS se
  FROM documents),
g AS (SELECT source, SUM(w) AS n_words, SUM(s) AS n_syllables,
             SUM(se) AS n_sentences
      FROM c GROUP BY 1)
SELECT source,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CASE WHEN n_words > 0 THEN
         round_even(206.835
                    - 1.015 * (CAST(n_words AS DOUBLE)
                               / CAST(n_sentences AS DOUBLE))
                    - 84.6 * (CAST(n_syllables AS DOUBLE)
                              / CAST(n_words AS DOUBLE)), 6)
       END AS flesch6
FROM g
""",
        "grouping_sets_lineitem": r"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus))
""",
        # distinctness by 64-bit content fingerprint == COUNT(DISTINCT
        # text) absent collisions (~n^2/2^65 — the exact-dedup convention)
        "dedup_report_documents": r"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT text) AS n_unique,
       round_even(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate6
FROM documents GROUP BY 1
""",
        "benford_orders_totalprice": r"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
d AS (
  SELECT CAST(LEFT(CAST(cents AS VARCHAR), 1) AS INTEGER) AS digit
  FROM c WHERE cents > 0),
g AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY 1),
t AS (SELECT SUM(cnt) AS total FROM g)
SELECT CAST(g.digit AS INTEGER) AS digit, g.cnt,
       round_even(CAST(g.cnt AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share6
FROM g, t
""",
        "gini_orders_by_priority": r"""
WITH x AS (
  SELECT o_orderpriority AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
r AS (
  SELECT k, c,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY c) AS i,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM x),
s AS (
  SELECT k, MAX(n) AS n,
         CAST(SUM((2 * i - n - 1) * c) AS BIGINT) AS num,
         CAST(MAX(n) * SUM(c) AS BIGINT) AS den
  FROM r GROUP BY k)
SELECT k AS o_orderpriority, n,
       round_even(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS gini6
FROM s
""",
        "covar_lineitem_qty_discount": r"""
WITH m AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS y
  FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy
      FROM m GROUP BY 1)
SELECT l_returnflag, n,
       round_even(CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS covar_pop6,
       CASE WHEN n > 1 THEN
         round_even(CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6)
       END AS covar_samp6
FROM s
""",
        "bitagg_orders_keys": r"""
SELECT o_orderpriority,
       bit_and(o_orderkey) AS band,
       bit_or(o_orderkey) AS bor,
       bit_xor(o_orderkey) AS bxor,
       COUNT(*) AS n
FROM orders GROUP BY 1
""",
        "embedding_quantize_error": r"""
SELECT vec_id,
       round_even(MAX(ABS(CAST(x AS DOUBLE)
                          - LEAST(GREATEST(round_even(CAST(x AS DOUBLE) * 127, 0),
                                           -127), 127) / 127.0)), 6) AS max_err6
FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
GROUP BY 1
""",
        "matryoshka_cosine_embeddings": r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round_even(CAST(x AS DOUBLE) * 1048576, 0) AS BIGINT)) AS qq
  FROM embeddings),
s AS (
  SELECT vec_id,
         list_sum(list_transform(qq, v -> v * v)) AS fullsq,
         list_sum(list_transform(qq[1:16], v -> v * v)) AS headsq
  FROM q)
SELECT vec_id,
       round_even(sqrt(CAST(headsq AS DOUBLE)) / sqrt(CAST(fullsq AS DOUBLE)),
                  6) AS cos_trunc6
FROM s
""",
        "tpch_q7_volume_shipping": r"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01')
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, l_year,
       CAST(SUM(rev) AS BIGINT) AS rev_micros, COUNT(*) AS n
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
   OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3')
GROUP BY 1, 2, 3
""",
        "tpch_q8_market_share": r"""
WITH v AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS vol,
         (ns.n_name = 'NATION_5') AS is_target
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01')
SELECT o_year,
       round_even(CAST(SUM(CASE WHEN is_target THEN vol ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share6
FROM v GROUP BY 1
""",
        "tpch_q12_priority_class": r"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""",
        "tpch_q13_customer_distribution": r"""
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist FROM co GROUP BY 1
""",
        "tpch_q15_top_supplier": r"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_rev_micros
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_rev_micros
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_micros = (SELECT MAX(total_rev_micros) FROM rev)
""",
        # Q17 threshold qty < 0.2*avg evaluated as the EXACT integer
        # inequality 5*qty*cnt < sum_qty in both engines
        "tpch_q17_small_quantity_revenue": r"""
WITH pk AS (
  SELECT p_partkey FROM part
  WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'),
f AS (
  SELECT l.l_partkey,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS qty,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN pk ON l.l_partkey = pk.p_partkey),
st AS (
  SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt
  FROM f GROUP BY 1)
SELECT CAST(COALESCE(SUM(CASE WHEN 5 * f.qty * st.cnt < st.sum_qty
                              THEN f.cents ELSE 0 END), 0) AS BIGINT)
         AS total_cents,
       CAST(COALESCE(SUM(CASE WHEN 5 * f.qty * st.cnt < st.sum_qty
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_rows
FROM f JOIN st ON f.l_partkey = st.l_partkey
""",
        # Q21 lateness marker adapted to l_returnflag='R' (no
        # commit/receipt dates in this corpus)
        "tpch_q21_waiting_supplier": r"""
WITH pair AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2),
po AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
         SUM(l_suppkey * late) AS late_sk
  FROM pair GROUP BY 1)
SELECT s.s_name, COUNT(*) AS numwait
FROM po
JOIN supplier s ON po.late_sk = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
WHERE po.n_supp >= 2 AND po.n_late = 1
GROUP BY 1
""",
        # Q22 cntrycode adapted to c_nationkey; threshold exact as
        # cents*cnt > sum_cents
        "tpch_q22_global_sales_opportunity": r"""
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS INTEGER) AS cntrycode,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer),
avgpos AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS k
  FROM c WHERE cents > 0)
SELECT c.cntrycode, COUNT(*) AS numcust,
       CAST(SUM(c.cents) AS BIGINT) AS totacctbal_cents
FROM c, avgpos
WHERE c.cents * avgpos.k > avgpos.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
""",
        # animated WebP demux contracts: closed form from the corpus
        # index functions (sources/webpanim.py) — n = 1 + i%4,
        # dur(i,j) = 10 + 7j + i%5 => total = 10n + 7n(n-1)/2 + n*(i%5)
        # EXIF extraction contract: closed form from sources/exifjpeg.py
        # (i%7==0 -> no exif; else i%13==0 -> truncated IFD -> invalid)
        "exif_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 399) t(x))
SELECT 'exif-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       (i % 7 <> 0) AS has_exif,
       (i % 7 <> 0 AND i % 13 <> 0) AS valid,
       CAST(CASE WHEN i % 7 <> 0 AND i % 13 <> 0 THEN 1 + i % 8 END
            AS INTEGER) AS orientation,
       CASE WHEN i % 7 <> 0 AND i % 13 <> 0
            THEN 'CAMERA_MAKER_' || CAST(i % 5 AS VARCHAR) END AS make
FROM idx
""",
        # animated-GIF demux contracts: closed form from
        # sources/gifanim.py — n = 1 + i%5, delay(i,j) = 2 + 3j + i%6
        # => sum = 2n + 3n(n-1)/2 + n*(i%6); FrameSampleStage caps at 8
        "gif_anim_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 399) t(x)),
n AS (SELECT i, 1 + i % 5 AS nf FROM idx)
SELECT 'gifa-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       (i % 9 <> 0) AS ok,
       CAST(CASE WHEN i % 9 = 0 THEN 0 ELSE nf END AS BIGINT) AS n_frames,
       CAST(CASE WHEN i % 9 = 0 THEN 0
            ELSE 2 * nf + 3 * nf * (nf - 1) // 2 + nf * (i % 6)
            END AS BIGINT) AS delay_cs_sum
FROM n
""",
        # still GIFs (n=1) emit NO rows in the frame-sample stage (the
        # animated branch requires >1 image descriptor)
        "gif_anim_frames_contract": """
WITH v AS (SELECT CAST(x AS BIGINT) AS i, 1 + CAST(x AS BIGINT) % 5 AS nf
           FROM generate_series(0, 399) t(x)
           WHERE CAST(x AS BIGINT) % 9 <> 0
             AND 1 + CAST(x AS BIGINT) % 5 > 1),
f AS (SELECT i, CAST(s.x AS BIGINT) AS j
      FROM v, generate_series(0, 7) s(x)
      WHERE CAST(s.x AS BIGINT) < nf)
SELECT 'gifa-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       CAST(j AS INTEGER) AS frame_index,
       CAST(true AS BOOLEAN) AS decode_ok
FROM f
""",
        # APNG demux contracts: closed form from sources/apng.py — n =
        # 1 + i%3, delay_num(i,j) = 1 + j + i%4 => sum = n + n(n-1)/2 + n*(i%4)
        "apng_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 399) t(x)),
n AS (SELECT i, 1 + i % 3 AS nf FROM idx)
SELECT 'apng-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       (i % 11 <> 0) AS ok,
       CAST(CASE WHEN i % 11 = 0 THEN 0 ELSE nf END AS BIGINT) AS n_frames,
       CAST(CASE WHEN i % 11 = 0 THEN 0
            ELSE nf + nf * (nf - 1) // 2 + nf * (i % 4)
            END AS BIGINT) AS delay_num_sum
FROM n
""",
        "apng_frames_contract": """
WITH v AS (SELECT CAST(x AS BIGINT) AS i, 1 + CAST(x AS BIGINT) % 3 AS nf
           FROM generate_series(0, 399) t(x)
           WHERE CAST(x AS BIGINT) % 11 <> 0),
f AS (SELECT i, CAST(s.x AS BIGINT) AS j
      FROM v, generate_series(0, 7) s(x)
      WHERE CAST(s.x AS BIGINT) < nf)
SELECT 'apng-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       CAST(j AS INTEGER) AS frame_index,
       CAST(true AS BOOLEAN) AS decode_ok
FROM f
""",
        "webp_anim_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 399) t(x)),
n AS (SELECT i, 1 + i % 4 AS nf FROM idx)
SELECT 'anim-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       (i % 13 <> 0) AS ok,
       CAST(CASE WHEN i % 13 = 0 THEN 0 ELSE nf END AS BIGINT) AS n_frames,
       CAST(CASE WHEN i % 13 = 0 THEN 0
            ELSE 10 * nf + 7 * nf * (nf - 1) // 2 + nf * (i % 5)
            END AS BIGINT) AS total_duration_ms
FROM n
""",
        "webp_anim_frames_contract": """
WITH v AS (SELECT CAST(x AS BIGINT) AS i, 1 + CAST(x AS BIGINT) % 4 AS nf
           FROM generate_series(0, 399) t(x)
           WHERE CAST(x AS BIGINT) % 13 <> 0),
f AS (SELECT i, CAST(s.x AS BIGINT) AS j
      FROM v, generate_series(0, 7) s(x)
      WHERE CAST(s.x AS BIGINT) < nf)
SELECT 'anim-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       CAST(j AS INTEGER) AS frame_index,
       CAST(true AS BOOLEAN) AS decode_ok
FROM f
""",
        "video_frames_contract": """
WITH v AS (SELECT CAST(x AS BIGINT) AS i, 3 + CAST(x AS BIGINT) % 6 AS nf
           FROM generate_series(0, 299) t(x)
           WHERE CAST(x AS BIGINT) % 23 <> 0),
f AS (SELECT i, nf, CAST(s.x AS BIGINT) AS j
      FROM v, generate_series(0, 7) s(x)
      WHERE CAST(s.x AS BIGINT) < nf)
SELECT 'vid-' || lpad(CAST(i AS VARCHAR), 5, '0') AS "key",
       CAST(j AS INTEGER) AS frame_index,
       NOT (i % 11 = 0 AND j = i % nf) AS decode_ok
FROM f
""",
        "audio_chunk_contract": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1499) t(x))
SELECT CASE WHEN i % 509 = 331 THEN 'CLIP_' || CAST(i AS VARCHAR)
            ELSE 'clip-' || lpad(CAST(i // 375 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST(i % 375 AS VARCHAR), 6, '0')
       END AS clip_id,
       CAST(CASE WHEN i % 509 = 191 THEN NULL
                 WHEN i % 509 IN (17, 101, 281) THEN 0
                 ELSE 1 END AS BIGINT) AS count_ok
FROM idx
WHERE i % 509 NOT IN (460, 461)
""",
        "image_validate_corpus": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1999) t(x))
SELECT CAST(-1 AS INTEGER) AS partition_id,
       'img-' || lpad(CAST(i AS VARCHAR), 6, '0') AS "key",
       'image_decode' AS rule_id,
       CASE
         WHEN i % 97 = 0 AND i % 4 = 1 THEN 'failed to parse gif header'
         WHEN i % 97 = 0 AND i % 4 = 2 THEN 'failed to parse jpeg header'
         WHEN i % 97 = 0 THEN 'file does not contain a valid image'
         WHEN i % 89 = 0 THEN 'payload is not in '
              || CASE (i + 1) % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                                  WHEN 2 THEN 'jpeg' ELSE 'webp' END
              || ' format (got '
              || CASE i % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                            WHEN 2 THEN 'jpeg' ELSE 'webp' END
              || ')'
         ELSE 'file does not contain a valid image'
       END AS reason
FROM idx
WHERE i % 97 = 0 OR i % 89 = 0 OR i % 101 = 0
""",
        "image_resize_corpus": """
WITH idx AS (SELECT CAST(x AS BIGINT) AS i FROM generate_series(0, 1999) t(x))
SELECT 'img-' || lpad(CAST(i AS VARCHAR), 6, '0') AS "key",
       32 AS width, 32 AS height
FROM idx
WHERE i % 97 <> 0 AND (i % 89 = 0 OR i % 101 <> 0)
""",
        "regr_intercept_price_by_flag": """
WITH c AS (SELECT l_returnflag,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(x*y) AS BIGINT) AS sum_xy
      FROM c GROUP BY l_returnflag),
sl AS (SELECT l_returnflag, n, sum_x, sum_y,
              ROUND((CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                     - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)),
                    6) AS slope6
       FROM s)
SELECT l_returnflag, n, slope6,
       ROUND((CAST(sum_y AS DOUBLE) - slope6 * CAST(sum_x AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept6
FROM sl
""",
        "regr_r2_qty_discount": """
WITH c AS (SELECT l_returnflag,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                  CAST(ROUND(l_discount * 100) AS BIGINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sum_xy
      FROM c GROUP BY l_returnflag),
r AS (SELECT l_returnflag, n,
             ROUND(CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE))),
                   6) AS corr6
      FROM s)
SELECT l_returnflag, n, ROUND(corr6 * corr6, 6) AS r2_6 FROM r
""",
        "regr_slope_price_by_flag": """
WITH c AS (SELECT l_returnflag,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(x*y) AS BIGINT) AS sum_xy
      FROM c GROUP BY l_returnflag)
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
              - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)),
             6) AS slope6
FROM s
""",
        "corr_lineitem_qty_discount": """
WITH c AS (SELECT l_returnflag,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                  CAST(ROUND(l_discount * 100) AS BIGINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sum_xy
      FROM c GROUP BY l_returnflag)
SELECT l_returnflag, n, sum_x, sum_y, sum_xy,
       CAST(n * sum_xy - sum_x * sum_y AS BIGINT) AS cov_num,
       ROUND(CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sum_x AS DOUBLE) * sum_x)
                    * (CAST(n AS DOUBLE) * syy - CAST(sum_y AS DOUBLE) * sum_y)),
             6) AS corr6
FROM s
""",
        "unpivot_lineitem_metrics": """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(l_discount AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       CAST(l_tax AS DOUBLE) FROM lineitem
""",
        "hopping_window_events": """
WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
     g AS (SELECT unnest(generate_series(0, 3)) AS i),
     w AS (SELECT ((ts_us // 900000000) - i) * 900000000 AS window_start_us,
                  event_type, vc
           FROM e CROSS JOIN g)
SELECT window_start_us, event_type,
       CAST(SUM(vc) AS BIGINT) AS value_cents, COUNT(*) AS n
FROM w GROUP BY 1, 2
""",
        "inverted_index_documents": r"""
WITH raw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS token
  FROM documents),
tok AS (SELECT DISTINCT doc_id, token FROM raw)
SELECT token, COUNT(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY token
""",
        "tfidf_top_terms_documents": r"""
WITH raw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM raw GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM raw GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
              CAST(tf.tf * nn.n AS DOUBLE) / df.df AS score
       FROM tf JOIN df USING (token) CROSS JOIN nn),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rnk
      FROM sc)
SELECT doc_id, token, tf, df, score, rnk AS "rank" FROM r WHERE rnk <= 3
""",
        "setop_intersect_users": """
SELECT user_id FROM events INTERSECT SELECT o_custkey FROM orders
""",
        "setop_except_customers": """
SELECT o_custkey FROM orders EXCEPT SELECT user_id FROM events
""",
        "setop_intersect_user_type": """
SELECT user_id, event_type FROM events WHERE value > 50
INTERSECT
SELECT user_id, event_type FROM events WHERE value <= 50
""",
        "setop_union_keys": """
SELECT o_custkey FROM orders UNION SELECT user_id FROM events
""",
        "ntile_orders": """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
       NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
FROM orders
""",
        "interval_overlap_events": """
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS s FROM events),
l AS (SELECT event_id, s, s + 90000000 AS e FROM e WHERE event_type = 'click'),
r AS (SELECT event_id, s, s + 60000000 AS e FROM e WHERE event_type = 'purchase')
SELECT l.event_id AS click_id, r.event_id AS purchase_id,
       GREATEST(l.s, r.s) AS overlap_lo, LEAST(l.e, r.e) AS overlap_hi
FROM l JOIN r ON l.s < r.e AND r.s < l.e
""",
        "setop_except_all_custkeys": """
SELECT o_custkey FROM orders EXCEPT ALL SELECT user_id FROM events
""",
        "throttle_events_per_user": """
WITH w AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS p
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_id, user_id FROM w WHERE p IS NULL OR t - p > 600000000
""",
        "nb_train_counts_documents": """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents)
SELECT d.source, tok.t AS token, COUNT(*) AS cnt
FROM tok JOIN documents d USING (doc_id)
GROUP BY d.source, tok.t
""",
        "nb_classify_documents": """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '[^a-z0-9]+'),
                            x -> x <> '')) AS t
  FROM documents),
cnt AS (SELECT d.source, tok.t, COUNT(*) AS c
        FROM tok JOIN documents d USING (doc_id) GROUP BY d.source, tok.t),
tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY source),
vv AS (SELECT COUNT(DISTINCT t) AS v FROM tok),
pri AS (SELECT source, COUNT(*) AS d FROM documents GROUP BY source),
nd AS (SELECT COUNT(*) AS nd FROM documents),
sc AS (
  SELECT tok.doc_id, pri.source,
         ROUND(SUM(ln((coalesce(cnt.c, 0) + 1.0) / (tot.n + vv.v)))
               + ln(CAST(pri.d AS DOUBLE) / nd.nd), 6) AS score
  FROM tok CROSS JOIN pri CROSS JOIN nd CROSS JOIN vv
  JOIN tot ON tot.source = pri.source
  LEFT JOIN cnt ON cnt.source = pri.source AND cnt.t = tok.t
  GROUP BY tok.doc_id, pri.source, pri.d, nd.nd, tot.n, vv.v)
SELECT doc_id, source AS pred, score
FROM (SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, source ASC) AS rn
      FROM sc) WHERE rn = 1
""",
        "dedup_paragraphs_documents": """
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
tok AS (SELECT doc_id, unnest(l) AS t,
               generate_subscripts(l, 1) - 1 AS i FROM arr),
paras AS (
  SELECT doc_id, CAST(i // 8 AS BIGINT) AS para_idx,
         string_agg(t, ' ' ORDER BY i) AS para_text,
         COUNT(*) AS n_words
  FROM tok GROUP BY doc_id, CAST(i // 8 AS BIGINT)),
ranked AS (
  SELECT doc_id, para_idx, n_words,
         row_number() OVER (PARTITION BY para_text
                            ORDER BY doc_id, para_idx) AS rn
  FROM paras)
SELECT doc_id, para_idx, n_words FROM ranked WHERE rn = 1
""",
        "top_bigrams_documents": """
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
tok AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS i FROM arr),
big AS (SELECT a.t || chr(31) || b.t AS bigram
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
SELECT bigram, COUNT(*) AS cnt FROM big GROUP BY bigram
ORDER BY cnt DESC, bigram LIMIT 25
""",
        "spearman_lineitem": """
WITH r AS (
  SELECT l_returnflag,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS rx,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS ry
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)
SELECT l_returnflag, COUNT(*) AS n, ROUND(corr(rx, ry), 6) AS spearman
FROM r GROUP BY l_returnflag
""",
        "mad_lineitem_quantity": """
WITH med AS (
  SELECT l_returnflag, CAST(ROUND(2 * median(l_quantity)) AS BIGINT) AS m2
  FROM lineitem GROUP BY l_returnflag),
d AS (
  SELECT l.l_returnflag, abs(2 * l.l_quantity - m.m2) AS dev2
  FROM lineitem l JOIN med m USING (l_returnflag)
  WHERE l.l_quantity IS NOT NULL)
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(median(dev2) / 2.0, 6) AS mad
FROM d GROUP BY l_returnflag
""",
        "setop_intersect_all_user_type": """
SELECT user_id, event_type FROM events WHERE value > 50
INTERSECT ALL
SELECT user_id, event_type FROM events WHERE value <= 50
""",
        "ntile_orders_desc": """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       NTILE(8) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS tile
FROM orders
""",
        "window_user_running": """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                  CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events)
SELECT event_id, user_id,
       LAG(vc) OVER w AS prev_value_cents,
       CAST(SUM(vc) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_cents,
       CAST(SUM(vc) OVER (w ROWS 2 PRECEDING) AS BIGINT) AS rolling3_value_cents
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
""",
        "grouped_median_lineitem": """
SELECT l_returnflag, COUNT(l_quantity) AS n,
       quantile_disc(l_quantity, 0.25) AS q_25,
       quantile_disc(l_quantity, 0.5) AS q_50,
       quantile_disc(l_quantity, 0.75) AS q_75
FROM lineitem GROUP BY l_returnflag
""",
        "percentile_cont_lineitem": """
WITH c AS (SELECT l_returnflag,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
           FROM lineitem)
SELECT l_returnflag, COUNT(price_cents) AS n,
       ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY price_cents), 6) AS p_25,
       ROUND(PERCENTILE_CONT(0.5)  WITHIN GROUP (ORDER BY price_cents), 6) AS p_50,
       ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY price_cents), 6) AS p_75
FROM c GROUP BY l_returnflag
""",
        "semi_join_orders_lineitem": """
SELECT o_orderkey, o_totalprice FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
""",
        "anti_join_customer_orders": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
""",
        "chunk_documents": """
SELECT doc_id, s // 150 AS chunk_idx, s AS "start",
       substr(text, CAST(s + 1 AS INT), 200) AS chunk_text,
       length(substr(text, CAST(s + 1 AS INT), 200)) AS chunk_len
FROM (SELECT doc_id, text,
             unnest(generate_series(0, length(text) - 1, 150)) AS s
      FROM documents WHERE length(text) > 0)
""",
        "text_profile_documents": r"""
WITH c AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), k AS (
  SELECT doc_id, length(t) AS n_chars,
         len(regexp_extract_all(t, '\S+')) AS n_tokens,
         -- filter '' rather than relying on trim(): DuckDB trim strips
         -- only spaces while the engine strips all whitespace, so a
         -- tab/newline edge would otherwise yield a phantom '' token
         len(list_distinct(list_filter(
             string_split_regex(trim(t), '\s+'), x -> x <> ''))) AS nu
  FROM c
)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0 ELSE nu END AS n_unique_tokens,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE CAST(nu AS DOUBLE) / n_tokens END AS ttr
FROM k
""",
    }
