"""Driver contract for the spark-graft builder (PySpark target).

Every `queries()` entry exercises an operator from SURVEY.md §2 (or a
datapipe extension) THROUGH the qlbridge_spark engine — the qlbridge SQL
dialect goes lexer → AST → Column translation → Catalyst. `oracle_sql()`
holds the ANSI-SQL equivalent for DuckDB.

Conventions to keep the value-hash comparison deterministic:
- every computed column is aliased identically on both sides
- floating aggregates are round()-ed on both sides (fp summation order
  differs between engines)
- DuckDB's HUGEINT sums / DOUBLE epoch are cast to BIGINT to match Spark
- ORDER-insensitive compare, but ties are still broken by id columns
  wherever rank/limit matters
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make qlbridge_spark importable regardless of the driver's CWD/sys.path
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# engine cache (one Engine per sf_dir per session)
# ---------------------------------------------------------------------------
_ENGINES: dict[tuple[int, str], object] = {}


def _engine(spark: SparkSession, sf_dir: str):
    from qlbridge_spark import Engine
    from qlbridge_spark.session import configure

    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        # UTC session tz: parquet timestamps are tz-naive; Spark renders
        # TimestampType in session tz while DuckDB is calendar-naive — they
        # agree only under UTC. Also apply AQE/skew/broadcast tuning.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        configure(spark)
        eng = Engine(spark)
        eng.load_parquet_dir(sf_dir)
        _ENGINES[key] = eng
    return _ENGINES[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: multi-join star query with
    group-by — exercises scan, broadcast joins, partial agg, order."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    return eng.sql(_Q["q05_multi_join_revenue"])


# ---------------------------------------------------------------------------
# qlbridge-dialect SQL (run through OUR engine)
# ---------------------------------------------------------------------------
_Q = {
    # §2.4 group-by + aggregates (sum/avg/count) — TPC-H Q1 shape
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""",
    # §2.2 projection + WHERE + exclusive BETWEEN (vm/vm.go:868)
    "q02_filter_projection": """
        SELECT p_partkey, toupper(p_brand) AS brand_uc,
               round(p_retailprice * 1.1, 2) AS bumped,
               char_length(p_name) AS name_len
        FROM part
        WHERE p_size BETWEEN 10 AND 20
        ORDER BY p_partkey""",
    # §2.3 inner equi-join + agg + order/limit (top-k)
    "q03_join_revenue": """
        SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderstatus != "F"
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""",
    # §2.7 WHERE IN (SELECT ...) → left-semi join (superset)
    "q04_semi_join": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""",
    # §2.3 multi-way join over the star schema (broadcast dims)
    "q05_multi_join_revenue": """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = "ASIA"
        GROUP BY n_name
        ORDER BY revenue DESC""",
    # §2.2 range predicates + global agg (TPC-H Q6 shape)
    "q06_range_agg": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_discount > 0.04 AND l_discount < 0.07 AND l_quantity < 24
              AND l_shipdate >= "1996-01-01" AND l_shipdate < "1998-01-01" """,
    # §2.2 COUNT(DISTINCT) — implemented correctly (reference bug:
    # testutil/testsuite.go:125-127 returns 0). DISTINCT-rows coverage
    # lives in q25 (multi-column) — single-column q08 retired to stay
    # within the driver's 50-entry scoring window.
    "q07_count_distinct": """
        SELECT count(distinct(c_mktsegment)) AS segs,
               count(distinct(c_nationkey)) AS nations,
               sum(DISTINCT c_nationkey) AS sum_nations,
               avg(DISTINCT c_nationkey) AS avg_nations
        FROM customer""",
    # §2.4 HAVING (post-agg filter, exec/where.go:24)
    "q09_having": """
        SELECT o_custkey, count(*) AS n,
               round(count(*) / (SELECT avg(c_acctbal) FROM customer), 6) AS per_bal
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) > 12
        ORDER BY count(*) DESC, o_custkey""",
    # §2.3 LEFT + RIGHT OUTER joins in one chain (grammar-accepted
    # superset; exec ignores join type in ref) — count(c_custkey) counts
    # only matched customers, so unmatched nations show 0
    "q11_left_join": """
        SELECT r_name, n_name, count(c_custkey) AS n_cust
        FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
                      LEFT JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""",
    # §2.9 string + hash + url builtins (expr/builtins/string.go,
    # hash_and_encode.go, url_email.go:230/463/609 — host/qs/url.matchqs
    # exercised on a synthetic URL so edge cases get a hard oracle row)
    # + §2.9 conditional builtins if()/oneof() (folded from retired q15)
    "q12_string_funcs": """
        SELECT c_custkey, tolower(c_name) AS lname,
               hash.md5(c_name) AS md5h,
               hasprefix(c_name, "Customer#0000001") AS pfx,
               string.substr(c_name, 9, 17) AS numpart,
               join(c_name, c_mktsegment, "|") AS joined,
               host(if(c_custkey % 2 = 0,
                       join("http://ex.com/p?seg=", c_mktsegment, ""),
                       "http://ex.com/p")) AS hostc,
               qs(if(c_custkey % 2 = 0,
                     join("http://ex.com/p?seg=", c_mktsegment, ""),
                     "http://ex.com/p"), "seg") AS qsv,
               if(c_acctbal > 5000, "high", "low") AS tier,
               round(oneof(c_acctbal, 0), 2) AS bal,
               url.matchqs(if(c_custkey % 2 = 0,
                              join("http://ex.com/p?seg=", c_mktsegment, ""),
                              "http://ex.com/p"), "seg") AS hasq,
               array_join(list_transform([c_name, c_mktsegment], x -> lower(x)), "|") AS lowered,
               aggregate(transform(split(c_name, "#"), x -> length(x)), cast(0 AS long), (acc, x) -> acc + x) AS csum
        FROM customer
        WHERE c_custkey < 100
        ORDER BY c_custkey""",
    # §2.9 date/time builtins (expr/builtins/time.go; Go weekday 0=Sunday)
    # + ANSI EXTRACT(part FROM ts) alongside the reference's comma-form
    # extract (DuckDB/Postgres part numbering: dow Sunday=0, ISO week)
    "q13_time_funcs": """
        SELECT o_orderkey, yy(o_orderdate) AS yy2, mm(o_orderdate) AS m,
               dayofweek(o_orderdate) AS dow, hourofday(o_orderdate) AS hod,
               yymm(o_orderdate) AS ym,
               extract(quarter FROM o_orderdate) AS qtr,
               extract(isodow FROM o_orderdate) AS idw,
               extract(week FROM o_orderdate) AS wk,
               extract(epoch FROM o_orderdate) AS ep
        FROM orders
        WHERE o_orderkey < 200
        ORDER BY o_orderkey""",
    # §2.8 glob-LIKE + IN list
    "q14_like_in": """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_mktsegment LIKE "%BUILD%" OR c_mktsegment IN ("MACHINERY", "FURNITURE")
        ORDER BY c_custkey""",
    # §2.9 conditional (if) + oneof/coalesce
    # §2.7 subquery in FROM
    # + DuckDB-style star modifiers and BY-ALL shorthands (supersets):
    # * EXCLUDE/REPLACE prune and rewrite the star expansion in place;
    # GROUP BY ALL groups on every non-aggregate select expression;
    # ORDER BY ALL sorts by every output column left-to-right
    "q16_subquery_from": """
        SELECT c_mktsegment AS seg, round(avg(c_acctbal), 2) AS avg_bal, count(*) AS n
        FROM (SELECT * EXCLUDE (c_custkey, c_name, c_nationkey)
                       REPLACE (c_acctbal * 1.0 AS c_acctbal)
              FROM customer WHERE c_acctbal > 0) AS t
        GROUP BY ALL
        ORDER BY ALL""",
    # §2.9 json builtins over events.props + cast chain
    "q17_events_json": """
        SELECT event_type, count(*) AS n,
               round(avg(toint(json.jmespath(props, "k"))), 4) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""",
    # §2.9 unixtrunc (time bucketing — the batch shape of streaming windows)
    "q18_hourly_buckets": """
        SELECT unixtrunc(ts, "hour") AS hr, count(*) AS n,
               round(sum(value), 2) AS total
        FROM events
        GROUP BY hr
        ORDER BY hr
        LIMIT 100""",
    # math + casting builtins (+ modulo, folded from retired q29)
    # + the ANSI portability batch (sign/trunc/greatest/ln/substring/
    # trim/initcap — standard names the reference builtin set lacks)
    "q19_math_cast": """
        SELECT p_partkey, round(sqrt(p_retailprice), 4) AS rt,
               round(pow(p_size, 2), 1) AS sz2,
               toint(tostring(p_size)) AS roundtrip,
               p_size % 7 AS szmod,
               sign(p_retailprice - 1500) AS sg,
               trunc(p_retailprice / 100) AS trc,
               greatest(p_size, 25) AS gst,
               round(ln(p_retailprice), 4) AS lnp,
               toupper(substring(p_name, 1, 10)) AS nm10,
               trim(concat_ws("-", p_brand, tostring(p_size))) AS bs
        FROM part
        WHERE p_partkey < 200
        ORDER BY p_partkey""",
    # literal select (plan/planner_select.go:267-286)
    "q20_literal": """SELECT 1 AS one, "hello" AS greeting, 2 * 3 AS six""",
    # §2.8 negation wrappers (NOT IN / NOT LIKE / NOT BETWEEN,
    # expr/node.go:103-128 NegateableNode) + NOT(...) boolean grouping and
    # modulo predicate (folded from retired q29)
    "q34_negations": """
        SELECT p_partkey, p_brand, p_size
        FROM part
        WHERE p_brand NOT LIKE "%#4%"
          AND p_size NOT BETWEEN 10 AND 40
          AND p_brand NOT IN ("Brand#55")
          AND p_partkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey < 50)
          AND NOT (p_partkey % 3 = 0)
        ORDER BY p_partkey""",
    # §2.2 multi-column DISTINCT + §2.5 ORDER BY + LIMIT/OFFSET (offset:
    # parse-only in reference) — DISTINCT applies before the chain clauses
    "q25_distinct_multi": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus
        LIMIT 4 OFFSET 1""",
    # §2.4 min/max/stddev superset aggregates
    # median/percentile_cont over the integer nationkey domain: linear
    # interpolation lands on exact binary fractions (.0/.25/.5/.75), so
    # Spark's exact F.percentile and DuckDB's quantile_cont hash-match
    # without float fuzz
    "q26_minmax": """
        SELECT c_mktsegment, round(min(c_acctbal), 2) AS lo,
               round(max(c_acctbal), 2) AS hi,
               round(stddev(c_acctbal), 2) AS sd,
               round(stddev_pop(c_acctbal), 2) AS sdp,
               round(var_pop(c_acctbal), 2) AS vp,
               round(variance(c_acctbal), 2) AS vs,
               median(c_nationkey) AS med_nk,
               percentile_cont(c_nationkey, 0.25) AS p25_nk,
               mode(c_nationkey) AS mode_nk,
               round(median(DISTINCT c_acctbal), 2) AS med_d,
               percentile_cont(DISTINCT c_nationkey, 0.25) AS p25_d,
               mode(DISTINCT c_nationkey) AS mode_d,
               round(corr(c_acctbal, c_custkey), 4) AS cr,
               corr(c_acctbal * 0, c_custkey) AS cr0
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # §2.3 CROSS JOIN (comma form) + lateral UNNEST + (VALUES …) table
    # constructor + ANSI NULLS ordering + bracketed PIVOT/UNPIVOT (all
    # supersets; reference grammar has none — lex/dialect_sql.go). The
    # UNNEST lowers to a Generate (narrow, zero-shuffle); VALUES is a
    # fixed 2-row frame cross-joined in; PIVOT with an explicit IN list
    # keeps map-side partial agg (one shuffle); UNPIVOT is a narrow melt.
    "q28_cross_join": """
        SELECT * FROM (
          SELECT v.grp, u.w AS word, count(*) AS n
          FROM part p,
               UNNEST(split(p.p_name, " ")) AS u(w),
               (VALUES (1, "a"), (2, "b")) AS v(k, grp)
          WHERE p.p_partkey <= 100
          GROUP BY v.grp, u.w
          ORDER BY n DESC NULLS LAST, word, grp
          LIMIT 40) t0
        UNION ALL
        SELECT "pv" AS grp, o_orderpriority AS word, open_cnt AS n
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders) s
             PIVOT (count(*) FOR o_orderstatus IN ("O" AS open_cnt)) pv
        UNION ALL
        SELECT "up" AS grp, metric AS word, val AS n
        FROM (SELECT count(*) AS n_orders, count(distinct(o_custkey)) AS n_custs
              FROM orders) agg
             UNPIVOT (val FOR metric IN (n_orders, n_custs)) up""",
    # time-bucketed multi-key agg (events pipeline shape) + exclusive
    # BETWEEN over timestamps (vm/vm.go:901, folded from retired q24)
    "q30_dow_profile": """
        SELECT dayofweek(ts) AS dow, event_type, count(*) AS n
        FROM events
        WHERE ts BETWEEN "2024-01-08" AND "2024-01-22"
        GROUP BY dayofweek(ts), event_type
        ORDER BY dow, event_type""",
    # nested subquery + join + order (composite shape)
    # + LATERAL derived table (top-k per group, decorrelated to ONE
    # row_number window + equi-join — never per-outer-row re-execution)
    "q31_top_nation_customers": """
        SELECT * FROM (
          SELECT n_name, c_name, round(c_acctbal, 2) AS bal
          FROM (SELECT c_name, c_acctbal, c_nationkey FROM customer WHERE c_acctbal > 9000) AS rich
            JOIN nation ON rich.c_nationkey = n_nationkey
          ORDER BY bal DESC, c_name LIMIT 25) top25
        UNION ALL
        SELECT n_name, l.c_name, l.bal
        FROM nation, LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
                              FROM customer
                              WHERE c_nationkey = n_nationkey
                              ORDER BY c_acctbal DESC, c_name LIMIT 2) l""",
    # §2.4 grouping-sets superset (reference: "not present")
    # GROUPING SETS (ROLLUP's sets spelled explicitly) + ANSI grouping()
    # null-vs-aggregated markers — one Expand+Aggregate plan, not a
    # union of groupBys
    "q32_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS qty,
               cast(grouping(l_returnflag) AS long) AS g_rf,
               cast(grouping(l_linestatus) AS long) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus""",
    # §2.6 set operations (superset; reference has none) — UNION ALL
    # chain of tagged branches exercising INTERSECT / EXCEPT / UNION in
    # FROM-subqueries, all parsed and executed by the engine dialect
    "q22_setops": """
        SELECT "hi" AS src, c_custkey AS k FROM customer WHERE c_acctbal >= 8000
        UNION ALL
        SELECT "lo" AS src, c_custkey AS k FROM customer WHERE c_acctbal < 1000
        UNION ALL
        SELECT "both" AS src, nk AS k FROM
          (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier) AS b
        UNION ALL
        SELECT "conly" AS src, nk AS k FROM
          (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier) AS c
        UNION ALL
        SELECT "any" AS src, nk AS k FROM
          (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier) AS u""",
    # window-function superset (OVER in the engine dialect, SURVEY §2.4
    # "not present"): top-3 per segment via QUALIFY — the post-window
    # filter without the subquery wrapper (alias rnk keeps its pre-filter
    # numbering; the engine computes the predicate alongside the
    # projection and Catalyst CSEs the duplicated window spec)
    # r13: extended with a GROUPED projection window — rank() OVER
    # (ORDER BY sum(...)) evaluates AFTER the aggregation (ANSI), and
    # QUALIFY references the window alias; the inner block keeps the
    # original per-customer row_number + window-alias WHERE coverage
    "q23_window_rank": """
        SELECT c_mktsegment, count(*) AS n_top, round(sum(c_acctbal), 2) AS top_bal,
               rank() OVER (ORDER BY sum(c_acctbal) DESC, c_mktsegment) AS seg_rank
        FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey) AS rnk
              FROM customer) t
        WHERE rnk <= 3
        GROUP BY c_mktsegment
        QUALIFY seg_rank <= 5""",
    # lag + moving-frame aggregate over event time per user (telemetry
    # shape); integer-cent domain so the moving sum is exact cross-engine.
    # Named WINDOW specs (w / w3) — same clause the DuckDB oracle uses
    "q36_window_timeseries": """
        SELECT event_id, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
               sum(floor(value * 100 + 0.5))
                   OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3_cents
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    # NTILE + percent_rank sharing one named window; QUALIFY post-filter
    # + ANSI CASE and last_value IGNORE NULLS (the gap-fill idiom:
    # running latest non-null over the named window)
    "q37_window_quartiles": """
        SELECT c_mktsegment, c_custkey,
               cast(ntile(4) OVER w AS long) AS quartile,
               floor(percent_rank() OVER w * 1000000) AS prank_x1e6,
               CASE WHEN c_acctbal < 0 THEN "neg" WHEN c_acctbal < 5000 THEN "mid" ELSE "high" END AS band,
               last_value(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END)
                 IGNORE NULLS OVER w AS last_named
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        QUALIFY c_custkey < 300""",
    # correlated scalar subqueries in the select list — decorrelated by the
    # engine into one aggregate + one left join per subquery (superset: the
    # reference refuses all WHERE/select subqueries,
    # plan/planner_select.go:94-98). count() coalesces to 0 on empty
    # correlated sets (the classic count-bug). beats_all: correlated
    # QUANTIFIED comparison (> ALL) via the min/max rewrite — per-key
    # aggregate + left join, vacuous TRUE on customers without orders
    # round 7 additions: last_affordable = RANGE-correlated scalar (probe-
    # frame decorrelation), n_plus1 = composite count expression (empty-set
    # value 1, not NULL), has_urgent = correlated IN as a select-list
    # column, last_prio = multi-key ORDER BY … LIMIT 1 top-1 lookup
    "q38_correlated_scalar": """
        SELECT c_custkey,
               (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_order,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
               (SELECT count(*) + 1 FROM orders WHERE o_custkey = c_custkey) AS n_plus1,
               (SELECT max(o2.o_orderdate) FROM orders AS o2
                WHERE o2.o_custkey = c_custkey
                  AND o2.o_totalprice <= c_acctbal * 50) AS last_affordable,
               "1-URGENT" IN (SELECT o3.o_orderpriority FROM orders AS o3
                              WHERE o3.o_custkey = c_custkey) AS has_urgent,
               (SELECT o4.o_orderpriority FROM orders AS o4
                WHERE o4.o_custkey = c_custkey
                ORDER BY o4.o_orderdate DESC, o4.o_orderkey ASC LIMIT 1) AS last_prio,
               c_acctbal * 100 > ALL (SELECT o.o_totalprice FROM orders AS o
                                      WHERE o.o_custkey = c_custkey) AS beats_all,
               c_nationkey IN (SELECT o5.o_orderkey % 25 FROM orders AS o5
                               WHERE o5.o_custkey = c_custkey
                                 AND o5.o_totalprice < c_acctbal * 100) AS nat_match,
               (SELECT max(s) FROM (SELECT sum(o6.o_totalprice) AS s FROM orders AS o6
                                    WHERE o6.o_custkey = c_custkey
                                    GROUP BY o6.o_orderdate) t) AS max_daily,
               (SELECT count(*) FROM orders AS o7
                WHERE o7.o_custkey = c_custkey
                GROUP BY o7.o_custkey) AS n_grouped
        FROM customer
        WHERE c_custkey < 200""",
    # TPC-H Q17 shape: correlated aggregate subquery in WHERE against the
    # SAME fact table (self-decorrelation) — lowered to one avg-per-partkey
    # aggregate + one join; a tuple-at-a-time engine re-scans lineitem per
    # outer row. The arithmetic (0.2 * avg) rides inside the aggregated frame
    "q39_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size < 15
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem AS l2
                            WHERE l2.l_partkey = p_partkey)""",
    # leading WITH CTEs (ANSI superset — the reference's WITH is only the
    # trailing config map): chained CTEs, the second referencing the first;
    # each CTE is a lazy plan, so Catalyst inlines and pushes the final
    # filter through both
    # round 7: a RECURSIVE member joins the chain — semi-naive union
    # fixpoint (engine._recursive_cte); the tier series bounds n_big 3..7
    "q41_cte_chain": """
        WITH RECURSIVE tiers AS (
            SELECT 3 AS tier UNION ALL SELECT tier + 1 FROM tiers WHERE tier < 7
        ), big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
        ), per_cust AS (
            SELECT o_custkey, count(*) AS n_big, round(sum(o_totalprice), 2) AS total
            FROM big_orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_mktsegment, n_big, total
        FROM customer JOIN per_cust ON per_cust.o_custkey = c_custkey
                      JOIN tiers ON per_cust.n_big = tiers.tier""",
    # round 15: aggregates AND scalar subqueries inside CASE arms, in the
    # select list / HAVING / ORDER BY of one aggregated query — both
    # expression walkers (agg extraction + subquery lowering) recurse
    # into CASE (qlbridge_spark/engine_select.py, engine_subquery.py)
    "q42_case_composition": """
        SELECT o_orderpriority, count(*) AS n,
               CASE WHEN sum(o_totalprice) > (SELECT avg(o_totalprice) * 120 FROM orders)
                    THEN 'heavy' ELSE 'light' END AS band
        FROM orders
        GROUP BY o_orderpriority
        HAVING CASE WHEN count(*) > (SELECT count(*) / 10 FROM orders)
                    THEN 1 ELSE 0 END = 1
        ORDER BY CASE WHEN sum(o_totalprice) > (SELECT avg(o_totalprice) * 120 FROM orders)
                      THEN 0 ELSE 1 END, o_orderpriority""",
}

# FilterQL statement (run through the engine's FilterQL path)
_FILTERQL = 'FILTER AND(c_acctbal > 5000, c_mktsegment = "MACHINERY") FROM customer'


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).sql(_Q[name])

    return run


def _q_filterql(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    df = eng.execute(_FILTERQL)
    return df.select("c_custkey", "c_acctbal").orderBy("c_custkey")


# ---------------------------------------------------------------------------
# datapipe operators (dedup / similarity / text) — extensions
# ---------------------------------------------------------------------------
def _docs(spark, sf_dir):
    return _engine(spark, sf_dir).table("documents")


def _emb(spark, sf_dir):
    return _engine(spark, sf_dir).table("embeddings")


def _dp_exact_dedup(spark, sf_dir):
    # round 7: composed with benchmark DECONTAMINATION — docs sharing any
    # 8-gram with the "benchmark" subset (doc_id % 97 == 0, standing in
    # for an eval set) are dropped after the exact dedup, the test-set
    # leakage guard every training pipeline runs
    from qlbridge_spark.datapipe import decontaminate, dedup_exact, release_caches
    from qlbridge_spark.datapipe.dedup import _track

    release_caches()  # drop any prior dedup entry's persisted intermediates
    d = _docs(spark, sf_dir)
    # the dedup output is consumed THREE times (corpus gram side, bench
    # gram side, final anti-join left) — without the cut the full-row
    # groupBy(text) + min-struct aggregation re-ran per consumer
    # (measured ~4x at sf0.1: median 4.27s -> 0.97s, identical output)
    deduped = _track(dedup_exact(d, ["text"], keep="doc_id").persist())
    bench = deduped.where(F.col("doc_id") % 97 == 0)
    return decontaminate(deduped, bench, "doc_id", "text", n=8).select("doc_id", "lang", "n_chars")


def _dp_fingerprint(spark, sf_dir):
    from qlbridge_spark.datapipe import fingerprint

    d = _docs(spark, sf_dir)
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _dp_token_count(spark, sf_dir):
    # round 7: per-CHUNK granularity — token counting + the training-data
    # chunking op (32-token windows, 8 overlap; datapipe.chunk_documents,
    # zero-shuffle posexplode) in one oracle-gated frame.
    # round 9: language-ID folded in (formerly standalone dp05 — the
    # driver scores at most 50 entries; the freed slot goes to dp17's
    # TF-IDF so every declared operator keeps a driver-green oracle row);
    # the per-doc lang tag rides the existing doc-grain side of the join,
    # the realistic chunking+stats+language curation projection
    from qlbridge_spark.datapipe import chunk_documents, lang_id, token_count

    d = _docs(spark, sf_dir)
    chunks = chunk_documents(d, "doc_id", "text", chunk_tokens=32, overlap=8)
    counts = d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        token_count(F.col("text"), "bpe").cast("long").alias("bpe_tokens"),
        lang_id(F.col("text")).alias("lang_detected"),
    )
    return chunks.join(counts, "doc_id").select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        F.md5("chunk_text").alias("chunk_md5"),
        "ws_tokens",
        "bpe_tokens",
        "lang_detected",
    )


def _dp_quality(spark, sf_dir):
    from qlbridge_spark.datapipe import quality_score

    # floor-scaling instead of round(): Spark rounds the shortest decimal
    # repr (BigDecimal.valueOf, HALF_UP) while DuckDB rounds the binary
    # value — they disagree on values like 0.76155; floor is stable.
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.floor(quality_score(F.col("text"), F.col("n_chars")) * 10000).cast("long").alias("quality_x1e4"),
    )


def _dp_ann_topk(spark, sf_dir):
    from qlbridge_spark.datapipe import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=10).select(
        "query_id", "neighbor_id", "rank"
    )


def _dp_minhash_pairs(spark, sf_dir):
    # production two-phase shape: MinHash LSH candidates + EXACT n-gram
    # Jaccard verify, which the DuckDB oracle computes directly.
    # bands=16, r=2 over 32 hashes: a true pair at the corpus's weakest
    # observed similarity (j≈0.89) misses with prob (1-j²)^16 ≈ 1e-11 —
    # still oracle-lossless — while low-similarity false candidates
    # collapse (r=1 admits a j=0.3 pair with prob ~1.0; r=2 needs two
    # consecutive hash agreements). Measured at sf0.1: identical 256-pair
    # output, ~2× faster than r=1/bands=32 (verify volume dominates).
    # floor(j*1e4) avoids cross-engine float-rounding divergence.
    from qlbridge_spark.datapipe import lsh_jaccard_pairs, release_caches

    release_caches()  # drop any prior dedup entry's persisted intermediates
    d = _docs(spark, sf_dir)
    return lsh_jaccard_pairs(d, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16).select(
        "id_a", "id_b", F.floor(F.col("jaccard") * 10000).cast("long").alias("j_x1e4")
    )


def _dp_dedup_keep_best(spark, sf_dir):
    # end-to-end near-dup CURATION: LSH pairs → connected clusters →
    # keep the highest-quality member per cluster (longest text here;
    # ties → min id) — the representative choice a training-data
    # pipeline actually wants (full article beats truncated scrape).
    # Unpaired docs survive untouched.
    from qlbridge_spark.datapipe import dedup_keep_best, lsh_jaccard_pairs, release_caches

    release_caches()
    d = _docs(spark, sf_dir).select("doc_id", "text").withColumn("q", F.length("text").cast("long"))
    pairs = lsh_jaccard_pairs(d, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16)
    return dedup_keep_best(d, "doc_id", pairs, "q").select("doc_id", F.col("q").alias("qlen"))


def _dp_simhash_pairs(spark, sf_dir):
    # portable=True derives token-hash bits from md5 so the DuckDB oracle
    # can replicate the signature bit-for-bit (xxhash64 is the scale-path
    # default, exercised by pytest)
    from qlbridge_spark.datapipe import release_caches, simhash_pairs

    release_caches()
    # zero-token docs get all-zero signatures and would pair with each
    # other (correct operator behavior) but have no rows in the oracle's
    # token-unnest CTE — exclude them on BOTH sides for a well-defined
    # comparison (the oracle filters identically)
    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    return simhash_pairs(d, "doc_id", "text", max_hamming=6, portable=True).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _dp_ngram_jaccard(spark, sf_dir):
    from qlbridge_spark.datapipe import ngram_jaccard_pairs

    d = _docs(spark, sf_dir)
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4, df_cap=250).select(
        "id_a", "id_b", F.floor(F.col("jaccard") * 10000).cast("long").alias("j_x1e4")
    )


def _dp_prefix_jaccard(spark, sf_dir):
    # PPJoin-family prefix filtering: recall-LOSSLESS exact Jaccard join
    # (unlike dp09's df_cap stop-gram heuristic), so the oracle is simply
    # the exhaustive exact pair set
    from qlbridge_spark.datapipe import prefix_jaccard_pairs, release_caches

    release_caches()
    d = _docs(spark, sf_dir)
    return prefix_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6).select(
        "id_a", "id_b", F.floor(F.col("jaccard") * 10000).cast("long").alias("j_x1e4")
    )


def _dp_ivf_topk(spark, sf_dir):
    # method='min_id' picks the n_cells smallest ids as centroids — same
    # orderBy+limit scale path as 'hash', but replicable in ANSI SQL
    from qlbridge_spark.datapipe import ivf_build, ivf_topk

    emb = _emb(spark, sf_dir)
    assigned, cents = ivf_build(emb, n_cells=8, method="min_id")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(assigned, cents, queries, k=5, nprobe=3).select("query_id", "neighbor_id", "rank")


def _dp_sessionize(spark, sf_dir):
    from qlbridge_spark.datapipe import session_stats

    ev = _engine(spark, sf_dir).table("events").filter(F.col("user_id") < 50)
    s = session_stats(ev, "user_id", "ts", gap_minutes=60.0)
    return s.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        F.unix_timestamp("t_start").alias("start_s"),
        F.unix_timestamp("t_end").alias("end_s"),
    )


def _dp_curation_report(spark, sf_dir):
    # composite pipeline: per-language corpus stats (the shape of a
    # training-data QA rollup: derive row features → group → aggregate).
    # round 7: + per-language average top-BIGRAM coverage (the Gopher /
    # RefinedWeb repetition-filter family, datapipe.ngram_repetition)
    from qlbridge_spark.datapipe import quality_score, token_count
    from qlbridge_spark.datapipe.text import _ngram_rep_stats

    # r17: top_frac is computed INLINE on the same scan (the per-doc top
    # bigram is row-local — see _ngram_rep_stats), replacing the r16
    # shape's ngram_repetition + left self-join on doc_id: 10 exchanges
    # (two string-keyed aggs + SMJ) collapse to the single groupBy(lang)
    # exchange below. Output identical: doc_id is unique in documents, so
    # the old 1:1 left join added exactly the top_frac column.
    d = _docs(spark, sf_dir)
    stats = _ngram_rep_stats(
        d,
        [
            F.col("lang"),
            token_count(F.col("text")).cast("long").alias("toks"),
            quality_score(F.col("text"), F.col("n_chars")).alias("q"),
            F.col("n_chars"),
        ],
        F.col("text"),
        2,
    )
    derived = stats.select(
        "lang",
        "toks",
        "q",
        "n_chars",
        F.when(F.col("__tot") > 0, F.col("__st.best") / F.col("__tot")).alias("top_frac"),
    )
    return (
        derived.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("toks").alias("tokens"),
            F.round(F.avg("q"), 3).alias("avg_quality"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("top_frac"), 3).alias("avg_rep"),
        )
        .orderBy("lang")
    )


def _dp_asof_join(spark, sf_dir):
    # as-of join (operator Spark lacks; DuckDB oracles it natively with
    # ASOF LEFT JOIN): each purchase event matched to the user's most
    # recent prior click. Union + last-value window = ONE shuffle on the
    # key, no range-join explosion (datapipe/asof.py scale notes).
    from qlbridge_spark.datapipe import asof_join

    ev = _engine(spark, sf_dir).table("events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    # collapse same-(user, ts) clicks to max event_id FIRST: DuckDB's ASOF
    # tie choice among equal timestamps is unspecified, so both engines
    # must see a unique right row per (user, ts)
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(left, right, on="ts", by="user_id", tiebreak="click_id")
    return out.select(
        "event_id",
        "user_id",
        "click_id",
        # NTZ-safe: parquet timestamp[us] reads as TIMESTAMP_NTZ in Spark 4;
        # session tz is UTC so the LTZ cast matches DuckDB's naive epoch_us
        F.unix_micros(F.col("ts_right").cast("timestamp_ltz")).alias("click_us"),
    )


def _dp_stratified_sample(spark, sf_dir):
    # deterministic portable stratified sampling (hash-threshold on salted
    # md5): downsample high-resource languages, keep the rest — reruns and
    # other engines select the IDENTICAL row set (no rand()/sample()).
    # round 7: composed with cap_per_group (domain-quota curation): at
    # most 40 surviving docs per language, chosen by the same portable
    # salted-md5 draw, so the whole selection stays engine-reproducible
    from qlbridge_spark.datapipe import cap_per_group, hash_sample

    # second-half round 7: + fractional-epoch MIXTURE member (the
    # "2.7 epochs of wiki" primitive) — epoch 0 is the full corpus, the
    # 0.3-epoch tail is the same portable salted-md5 draw, so the DuckDB
    # oracle reproduces the mixture row-for-row
    from qlbridge_spark.datapipe.sampling import mix_corpora

    d = _docs(spark, sf_dir)
    sampled = hash_sample(
        d, "doc_id", {"en": 0.5, "de": 0.25}, strata_col="lang", default_rate=1.0, salt="cur1"
    )
    capped = cap_per_group(sampled, "lang", 40, key_col="doc_id", salt="cap1").select("doc_id", "lang")
    mixed = mix_corpora({"w": (d, 1.3)}, "doc_id", salt="mx1").select(
        "doc_id",
        F.concat(F.col("__source"), F.lit(":"), F.col("__epoch").cast("string")).alias("lang"),
    )
    return capped.unionByName(mixed)


def _dp_tfidf_terms(spark, sf_dir):
    # top-3 characteristic terms per doc; integer-exact scoring (see
    # tfidf_top_terms docstring) so ranks can't flip on libm ulp noise
    from qlbridge_spark.datapipe import tfidf_top_terms

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    return tfidf_top_terms(d, "doc_id", "text", k=3).select(
        "doc_id", F.col("rank").cast("long").alias("rank"), "term", "tf", "df", "score"
    )


def _dp_multimodal(spark, sf_dir):
    # doc_id < 50 (not .limit) so the row set is deterministic for the
    # oracle; the decode itself is the real Arrow mapInPandas path
    from qlbridge_spark.datapipe.multimodal import attach_fake_payload, decode_features

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    mm = attach_fake_payload(d, "doc_id", "text")
    return decode_features(mm).select("doc_id", "n_bytes", "sha256")


def _dp_frame_sample(spark, sf_dir):
    # video-style frame sampling over binary payloads (real Arrow
    # mapInPandas batch path; fake "frames" = evenly-spaced byte ranges).
    # ASCII-only guard makes byte offsets equal char offsets so DuckDB can
    # replicate the slices with VARCHAR substring (no BLOB substring).
    from qlbridge_spark.datapipe.multimodal import attach_fake_payload, frame_sample

    d = _docs(spark, sf_dir).filter(
        (F.col("doc_id") < 50) & (F.octet_length("text") == F.char_length("text"))
    )
    mm = attach_fake_payload(d, "doc_id", "text", modality="video")
    return frame_sample(mm, n_frames=4).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"), "frame_sha256", "frame_bytes"
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _Q:
        out[name] = _sql_query(name)
    out["q21_filterql"] = _q_filterql
    out["dp01_exact_dedup"] = _dp_exact_dedup
    out["dp02_fingerprint"] = _dp_fingerprint
    out["dp03_token_count"] = _dp_token_count
    # dp05 (lang-id) folded into dp03_token_count's doc-grain side in
    # round 9: the driver scores at most 50 entries, and dp17_tfidf_terms
    # was the one declared operator without a driver CORRECTNESS row —
    # the fold frees its slot while keeping lang-id oracle-gated (dp03 is
    # off the bench headline list, so the bench's dp04 line stays a pure
    # quality-scoring measurement)
    out["dp04_quality"] = _dp_quality
    out["dp06_ann_topk"] = _dp_ann_topk
    out["dp07_minhash_pairs"] = _dp_minhash_pairs
    out["dp08_simhash_pairs"] = _dp_simhash_pairs
    out["dp09_ngram_jaccard"] = _dp_ngram_jaccard
    out["dp10_ivf_topk"] = _dp_ivf_topk
    out["dp11_multimodal_decode"] = _dp_multimodal
    out["dp12_sessionize"] = _dp_sessionize
    # dp13 (brute-force cosine pairs) retired: its machinery is a strict
    # subset of dp06's scorer + embedding_dup_pairs' pytest coverage, and
    # the driver scores at most 50 entries — slot given to dp15-dp19.
    out["dp14_curation_report"] = _dp_curation_report
    out["dp15_asof_join"] = _dp_asof_join
    out["dp18_frame_sample"] = _dp_frame_sample
    out["dp19_prefix_jaccard"] = _dp_prefix_jaccard
    out["dp20_dedup_keep_best"] = _dp_dedup_keep_best
    out["dp16_stratified_sample"] = _dp_stratified_sample
    out["dp17_tfidf_terms"] = _dp_tfidf_terms
    return out


def oracle_sql() -> dict[str, str]:
    from qlbridge_spark.datapipe.text import LANG_MARKERS

    # language-ID oracle: replicate the marker-count argmax in SQL
    def marker_count(lang):
        words = "|".join(LANG_MARKERS[lang])
        return f"len(regexp_extract_all(lower(text), '\\b({words})\\b'))"

    langs = sorted(LANG_MARKERS)
    counts = ", ".join(f"{marker_count(lg)} AS c_{lg}" for lg in langs)
    greatest = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    case = " ".join(f"WHEN c_{lg} = __g THEN '{lg}'" for lg in langs)

    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "q02_filter_projection": """
            SELECT p_partkey, upper(p_brand) AS brand_uc,
                   round(p_retailprice * 1.1, 2) AS bumped,
                   length(p_name) AS name_len
            FROM part WHERE p_size > 10 AND p_size < 20
            ORDER BY p_partkey""",
        "q03_join_revenue": """
            SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderstatus <> 'F'
            GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "q04_semi_join": """
            SELECT o_orderpriority, count(*) AS n FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "q05_multi_join_revenue": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name ORDER BY revenue DESC""",
        "q06_range_agg": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_discount > 0.04 AND l_discount < 0.07 AND l_quantity < 24
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'""",
        "q07_count_distinct": """
            SELECT count(DISTINCT c_mktsegment) AS segs,
                   count(DISTINCT c_nationkey) AS nations,
                   CAST(sum(DISTINCT c_nationkey) AS BIGINT) AS sum_nations,
                   CAST(avg(DISTINCT c_nationkey) AS DOUBLE) AS avg_nations
            FROM customer""",
        "q09_having": """
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
                   round(count(*) / (SELECT avg(c_acctbal) FROM customer), 6) AS per_bal
            FROM orders
            GROUP BY o_custkey HAVING count(*) > 12
            ORDER BY count(*) DESC, o_custkey""",
        "q11_left_join": """
            SELECT r_name, n_name, CAST(count(c_custkey) AS BIGINT) AS n_cust
            FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
                          LEFT JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
            ORDER BY r_name, n_name""",
        "q12_string_funcs": """
            SELECT c_custkey, lower(c_name) AS lname,
                   md5(c_name) AS md5h,
                   starts_with(c_name, 'Customer#0000001') AS pfx,
                   substr(c_name, 10, 8) AS numpart,
                   concat_ws('|', c_name, c_mktsegment) AS joined,
                   'ex.com' AS hostc,
                   CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment END AS qsv,
                   CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier,
                   round(coalesce(c_acctbal, 0), 2) AS bal,
                   (c_custkey % 2 = 0) AS hasq,
                   array_to_string(list_transform([c_name, c_mktsegment], x -> lower(x)), '|') AS lowered,
                   CAST(list_reduce(list_transform(string_split(c_name, '#'), x -> length(x)),
                                    (acc, x) -> acc + x) AS BIGINT) AS csum
            FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""",
        "q13_time_funcs": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) % 100 AS BIGINT) AS yy2,
                   CAST(month(o_orderdate) AS BIGINT) AS m,
                   CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
                   CAST(hour(o_orderdate) AS BIGINT) AS hod,
                   strftime(o_orderdate, '%y%m') AS ym,
                   extract(quarter FROM o_orderdate) AS qtr,
                   extract(isodow FROM o_orderdate) AS idw,
                   extract(week FROM o_orderdate) AS wk,
                   CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep
            FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""",
        "q14_like_in": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment LIKE '%BUILD%' OR c_mktsegment IN ('MACHINERY', 'FURNITURE')
            ORDER BY c_custkey""",
        "q16_subquery_from": """
            SELECT c_mktsegment AS seg, round(avg(c_acctbal), 2) AS avg_bal, count(*) AS n
            FROM (SELECT * EXCLUDE (c_custkey, c_name, c_nationkey)
                           REPLACE (c_acctbal * 1.0 AS c_acctbal)
                  FROM customer WHERE c_acctbal > 0) AS t
            GROUP BY ALL
            ORDER BY ALL""",
        "q17_events_json": """
            SELECT event_type, count(*) AS n,
                   round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type""",
        "q18_hourly_buckets": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr, count(*) AS n,
                   round(sum(value), 2) AS total
            FROM events GROUP BY hr ORDER BY hr LIMIT 100""",
        "q19_math_cast": """
            SELECT p_partkey, round(sqrt(p_retailprice), 4) AS rt,
                   round(pow(p_size, 2), 1) AS sz2,
                   CAST(p_size AS BIGINT) AS roundtrip,
                   p_size % 7 AS szmod,
                   CAST(sign(p_retailprice - 1500) AS BIGINT) AS sg,
                   trunc(p_retailprice / 100) AS trc,
                   CAST(greatest(p_size, 25) AS BIGINT) AS gst,
                   round(ln(p_retailprice), 4) AS lnp,
                   upper(substring(p_name, 1, 10)) AS nm10,
                   trim(concat_ws('-', p_brand, CAST(p_size AS VARCHAR))) AS bs
            FROM part WHERE p_partkey < 200 ORDER BY p_partkey""",
        "q20_literal": """SELECT 1 AS one, 'hello' AS greeting, 2 * 3 AS six""",
        "q25_distinct_multi": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus
            LIMIT 4 OFFSET 1""",
        "q26_minmax": """
            WITH modes AS (
              SELECT c_mktsegment, c_nationkey AS mode_nk
              FROM (SELECT c_mktsegment, c_nationkey, count(*) AS c
                    FROM customer GROUP BY 1, 2)
              QUALIFY row_number() OVER (
                PARTITION BY c_mktsegment
                ORDER BY c DESC, c_nationkey) = 1
            )
            SELECT g.c_mktsegment, g.lo, g.hi, g.sd, g.sdp, g.vp, g.vs,
                   g.med_nk, g.p25_nk, modes.mode_nk,
                   g.med_d, g.p25_d, g.mode_d, g.cr, g.cr0
            FROM (
              SELECT c_mktsegment, round(min(c_acctbal), 2) AS lo,
                     round(max(c_acctbal), 2) AS hi,
                     round(stddev_samp(c_acctbal), 2) AS sd,
                     round(stddev_pop(c_acctbal), 2) AS sdp,
                     round(var_pop(c_acctbal), 2) AS vp,
                     round(var_samp(c_acctbal), 2) AS vs,
                     median(c_nationkey) AS med_nk,
                     quantile_cont(c_nationkey, 0.25) AS p25_nk,
                     round(median(DISTINCT c_acctbal), 2) AS med_d,
                     quantile_cont(DISTINCT c_nationkey, 0.25) AS p25_d,
                     -- mode(DISTINCT) ≡ min: every distinct value occurs
                     -- once, ties resolve to the smallest (engine contract)
                     min(c_nationkey) AS mode_d,
                     round(corr(c_acctbal, c_custkey), 4) AS cr,
                     corr(c_acctbal * 0, c_custkey) AS cr0
              FROM customer GROUP BY c_mktsegment) g
            JOIN modes USING (c_mktsegment)
            ORDER BY g.c_mktsegment""",
        "q28_cross_join": """
            SELECT * FROM (
              SELECT v.grp, u.w AS word, count(*) AS n
              FROM part p,
                   UNNEST(string_split(p.p_name, ' ')) AS u(w),
                   (VALUES (1, 'a'), (2, 'b')) AS v(k, grp)
              WHERE p.p_partkey <= 100
              GROUP BY v.grp, u.w
              ORDER BY n DESC NULLS LAST, word, grp
              LIMIT 40) t0
            UNION ALL
            SELECT 'pv' AS grp, o_orderpriority AS word, open_cnt AS n
            FROM (SELECT o_orderpriority, o_orderstatus FROM orders) s
                 PIVOT (count(*) FOR o_orderstatus IN ('O' AS open_cnt)) pv
            UNION ALL
            SELECT 'up' AS grp, metric AS word, val AS n
            FROM (SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs
                  FROM orders) agg
                 UNPIVOT (val FOR metric IN (n_orders, n_custs)) up""",
        "q30_dow_profile": """
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, event_type, count(*) AS n
            FROM events
            WHERE ts > TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
            GROUP BY dayofweek(ts), event_type
            ORDER BY dow, event_type""",
        "q31_top_nation_customers": """
            SELECT * FROM (
              SELECT n_name, c_name, round(c_acctbal, 2) AS bal
              FROM (SELECT c_name, c_acctbal, c_nationkey FROM customer WHERE c_acctbal > 9000) AS rich
                JOIN nation ON rich.c_nationkey = n_nationkey
              ORDER BY bal DESC, c_name LIMIT 25) top25
            UNION ALL
            SELECT n_name, l.c_name, l.bal
            FROM nation, LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
                                  FROM customer
                                  WHERE c_nationkey = n_nationkey
                                  ORDER BY c_acctbal DESC, c_name LIMIT 2) l""",
        "q32_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS qty,
                   CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            ORDER BY l_returnflag, l_linestatus""",
        "q34_negations": """
            SELECT p_partkey, p_brand, p_size
            FROM part
            WHERE p_brand NOT LIKE '%#4%'
              AND NOT (p_size > 10 AND p_size < 40)
              AND p_brand NOT IN ('Brand#55')
              AND p_partkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey < 50)
              AND NOT (p_partkey % 3 = 0)
            ORDER BY p_partkey""",
        "q21_filterql": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_acctbal > 5000 AND c_mktsegment = 'MACHINERY'
            ORDER BY c_custkey""",
        "q22_setops": """
            SELECT 'hi' AS src, c_custkey AS k FROM customer WHERE c_acctbal >= 8000
            UNION ALL
            SELECT 'lo' AS src, c_custkey AS k FROM customer WHERE c_acctbal < 1000
            UNION ALL
            SELECT 'both' AS src, nk AS k FROM
              (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'conly' AS src, nk AS k FROM
              (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT 'any' AS src, nk AS k FROM
              (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)""",
        "q23_window_rank": """
            SELECT c_mktsegment, count(*) AS n_top, round(sum(c_acctbal), 2) AS top_bal,
                   rank() OVER (ORDER BY sum(c_acctbal) DESC, c_mktsegment) AS seg_rank
            FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                         row_number() OVER (PARTITION BY c_mktsegment
                                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
                  FROM customer) t
            WHERE rnk <= 3
            GROUP BY c_mktsegment
            QUALIFY seg_rank <= 5""",
        "dp01_exact_dedup": """
            WITH deduped AS (
              SELECT doc_id, lang, n_chars, text FROM (
                SELECT doc_id, lang, n_chars, text,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM documents)
              WHERE rn = 1),
            grams AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(toks) - 7 < 1 THEN [array_to_string(toks, ' ')]
                            ELSE list_distinct(list_transform(generate_series(1, len(toks) - 7),
                                   i -> array_to_string(list_slice(toks, i, i + 7), ' '))) END) AS g
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM deduped)),
            bench_grams AS (
              SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0 AND g <> ''),
            contaminated AS (
              SELECT DISTINCT grams.doc_id FROM grams JOIN bench_grams USING (g))
            SELECT doc_id, lang, n_chars FROM deduped
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)""",
        "dp02_fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))), ' ')) AS fp
            FROM documents""",
        # round 9: + per-doc language tag (lang-id folded from retired dp05)
        "dp03_token_count": f"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     CAST(len(toks) AS BIGINT) AS ws_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
                     greatest(1, CAST(ceil((len(toks) - 8) / 24.0) AS INT)) AS n_chunks
              FROM t WHERE len(toks) > 0),
            ld AS (
              SELECT doc_id,
                     CASE WHEN __g < 1 THEN 'unknown' {case} ELSE 'unknown' END AS lang_detected
              FROM (SELECT doc_id, {counts}, {greatest} AS __g FROM documents))
            SELECT c.doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   CAST(len(list_slice(toks, i * 24 + 1, i * 24 + 32)) AS BIGINT) AS n_chunk_tokens,
                   md5(array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ')) AS chunk_md5,
                   ws_tokens, bpe_tokens, ld.lang_detected
            FROM c JOIN ld USING (doc_id), (SELECT unnest(generate_series(0, 9)) AS i) idx
            WHERE i < n_chunks""",
        "dp04_quality": """
            SELECT doc_id, CAST(floor((
              0.4 * least(n_chars / 500.0, 1.0)
              + 0.3 * (CASE WHEN n_toks > 0 THEN n_distinct / n_toks ELSE 0.0 END)
              + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 1.0 END)) * 10000) AS BIGINT) AS quality_x1e4
            FROM (
              SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
                     CAST(len(toks) AS DOUBLE) AS n_toks,
                     CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct,
                     CAST(len(regexp_extract_all(text, '[.,;:!?()\\[\\]{}<>/\\\\|@#$%^&*~`]')) AS DOUBLE) AS punct
              FROM (SELECT doc_id, text, n_chars,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM documents))""",
        "dp06_ann_topk": """
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC,
                                c.vec_id) AS rank
              FROM embeddings c, embeddings q
              WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
            WHERE rank <= 10""",
        "dp12_sessionize": """
            SELECT user_id, session_seq, count(*) AS n_events,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s
            FROM (
              SELECT user_id, ts,
                     -- RANGE frame (not ROWS): peers at the same ts must share a
                     -- session — a ROWS frame splits tie groups arbitrarily when
                     -- the flagged row does not sort first (Spark's sum-over-
                     -- orderBy default is RANGE, which is the deterministic form)
                     CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
              FROM (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 3600
                            THEN 1 ELSE 0 END AS new_sess
                FROM events WHERE user_id < 50))
            GROUP BY user_id, session_seq""",
        "dp14_curation_report": """
            WITH lt_t AS (
              SELECT doc_id, lang, text, n_chars,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS lt
              FROM documents),
            bigrams AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(lt) - 1),
                                    i -> lt[i] || ' ' || lt[i + 1])) AS g
              FROM lt_t WHERE len(lt) >= 2),
            per_g AS (SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g),
            rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_frac FROM per_g GROUP BY doc_id)
            SELECT lang, count(*) AS docs,
                   CAST(sum(toks) AS BIGINT) AS tokens,
                   round(avg(q), 3) AS avg_quality,
                   max(n_chars) AS max_chars,
                   round(avg(top_frac), 3) AS avg_rep
            FROM (
              SELECT lang, n_chars, top_frac,
                     CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS toks,
                     0.4 * least(n_chars / 500.0, 1.0)
                     + 0.3 * (CASE WHEN n_toks > 0 THEN n_distinct / n_toks ELSE 0.0 END)
                     + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 1.0 END) AS q
              FROM (
                SELECT lang, text, n_chars, top_frac,
                       CAST(len(lt) AS DOUBLE) AS n_toks,
                       CAST(len(list_distinct(lt)) AS DOUBLE) AS n_distinct,
                       CAST(len(regexp_extract_all(text, '[.,;:!?()\\[\\]{}<>/\\\\|@#$%^&*~`]')) AS DOUBLE) AS punct
                FROM (SELECT d.lang, d.text, d.n_chars, rep.top_frac,
                             list_filter(string_split_regex(lower(trim(d.text)), '\\s+'), x -> x <> '') AS lt
                      FROM documents d LEFT JOIN rep ON rep.doc_id = d.doc_id)))
            GROUP BY lang ORDER BY lang""",
        # dp07: the Spark side is MinHash-LSH candidates + exact n-gram
        # Jaccard verify with single-hash bands (the entry runs
        # num_hashes=bands=32, so a true pair at j>=0.5 is missed with
        # prob (1-j)^32 <= 2^-32; over the few hundred true pairs at any
        # tested SF the expected miss is < 1e-7), so its output equals the
        # exhaustive exact pair set — which SQL computes directly via an
        # inverted-index self-join.
        "dp07_minhash_pairs": """
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) - 2 < 1 THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM documents)),
            inv AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
                     any_value(a.ng) AS na, any_value(b.ng) AS nb
              FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(floor(10000 * (inter / CAST(na + nb - inter AS DOUBLE))) AS BIGINT) AS j_x1e4
            FROM pairs
            WHERE inter / CAST(na + nb - inter AS DOUBLE) >= 0.5""",
        # dp20: dp07's exact pair set → connected components via recursive
        # min-label propagation (small-graph oracle; the engine runs
        # pointer-jumping) → per-cluster winner by (length(text) DESC,
        # doc_id ASC); unpaired docs survive.
        "dp20_dedup_keep_best": """
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) - 2 < 1 THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM documents)),
            inv AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
                     any_value(a.ng) AS na, any_value(b.ng) AS nb
              FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
            dup AS (SELECT id_a, id_b FROM pairs
                    WHERE inter / CAST(na + nb - inter AS DOUBLE) >= 0.5),
            edges AS (SELECT id_a AS a, id_b AS b FROM dup
                      UNION ALL SELECT id_b AS a, id_a AS b FROM dup),
            reach(node, lbl) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b),
            comp AS (SELECT node, min(lbl) AS comp FROM reach GROUP BY node),
            scored AS (SELECT c.node, c.comp, length(d.text) AS q
                       FROM comp c JOIN documents d ON d.doc_id = c.node),
            losers AS (SELECT node FROM (
                SELECT node, row_number() OVER (PARTITION BY comp ORDER BY q DESC, node ASC) AS rn
                FROM scored) WHERE rn > 1)
            SELECT doc_id, CAST(length(text) AS BIGINT) AS qlen
            FROM documents
            WHERE doc_id NOT IN (SELECT node FROM losers)""",
        # dp08: full SimHash replica — md5-derived 64-bit token hashes
        # (portable=True on the Spark side), per-bit +/-1 votes, 4×16-bit
        # chunks (MSB-first fold), pigeonhole banding on equal chunks,
        # exact Hamming via bit_count(xor).
        "dp08_simhash_pairs": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS tok
              FROM documents WHERE trim(text) <> ''),
            th AS (
              SELECT doc_id,
                     CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS hi,
                     CAST(concat('0x', substring(md5(tok), 9, 8)) AS BIGINT) AS lo
              FROM toks),
            votes AS (
              SELECT doc_id, j,
                     sum(CASE WHEN (CASE WHEN j < 32 THEN (lo >> j) & 1
                                         ELSE (hi >> (j - 32)) & 1 END) = 1
                              THEN 1 ELSE -1 END) AS v
              FROM th, (SELECT unnest(generate_series(0, 63)) AS j)
              GROUP BY doc_id, j),
            chunks AS (
              SELECT doc_id, CAST(j // 16 AS INT) AS c,
                     sum((CASE WHEN v > 0 THEN 1 ELSE 0 END) << (15 - (j % 16))) AS cv
              FROM votes GROUP BY doc_id, j // 16),
            sigs AS (
              SELECT doc_id,
                     max(CASE WHEN c = 0 THEN cv END) AS c0,
                     max(CASE WHEN c = 1 THEN cv END) AS c1,
                     max(CASE WHEN c = 2 THEN cv END) AS c2,
                     max(CASE WHEN c = 3 THEN cv END) AS c3
              FROM chunks GROUP BY doc_id)
            SELECT id_a, id_b, hamming FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                        + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS BIGINT) AS hamming
              FROM sigs a JOIN sigs b
                ON a.doc_id < b.doc_id
               AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3))
            WHERE hamming <= 6""",
        # dp09: exact replica of the inverted-index n-gram Jaccard with the
        # df_cap stop-gram guard (intersections count only rare grams;
        # union sizes use the full gram sets — same as the Spark pipeline).
        "dp09_ngram_jaccard": """
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) - 2 < 1 THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM documents)),
            inv0 AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
            rare AS (SELECT gram FROM inv0 GROUP BY gram HAVING count(*) <= 250),
            inv AS (SELECT inv0.* FROM inv0 JOIN rare USING (gram)),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
                     any_value(a.ng) AS na, any_value(b.ng) AS nb
              FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(floor(10000 * (inter / CAST(na + nb - inter AS DOUBLE))) AS BIGINT) AS j_x1e4
            FROM pairs
            WHERE inter / CAST(na + nb - inter AS DOUBLE) >= 0.4""",
        # dp10: full IVF replica — centroids = 8 smallest vec_ids
        # (method='min_id'), nearest-centroid assignment, nprobe=3 probes,
        # top-5 within probed cells; all tie-breaks by id.
        "dp10_ivf_topk": """
            WITH cents AS (
              SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS centroid
              FROM embeddings ORDER BY vec_id LIMIT 8),
            assigned AS (
              SELECT vec_id, embedding, cell_id FROM (
                SELECT c.vec_id, c.embedding, k.cell_id,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), k.centroid) DESC,
                                  k.cell_id) AS rk
                FROM embeddings c, cents k)
              WHERE rk = 1),
            probes AS (
              SELECT query_id, qv, cell_id FROM (
                SELECT q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv, k.cell_id,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), k.centroid) DESC,
                                  k.cell_id) AS rk
                FROM embeddings q, cents k WHERE q.vec_id < 5)
              WHERE rk <= 3)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT p.query_id, a.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY p.query_id
                       ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), p.qv) DESC,
                                a.vec_id) AS rank
              FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
              WHERE a.vec_id <> p.query_id)
            WHERE rank <= 5""",
        # dp11: the fake payload is the UTF-8 bytes of text, so sha256 and
        # byte length are direct DuckDB builtins (the Spark side still runs
        # the real Arrow mapInPandas decode path).
        "dp11_multimodal_decode": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha256
            FROM documents WHERE doc_id < 50""",
        "q36_window_timeseries": """
            SELECT event_id, user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents
            FROM events
            WHERE user_id < 20
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "q37_window_quartiles": """
            SELECT c_mktsegment, c_custkey,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS prank_x1e6,
                   CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
                   last_value(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END IGNORE NULLS)
                     OVER w AS last_named
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
            QUALIFY c_custkey < 300""",
        "q38_correlated_scalar": """
            SELECT c_custkey,
                   (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS top_order,
                   CAST((SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS BIGINT) AS n_orders,
                   CAST((SELECT count(*) + 1 FROM orders WHERE o_custkey = c_custkey) AS BIGINT) AS n_plus1,
                   (SELECT max(o2.o_orderdate) FROM orders AS o2
                    WHERE o2.o_custkey = c_custkey
                      AND o2.o_totalprice <= c_acctbal * 50) AS last_affordable,
                   '1-URGENT' IN (SELECT o3.o_orderpriority FROM orders AS o3
                                  WHERE o3.o_custkey = c_custkey) AS has_urgent,
                   (SELECT o4.o_orderpriority FROM orders AS o4
                    WHERE o4.o_custkey = c_custkey
                    ORDER BY o4.o_orderdate DESC, o4.o_orderkey ASC LIMIT 1) AS last_prio,
                   c_acctbal * 100 > ALL (SELECT o.o_totalprice FROM orders AS o
                                          WHERE o.o_custkey = c_custkey) AS beats_all,
                   c_nationkey IN (SELECT o5.o_orderkey % 25 FROM orders AS o5
                                   WHERE o5.o_custkey = c_custkey
                                     AND o5.o_totalprice < c_acctbal * 100) AS nat_match,
                   (SELECT max(s) FROM (SELECT sum(o6.o_totalprice) AS s FROM orders AS o6
                                        WHERE o6.o_custkey = c_custkey
                                        GROUP BY o6.o_orderdate) t) AS max_daily,
                   CAST((SELECT count(*) FROM orders AS o7
                         WHERE o7.o_custkey = c_custkey
                         GROUP BY o7.o_custkey) AS BIGINT) AS n_grouped
            FROM customer
            WHERE c_custkey < 200""",
        "q39_small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_size < 15
              AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem AS l2
                                WHERE l2.l_partkey = p_partkey)""",
        "q41_cte_chain": """
            WITH RECURSIVE tiers AS (
                SELECT 3 AS tier UNION ALL SELECT tier + 1 FROM tiers WHERE tier < 7
            ), big_orders AS (
                SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
            ), per_cust AS (
                SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big,
                       round(sum(o_totalprice), 2) AS total
                FROM big_orders GROUP BY o_custkey
            )
            SELECT c_custkey, c_mktsegment, n_big, total
            FROM customer JOIN per_cust ON per_cust.o_custkey = c_custkey
                          JOIN tiers ON per_cust.n_big = tiers.tier""",
        "q42_case_composition": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CASE WHEN sum(o_totalprice) > (SELECT avg(o_totalprice) * 120 FROM orders)
                        THEN 'heavy' ELSE 'light' END AS band
            FROM orders
            GROUP BY o_orderpriority
            HAVING CASE WHEN count(*) > (SELECT count(*) / 10 FROM orders)
                        THEN 1 ELSE 0 END = 1
            ORDER BY CASE WHEN sum(o_totalprice) > (SELECT avg(o_totalprice) * 120 FROM orders)
                          THEN 0 ELSE 1 END, o_orderpriority""",
        # dp19: prefix filtering is recall-lossless, so its output equals
        # the exhaustive exact-Jaccard pair set at the threshold
        "dp19_prefix_jaccard": """
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) - 2 < 1 THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
                    FROM documents)),
            inv AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
                     any_value(a.ng) AS na, any_value(b.ng) AS nb
              FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(floor(10000 * (inter / CAST(na + nb - inter AS DOUBLE))) AS BIGINT) AS j_x1e4
            FROM pairs
            WHERE inter / CAST(na + nb - inter AS DOUBLE) >= 0.6""",
        # dp18: frame slices replicated with VARCHAR substring — valid
        # because the entry filters to ASCII docs (byte offset == char
        # offset); step/truncation formula mirrors multimodal.frame_sample
        "dp18_frame_sample": """
            WITH base AS (
              SELECT doc_id, text, octet_length(encode(text)) AS nb,
                     greatest(1, octet_length(encode(text)) // 4) AS step
              FROM documents
              WHERE doc_id < 50 AND octet_length(encode(text)) = length(text)),
            frames AS (
              SELECT doc_id, i AS frame_idx,
                     substring(text, i * step + 1, step) AS chunk
              FROM base, (SELECT unnest(generate_series(0, 3)) AS i))
            SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                   sha256(chunk) AS frame_sha256,
                   CAST(length(chunk) AS BIGINT) AS frame_bytes
            FROM frames WHERE chunk <> ''""",
        # dp15: DuckDB has native ASOF JOIN — the direct oracle for the
        # union+last-value window formulation (datapipe/asof.py)
        "dp15_asof_join": """
            SELECT l.event_id, l.user_id, r.click_id,
                   epoch_us(r.ts) AS click_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF LEFT JOIN (
              SELECT user_id, ts, max(event_id) AS click_id
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts) r
              ON l.user_id = r.user_id AND l.ts >= r.ts""",
        # dp16: identical salted-md5 hex-prefix threshold comparison —
        # bit-for-bit the same keep set as sample_mask (sampling.py)
        "dp16_stratified_sample": """
            WITH sampled AS (
              SELECT doc_id, lang FROM documents
              WHERE substr(md5(doc_id::VARCHAR || ':cur1'), 1, 8) <
                CASE lang WHEN 'en' THEN '80000000'
                          WHEN 'de' THEN '40000000'
                          ELSE 'g' END)
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY substr(md5(doc_id::VARCHAR || ':cap1'), 1, 8), doc_id) AS rn
              FROM sampled)
            WHERE rn <= 40
            UNION ALL
            SELECT doc_id, 'w:0' AS lang FROM documents
            UNION ALL
            SELECT doc_id, 'w:1' AS lang FROM documents
            WHERE substr(md5(doc_id::VARCHAR || ':mx1:w:epoch1'), 1, 8) < '4ccccccc'""",
        # dp17: integer-exact tf·idf (score = tf * floor(1000*N/df)) — the
        # double division of two small ints is correctly rounded in both
        # engines, so floor() agrees; ranks tie-break by term
        "dp17_tfidf_terms": """
            WITH terms AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\\W+'),
                                        x -> x <> '')) AS term
              FROM documents WHERE doc_id < 500),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents WHERE doc_id < 500),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                     tf.tf * CAST(floor(1000 * n.n / dfreq.df) AS BIGINT) AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term ASC) AS rank
              FROM scored)
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
            FROM ranked WHERE rank <= 3""",
    }
