package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second OLAP pack: correlated subqueries, outer/cross/non-equi joins,
  * date and string function surface, exact two-pass stddev, windowed
  * median, grouping sets. These run through `spark.sql` over registered
  * views — the engine's SQL surface — with DuckDB twins that are textually
  * near-identical (dialect differences only), keeping the determinism
  * conventions of [[AnalyticsQueries]].
  */
object OlapQueries extends QueryPack {

  import TextQueries.{h64, duckH64}

  private val views = Seq("customer", "orders", "lineitem", "supplier", "part", "nation", "region", "events")

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    views.foreach(v => Tables(s, dir, v).createOrReplaceTempView(v))
    s.sql(q)
  }

  private val decSpend =
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"

  /** Derived `partsupp`: the driver testdata carries no partsupp table, so
    * the five TPC-H queries that need one (q2/q9/q11/q16/q20) derive it as
    * a PURE FUNCTION of the (part x supplier) keys — full-fidelity join
    * shapes without new testdata. Four supplier slots per part,
    * `ps_suppkey = (p_partkey*4 + i) % |supplier|` (four consecutive
    * integers stay distinct mod |S| >= 4, so (ps_partkey, ps_suppkey) is a
    * real primary key); availqty and supplycost come from the shared
    * md5-derived h64 on the (part, slot) pair. Cost lives as integer CENTS
    * (`ps_supplycost_cents` BIGINT) so min-equality and cross-multiplied
    * threshold compares are exact integer ops in both engines; the decimal
    * face (`ps_supplycost`) reconstructs cents/100 through one IEEE
    * division + round-to-2dp, bit-identical cross-engine, and is used only
    * in per-row arithmetic that both engines sum as exact decimals.
    * The DuckDB oracle computes the identical rows from its own tables
    * (`duckPartsupp`), so parity holds at any scale factor. Scale note:
    * partsupp is 4x part — generated map-side from the part scan, never
    * shuffled on its own; the 100 TB plan treats it like any fact-derived
    * dimension (broadcast when small, shuffle-joined on ps keys when not).
    */
  // |supplier| enters as a one-row CROSS JOIN, not a scalar subquery: a
  // scalar subquery nested inside q20's correlated IN-subquery trips
  // Spark 4.1.2's "Subquery has not finished" reuse assertion; the
  // broadcast-join form plans identically and is robust.
  private val sparkPartsupp =
    s"""partsupp AS (
       |  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
       |    CAST((p_partkey * 4 + i) % sc.n AS BIGINT) AS ps_suppkey,
       |    CAST(${h64("concat('av_', CAST(p_partkey AS STRING), '_', CAST(i AS STRING))")} % 9999 + 1 AS BIGINT) AS ps_availqty,
       |    CAST(${h64("concat('ps_', CAST(p_partkey AS STRING), '_', CAST(i AS STRING))")} % 90001 + 10000 AS BIGINT) AS ps_supplycost_cents,
       |    CAST(CAST(${h64("concat('ps_', CAST(p_partkey AS STRING), '_', CAST(i AS STRING))")} % 90001 + 10000 AS DOUBLE) / 100.0 AS DECIMAL(12,2)) AS ps_supplycost
       |  FROM part CROSS JOIN (SELECT count(*) AS n FROM supplier) sc
       |  LATERAL VIEW explode(sequence(0, 3)) t AS i)""".stripMargin

  private val duckPartsupp =
    s"""partsupp AS (
       |  SELECT p_partkey::BIGINT AS ps_partkey,
       |    ((p_partkey * 4 + i) % (SELECT count(*) FROM supplier))::BIGINT AS ps_suppkey,
       |    (${duckH64("'av_' || p_partkey::VARCHAR || '_' || i::VARCHAR")} % 9999 + 1)::BIGINT AS ps_availqty,
       |    (${duckH64("'ps_' || p_partkey::VARCHAR || '_' || i::VARCHAR")} % 90001 + 10000)::BIGINT AS ps_supplycost_cents,
       |    CAST(CAST((${duckH64("'ps_' || p_partkey::VARCHAR || '_' || i::VARCHAR")} % 90001 + 10000) AS DOUBLE) / 100.0 AS DECIMAL(12,2)) AS ps_supplycost
       |  FROM part, (SELECT unnest(generate_series(0, 3)) AS i) sl)""".stripMargin

  /** The histogram-refine exact-quantile rewrite as a SQL builder, so
    * the oracle query and `QuantilePropSpec`'s adversarial-distribution
    * property run the IDENTICAL plan. `centsSelect` must yield one
    * BIGINT column `cents`; `percentiles` are integer percents. The
    * k-th order statistic definition is k = ((n-1)·p) DIV 100 + 1
    * (1-based, lower order statistic — matches DuckDB quantile_disc's
    * index choice for these p).
    */
  def histogramRefineSql(centsSelect: String, percentiles: Seq[Int]): String =
    s"""WITH c AS (
       |  $centsSelect),
       |b AS (
       |  SELECT min(cents) AS lo, max(cents) AS hi, count(*) AS n FROM c),
       |w AS (SELECT lo, hi, n, (hi - lo) DIV 1024 + 1 AS wd FROM b),
       |t AS (
       |  SELECT CAST(p AS BIGINT) AS p, ((n - 1) * p) DIV 100 + 1 AS k
       |  FROM w CROSS JOIN (SELECT explode(array(${percentiles.mkString(", ")})) AS p)),
       |h AS (
       |  SELECT (cents - lo) DIV wd AS bk, count(*) AS cnt
       |  FROM c CROSS JOIN w GROUP BY (cents - lo) DIV wd),
       |cum AS (
       |  SELECT bk, cnt, sum(cnt) OVER (ORDER BY bk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend
       |  FROM h),
       |sel AS (
       |  SELECT t.p, t.k, cum.bk, cum.cend - cum.cnt AS cbelow
       |  FROM t JOIN cum ON cum.cend >= t.k AND cum.cend - cum.cnt < t.k),
       |cand AS (
       |  SELECT sel.p, sel.k, sel.cbelow, c.cents,
       |    row_number() OVER (PARTITION BY sel.p ORDER BY c.cents) AS rn
       |  FROM c CROSS JOIN w
       |  JOIN sel ON (c.cents - w.lo) DIV w.wd = sel.bk)
       |SELECT p, CAST(k AS BIGINT) AS k, cents AS q_cents
       |FROM cand WHERE rn = k - cbelow""".stripMargin

  /** Per-GROUP histogram-refine: the same rewrite partitioned by a group
    * column `g`. `centsSelect` must yield (g, cents); output columns are
    * (g, p, k, q_cents). Shared by the `x_group_quantiles` oracle query
    * and `QuantilePropSpec`'s grouped property.
    */
  def groupedHistogramRefineSql(centsSelect: String, percentiles: Seq[Int]): String =
    s"""WITH c AS (
       |  $centsSelect),
       |b AS (SELECT g, min(cents) AS lo, max(cents) AS hi, count(*) AS n FROM c GROUP BY g),
       |w AS (SELECT g, lo, hi, n, (hi - lo) DIV 1024 + 1 AS wd FROM b),
       |t AS (SELECT w.g, CAST(p AS BIGINT) AS p, ((n - 1) * p) DIV 100 + 1 AS k
       |      FROM w CROSS JOIN (SELECT explode(array(${percentiles.mkString(", ")})) AS p)),
       |h AS (SELECT c.g, (cents - w.lo) DIV w.wd AS bk, count(*) AS cnt
       |      FROM c JOIN w ON w.g = c.g GROUP BY c.g, (cents - w.lo) DIV w.wd),
       |cum AS (SELECT g, bk, cnt, sum(cnt) OVER (PARTITION BY g ORDER BY bk
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend FROM h),
       |sel AS (SELECT t.g, t.p, t.k, cum.bk, cum.cend - cum.cnt AS cbelow
       |        FROM t JOIN cum ON cum.g = t.g AND cum.cend >= t.k AND cum.cend - cum.cnt < t.k),
       |cand AS (SELECT sel.g, sel.p, sel.k, sel.cbelow, c.cents,
       |    row_number() OVER (PARTITION BY sel.g, sel.p ORDER BY c.cents) AS rn
       |  FROM c JOIN w ON w.g = c.g
       |  JOIN sel ON sel.g = c.g AND (c.cents - w.lo) DIV w.wd = sel.bk)
       |SELECT g, p, CAST(k AS BIGINT) AS k, cents AS q_cents
       |FROM cand WHERE rn = k - cbelow""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EXACT global quantiles with NO global sort — the two-pass
    // histogram-refine algorithm a 100 TB table needs where
    // approx_percentile's error bound won't do (billing, SLA
    // percentiles): pass 1 bins exact integer cents into <= 1024
    // equi-width buckets (map-side combinable counts; the cumulative
    // window runs over the 1024-row histogram, never rows); pass 2
    // ranks ONLY inside the <= 4 candidate buckets (each ~n/1024 rows)
    // to extract the k-th order statistics. The oracle is the naive
    // global-sort order statistic — equality proves the scale-safe
    // rewrite exact. Cents mint as floor(v*100 + 0.5): pure IEEE ops,
    // bit-identical cross-engine.
    "x_exact_quantiles" -> ((s, dir) => sql(s, dir,
      histogramRefineSql(
        "SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents FROM lineitem",
        Seq(25, 50, 75, 99)))),

    // Per-GROUP exact quantiles via the same histogram-refine rewrite —
    // the per-tenant / per-type SLA-percentile shape. All intermediate
    // tables are group-bounded (histograms ≤ groups × 1024 rows, the
    // cumulative window partitions by group over those rows, the rank
    // window runs only inside each group's candidate buckets); the
    // per-row work is one broadcast join against the group-bounds table.
    // The oracle is the naive per-group order statistic — equality
    // proves the rewrite exact group-wise too.
    "x_group_quantiles" -> ((s, dir) => sql(s, dir,
      s"""SELECT g AS event_type, p, k, q_cents FROM (
         |${groupedHistogramRefineSql(
              "SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events",
              Seq(50, 90, 99))}
         |) r""".stripMargin)),

    // SQL PIVOT surface: Spark's native PIVOT clause plans as one hash
    // aggregate with conditional counters (no self-joins per pivot
    // value); the oracle is the equivalent CASE aggregation.
    "q_pivot_status" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderpriority,
        |  CAST(coalesce(st_f, 0) AS BIGINT) AS st_f,
        |  CAST(coalesce(st_o, 0) AS BIGINT) AS st_o,
        |  CAST(coalesce(st_p, 0) AS BIGINT) AS st_p
        |FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        |PIVOT (count(*) FOR o_orderstatus IN ('F' AS st_f, 'O' AS st_o, 'P' AS st_p))""".stripMargin)),

    // HOPPING (sliding) window aggregates via Spark's native window()
    // function — 6 h windows every 3 h, so each event lands in exactly
    // two: the overlapping-dashboards shape (rolling actives, rolling
    // revenue) that tumbling windows can't express. Spark plans this as
    // one Expand (2 rows per event) + one combine-friendly hash
    // aggregate — no self-join, no range join; the oracle rebuilds the
    // same epoch-aligned window starts by integer floor arithmetic.
    "x_hopping_window" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = Tables(s, dir, "events")
      ev.groupBy(col("event_type"),
          window(col("ts"), "6 hours", "3 hours"))
        .agg(count(lit(1)).as("n_events"),
          expr("SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))").as("cents"),
          expr("CAST(count(DISTINCT user_id) AS BIGINT)").as("n_users"))
        .select(col("event_type"),
          col("window.start").as("win_start"), col("window.end").as("win_end"),
          col("n_events"), col("cents"), col("n_users"))
    }),

    // Order-independent per-slice content checksum — the anti-entropy
    // primitive for 100 TB replication: two replicas (or a table and
    // its restored backup) compare one tiny row per (type, day) instead
    // of moving data; a single flipped row flips the slice's checksum.
    // Commutative integer sum of bounded row hashes: map-side
    // combinable, shuffle carries only (slice, partial) pairs.
    "x_partition_checksum" -> ((s, dir) => sql(s, dir,
      s"""SELECT event_type,
         |  CAST(unix_micros(ts) DIV 86400000000 AS BIGINT) AS day,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  SUM(${h64("concat_ws('|', CAST(event_id AS STRING), CAST(user_id AS STRING), " +
           "CAST(unix_micros(ts) AS STRING), CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS STRING))")} % 1000000007) AS checksum
         |FROM events
         |GROUP BY event_type, unix_micros(ts) DIV 86400000000""".stripMargin)),

    // Correlated scalar subquery per outer row (Catalyst rewrites to a
    // left outer aggregate join — no per-row execution at scale).
    "q_correlated_scalar" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT min(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS min_line_price
        |FROM orders WHERE o_totalprice > 400000""".stripMargin)),

    // Left outer join against an aggregate; unmatched rows keep nulls.
    "q_left_outer_agg" -> ((s, dir) => sql(s, dir,
      s"""SELECT c_custkey, c_name, o.n_orders, o.spend
         |FROM customer
         |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders, $decSpend AS spend
         |           FROM orders GROUP BY o_custkey) o
         |  ON o.o_custkey = c_custkey
         |WHERE c_custkey <= 300""".stripMargin)),

    // Full outer join of two aggregates with asymmetric coverage.
    "q_full_outer_counts" -> ((s, dir) => sql(s, dir,
      """SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer WHERE c_acctbal > 4500 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier WHERE s_acctbal > 4500 GROUP BY s_nationkey) s
        |  ON c.nk = s.nk""".stripMargin)),

    // Cross join of two small dimensions (broadcast nested loop).
    "q_cross_join_dims" -> ((s, dir) => sql(s, dir,
      """SELECT r_name, p.o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin)),

    // Scalar subquery (uncorrelated) used in projection and filter.
    "q_scalar_subquery" -> ((s, dir) => sql(s, dir,
      s"""SELECT o_orderkey, o_totalprice,
         |  o_totalprice - (SELECT $decSpend / count(*) FROM orders) AS delta_vs_avg
         |FROM orders WHERE o_totalprice > 480000""".stripMargin)),

    // Non-equi conjunct on top of the equi join (range condition):
    // lineitems shipped within 30 days of the order date.
    "q_range_join" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, count(*) AS n_fast
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin)),

    // Calendar functions: month bucketing + year/quarter extraction.
    "q_date_functions" -> ((s, dir) => sql(s, dir,
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |  CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         |  count(*) AS n, $decSpend AS spend
         |FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE),
         |  CAST(year(o_orderdate) AS BIGINT), CAST(quarter(o_orderdate) AS BIGINT)""".stripMargin)),

    // String function surface.
    "q_string_functions" -> ((s, dir) => sql(s, dir,
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substring(c_name, 10, 5) AS sub,
        |  replace(c_name, 'Customer#', 'C') AS repl,
        |  lpad(CAST(c_custkey AS STRING), 8, '0') AS pad,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  c_name LIKE '%12%' AS has12,
        |  CAST(instr(c_name, '9') AS BIGINT) AS pos9,
        |  concat_ws('-', c_mktsegment, c_name) AS tagged
        |FROM customer WHERE c_custkey <= 200""".stripMargin)),

    // Exact sample stddev from decimal power sums (order-independent,
    // unlike a naive double stddev whose partial-sum order varies).
    "q_exact_stddev" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2,
        |  sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |        - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
        |       / (count(*) - 1)) AS stddev_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Deterministic lower-median per group via window position.
    "q_median_window" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, o_totalprice AS median_price FROM (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders) WHERE rn = (cnt + 1) DIV 2""".stripMargin)),

    // RANGE frame over event time: 90-day rolling spend per customer —
    // the interval-bounded window frame (peers included by value, not
    // row position).
    "q_range_frame_window" -> ((s, dir) => sql(s, dir,
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
        |FROM orders""".stripMargin)),

    // GROUPING SETS with grouping()-derived labels (not a value sentinel
    // — same reasoning as q_cube_agg).
    "q_grouping_sets" -> ((s, dir) => sql(s, dir,
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""".stripMargin)),

    // Part-dimension rollup (TPC-H Q9-ish): fact x part with grouped
    // margin — the remaining base table exercised.
    "q_part_margin" -> ((s, dir) => sql(s, dir,
      """SELECT p_type, p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |  count(*) AS n,
        |  CAST(MAX(p_retailprice) AS DOUBLE) AS max_retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type, p_brand""".stripMargin)),

    // TPC-H Q9: profit per nation-year — revenue minus supplycost*qty
    // from the derived partsupp (full-fidelity: the fact joins partsupp
    // on BOTH keys, the official shape), part name filtered like the
    // official color-word predicate, supplier nation for the group key.
    "q9_profit" -> ((s, dir) => sql(s, dir,
      s"""WITH $sparkPartsupp
         |SELECT nation, yr,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         |         - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
         |    l_extendedprice, l_discount, ps_supplycost, l_quantity
         |  FROM lineitem, orders, part, supplier, partsupp, nation
         |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
         |    AND l_suppkey = s_suppkey
         |    AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |    AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%bolt%') t
         |GROUP BY nation, yr""".stripMargin)),

    // TPC-H Q7 shape: the same dimension joined twice under different
    // roles (customer nation vs supplier nation), revenue by nation pair
    // and year.
    "q7_nation_volume" -> ((s, dir) => sql(s, dir,
      """SELECT supp_nation, cust_nation, yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    l_extendedprice, l_discount
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey IN (3, 4) AND n2.n_nationkey IN (3, 4)
        |    AND n1.n_nationkey <> n2.n_nationkey)
        |GROUP BY supp_nation, cust_nation, yr""".stripMargin)),

    // TPC-H Q8 shape: market share — conditional share of a numerator
    // population inside a grouped denominator, exact decimal division at
    // the end.
    "q8_market_share" -> ((s, dir) => sql(s, dir,
      """SELECT yr,
        |  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name AS nation,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
        |  FROM lineitem, orders, customer, nation, region
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'ASIA')
        |GROUP BY yr""".stripMargin)),

    // As-of join (ops.AsOfJoin): each event picks up the user's latest
    // order state at event time — single-shuffle union+window form, no
    // range-join blow-up. Oracle: DuckDB's native ASOF LEFT JOIN.
    "x_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        expr("timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, (event_id * 97) % 200000000)").as("ts2"))
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val od = Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      graft.ops.AsOfJoin.asofJoin(e, od, "user_id", "ts2", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    }),

    // Forward as-of (ops.AsOfJoin.asofJoinForward): each event picks up
    // the user's NEXT order at-or-after event time — same single-shuffle
    // machinery scanning descending. Oracle: DuckDB native ASOF with the
    // inequality flipped.
    "x_asof_forward" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        expr("timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, (event_id * 97) % 200000000)").as("ts2"))
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val od = Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      graft.ops.AsOfJoin.asofJoinForward(e, od, "user_id", "ts2", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    }),

    // Nearest-event join: for each purchase, the click by the same user
    // CLOSEST in time in EITHER direction — one backward and one forward
    // as-of pass (two single-shuffle union+window scans, never a band
    // join), then a per-row arbitration (ties prefer the earlier click).
    // Oracle: DuckDB backward + forward ASOF with the same CASE.
    "x_asof_nearest" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_id").as("c_id"), col("value").as("c_value"))
      val back = graft.ops.AsOfJoin.asofJoin(p, c, "user_id", "ts", "c_ts",
        Seq("c_ts", "c_id", "c_value"), "c_id")
        .withColumnRenamed("c_ts", "b_ts").withColumnRenamed("c_id", "b_id")
        .withColumnRenamed("c_value", "b_value")
      val both = graft.ops.AsOfJoin.asofJoinForward(back, c, "user_id", "ts", "c_ts",
        Seq("c_ts", "c_id", "c_value"), "c_id")
      val bl = expr("unix_micros(ts) - unix_micros(b_ts)")
      val fl = expr("unix_micros(c_ts) - unix_micros(ts)")
      val takeBack = col("b_ts").isNotNull && (col("c_ts").isNull || bl <= fl)
      both.select(col("event_id"), col("user_id"), col("ts"),
        when(takeBack, col("b_id")).otherwise(col("c_id")).as("near_id"),
        when(takeBack, col("b_value")).otherwise(col("c_value")).as("near_value"),
        when(takeBack && col("b_ts").isNotNull, lit("b"))
          .when(col("c_ts").isNotNull, lit("f")).as("dir"),
        when(takeBack, bl).otherwise(fl).as("lag_us"))
    }),

    // Range (interval x point) join (ops.RangeJoin): every event within
    // 12 hours AFTER each error event of the same user — bucketized
    // equi-join on (user, 12h-bucket) + residual band, never the
    // quadratic per-key pair blow-up Catalyst would plan for the raw
    // band predicate. Oracle: DuckDB's native inequality (IE) join.
    "x_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val intervals = ev.filter(col("event_type") === "error").select(
        col("event_id").as("error_id"), col("user_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 12 HOURS")).as("win_end"))
      val points = ev.select(
        col("user_id"), col("ts").as("f_ts"),
        col("event_id").as("f_event_id"), col("value").as("f_value"))
      val pairs = graft.ops.RangeJoin.intervalJoin(
        intervals, points, Seq("user_id"),
        "win_start", "win_end", "f_ts",
        bucketMicros = 12L * 3600 * 1000000,
        includeStart = false, includeEnd = true)
      val agg = pairs.groupBy("error_id", "user_id").agg(
        count(col("f_event_id")).as("n_follow"),
        expr("CAST(SUM(CAST(f_value AS DECIMAL(12,2))) AS DOUBLE)").as("follow_value"),
        min(col("f_ts")).as("first_follow_ts"))
      intervals.select("error_id", "user_id")
        .join(agg, Seq("error_id", "user_id"), "left")
        .select(col("error_id"), col("user_id"),
          coalesce(col("n_follow"), lit(0L)).as("n_follow"),
          col("follow_value"), col("first_follow_ts"))
    }),

    // Concentration (Pareto/Lorenz) share: per event type, the permille
    // of total value held by the top-10 users — the corpus-curation
    // audit shape ("what share of tokens come from the top domains")
    // that decides mixture caps. Exact integer cents end to end; the
    // only window runs over user AGGREGATES (bounded by user count),
    // never rows. Cents are minted per ROW as floor(value*100 + 0.5)
    // — pure IEEE double ops, bit-identical across engines — rather
    // than a double->DECIMAL cast, whose tie-rounding mode is engine
    // discretion (Spark HALF_UP vs DuckDB HALF_EVEN).
    "x_concentration_share" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(
        """WITH u AS (
          |  SELECT event_type, user_id,
          |    SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
          |  FROM events GROUP BY event_type, user_id),
          |ranked AS (
          |  SELECT event_type, cents,
          |    row_number() OVER (PARTITION BY event_type
          |      ORDER BY cents DESC, user_id) AS rk
          |  FROM u)
          |SELECT event_type,
          |  CAST(count(*) AS BIGINT) AS n_users,
          |  SUM(CASE WHEN rk <= 10 THEN cents ELSE 0 END) * 1000 div SUM(cents) AS top10_share_pm
          |FROM ranked GROUP BY event_type""".stripMargin)
    }),

    // Sweep-line interval concurrency: each user's peak number of
    // simultaneously-open 12h error windows. Intervals decompose to
    // +1/-1 boundary events, one per-user ordered running sum finds the
    // peak — the O(n log n) shape that replaces the quadratic
    // "count overlaps per interval" self-join; at same instant the -1
    // sorts first (half-open windows: an end never overlaps a start).
    // One shuffle on user_id; the timeline never materializes pairs.
    "x_interval_concurrency" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(
        """WITH w AS (
          |  SELECT user_id, ts AS s, ts + INTERVAL 12 HOURS AS e
          |  FROM events WHERE event_type = 'error'),
          |b AS (
          |  SELECT user_id, s AS t, 1 AS delta FROM w
          |  UNION ALL
          |  SELECT user_id, e AS t, -1 AS delta FROM w),
          |r AS (
          |  SELECT user_id,
          |    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
          |  FROM b)
          |SELECT user_id, CAST(max(open) AS BIGINT) AS peak_concurrent
          |FROM r GROUP BY user_id""".stripMargin)
    }),

    // Point-in-time join: each event looks up the order state VALID at
    // its timestamp — intervals are [o_orderdate, min(next order,
    // +30 days)), so a probe landing in a coverage gap gets NULL state
    // (what distinguishes PIT from plain as-of). Runs at as-of cost: the
    // single-shuffle union+window carry plus one validity post-check —
    // the interval side never explodes and no band predicate reaches the
    // join planner. Oracle: DuckDB inequality LEFT JOIN against the same
    // interval table (disjoint intervals -> at most one match per probe).
    "x_pit_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        expr("timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, (event_id * 97) % 200000000)").as("ts2"))
      val dedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val nxt = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
      val iv = Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(dedup)).filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"),
          col("o_orderdate").as("valid_from"),
          col("o_orderkey"), col("o_totalprice"))
        .withColumn("valid_to", least(lead(col("valid_from"), 1).over(nxt),
          col("valid_from") + expr("INTERVAL 30 DAYS")))
      val joined = graft.ops.AsOfJoin.asofJoin(e, iv, "user_id", "ts2", "valid_from",
        Seq("o_orderkey", "o_totalprice", "valid_to"), "o_orderkey")
      val live = col("valid_to") > col("ts2")
      joined.select(col("event_id"), col("user_id"), col("ts2"),
        when(live, col("o_orderkey")).as("o_orderkey"),
        when(live, col("o_totalprice")).as("o_totalprice"))
    }),

    // Interval × interval OVERLAP join (ops.RangeJoin.intervalOverlapJoin):
    // pairs of same-customer orders whose 30-day windows overlap. Both
    // sides bucketize; a pair is claimed by exactly the bucket holding
    // max(startA, startB), so the equi-join is exactly-once with no
    // dedup shuffle. Oracle: DuckDB self IE-join on the band.
    "x_interval_overlap" -> ((s, dir) => {
      val base = Tables(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("w_end"))
      val a = base.select(col("o_custkey"), col("o_orderkey").as("a_key"),
        col("w_start").as("a_start"), col("w_end").as("a_end"))
      val b = base.select(col("o_custkey"), col("o_orderkey").as("b_key"),
        col("w_start").as("b_start"), col("w_end").as("b_end"))
      graft.ops.RangeJoin.intervalOverlapJoin(a, b, Seq("o_custkey"),
          "a_start", "a_end", "b_start", "b_end",
          bucketMicros = 30L * 86400 * 1000000)
        .filter(col("a_key") < col("b_key"))
        .select(col("o_custkey"), col("a_key"), col("b_key"),
          expr("(unix_micros(least(a_end, b_end)) - unix_micros(greatest(a_start, b_start))) div 86400000000")
            .as("overlap_days"))
    }),

    // NOT EXISTS (anti join through a subquery, P5/J3's SQL face).
    "q_not_exists" -> ((s, dir) => sql(s, dir,
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)""".stripMargin)),

    // TPC-H Q17 shape: small-quantity revenue — a correlated average
    // subquery gating the fact scan. Catalyst rewrites the correlated
    // aggregate into a grouped join (one extra shuffle on l_partkey),
    // never per-row execution; the brand/size filters push into the part
    // scan and the part side broadcasts.
    "q17_small_qty_revenue" -> ((s, dir) => sql(s, dir,
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1' AND p_size <= 15
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // TPC-H Q18 shape: large-volume customers — IN over a grouped HAVING
    // (a semi join against an aggregate at scale), then re-aggregation and
    // a deterministic top-100.
    "q18_large_volume_customer" -> ((s, dir) => sql(s, dir,
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q2: minimum-cost supplier — the full region-scoped correlated
    // minimum over the derived partsupp (Catalyst rewrites the correlated
    // subquery into a grouped join; the min-equality compares integer
    // CENTS, exact in both engines, so the match set is deterministic).
    "q2_min_acct_supplier" -> ((s, dir) => sql(s, dir,
      s"""WITH $sparkPartsupp
         |SELECT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name, n_name, p_partkey, p_type,
         |  CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
         |FROM part, supplier, partsupp, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size IN (5, 15)
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
         |  AND ps_supplycost_cents = (
         |    SELECT min(ps2.ps_supplycost_cents)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'ASIA')""".stripMargin)),

    // TPC-H Q4 shape: order-priority checking — EXISTS turns into a left
    // semi join on the order key (shipdate-lag stands in for the missing
    // commit/receipt dates); the date filter prunes the orders scan first.
    "q4_order_priority" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)),

    // TPC-H Q6 shape: forecast revenue — pure scan+filter+scalar agg; all
    // three predicates push into the parquet scan, no shuffle but the
    // single-row final combine.
    "q6_forecast_revenue" -> ((s, dir) => sql(s, dir,
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q10 shape: returned-item reporting — fact filtered to one
    // quarter and returnflag R, three dimension joins, deterministic
    // top-20 (revenue is an exact decimal sum, c_custkey breaks ties).
    "q10_returned_items" -> ((s, dir) => sql(s, dir,
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q12 shape: priority mix among late-shipped lines (shipdate lag
    // stands in for shipmode/receipt lag) — conditional counts as a single
    // pass over the joined fact.
    "q12_late_priority" -> ((s, dir) => sql(s, dir,
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution — left join with
    // an extra ON conjunct (null-extending, not filtering), then a
    // two-level aggregation (per-customer count, then histogram).
    "q13_order_distribution" -> ((s, dir) => sql(s, dir,
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share — conditional numerator over a
    // grouped-free denominator, one month of fact, part broadcast.
    "q14_promo_share" -> ((s, dir) => sql(s, dir,
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
        |  / CAST(SUM(vol) AS DOUBLE) AS promo_share
        |FROM (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01') t""".stripMargin)),

    // TPC-H Q15 shape: top supplier — a CTE aggregated once, reused for
    // both the join and the max scalar subquery; exact decimal equality
    // picks the winner(s) deterministically.
    "q15_top_supplier" -> ((s, dir) => sql(s, dir,
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin)),

    // TPC-H Q19 shape: disjunctive multi-attribute predicate — three OR'd
    // brand/size/quantity branches; the equi-join key stays clean so the
    // disjunction is a residual filter, not a join-condition explosion.
    "q19_disjunctive_filters" -> ((s, dir) => sql(s, dir,
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)""".stripMargin)),

    // TPC-H Q21 shape: suppliers who kept orders waiting — the only
    // supplier who shipped last on a multi-supplier finished order
    // (shipdate stands in for receipt/commit): one EXISTS + one NOT
    // EXISTS against the same fact, both becoming semi/anti joins.
    "q21_waiting_supplier" -> ((s, dir) => sql(s, dir,
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY s_name""".stripMargin)),

    // Full analytic-window surface in one pass over a named WINDOW:
    // dense_rank / percent_rank / cume_dist / lead / lag / first_value /
    // nth_value share a single sort within one Window operator — the
    // plan has exactly one shuffle on the partition key.
    "q_window_breadth" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey, o_custkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 2) OVER w AS prev2_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // TPC-H Q22 shape: dormant high-balance customers — deterministic
    // average threshold (decimal sum / count), NOT EXISTS anti join on
    // orders, grouped by a derived code column.
    "q22_dormant_customers" -> ((s, dir) => sql(s, dir,
      """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
        |  count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY CAST(c_nationkey % 5 AS BIGINT)""".stripMargin)),

    // TPC-H Q11: important-stock identification — per-part inventory
    // value (supplycost * availqty from the derived partsupp) held by one
    // nation's suppliers, kept when it exceeds 2x the average per-part
    // share (the official query scales its fraction by 1/SF for the same
    // selectivity-stability reason). The threshold compare is
    // CROSS-MULTIPLIED INTEGER arithmetic on cents — no division, no
    // doubles — so it is bit-identical across engines at any SF (exact
    // until SUM(cents*qty)*nparts nears 2^63, ~sf100 of this data; past
    // that, swap both sides to DECIMAL(38,0)).
    "q11_important_stock" -> ((s, dir) => sql(s, dir,
      s"""WITH $sparkPartsupp,
         |natps AS (
         |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS val_cents
         |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  WHERE s_nationkey = 3)
         |SELECT ps_partkey, CAST(SUM(val_cents) AS DOUBLE) / 100.0 AS part_value
         |FROM natps GROUP BY ps_partkey
         |HAVING SUM(val_cents) * (SELECT count(DISTINCT ps_partkey) FROM natps) >
         |       2 * (SELECT SUM(val_cents) FROM natps)""".stripMargin)),

    // TPC-H Q16: parts/supplier relationship count — distinct suppliers
    // per part attribute group FROM THE DERIVED PARTSUPP (the official
    // fact source), with a NOT-IN supplier exclusion (negative balance
    // stands in for the complaints LIKE; no s_comment column). NOT IN
    // over a non-null key column becomes a broadcast anti join; the
    // distinct count is two-phase at scale.
    "q16_parts_supplier" -> ((s, dir) => sql(s, dir,
      s"""WITH $sparkPartsupp
         |SELECT p_type, CAST(p_size AS BIGINT) AS p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY p_type, CAST(p_size AS BIGINT)""".stripMargin)),

    // TPC-H Q20: excess-availability suppliers — the official availability
    // correlate over the derived partsupp: suppliers holding a 'small%'
    // part slot whose availqty exceeds half the quantity THAT PAIR shipped
    // in the window (pair-correlated scalar subquery; a NULL sum — pair
    // never shipped — drops the row in both engines), scoped to one
    // region. The compare is 2*availqty (BIGINT) > exact decimal sum —
    // no doubles. Region rather than the official single nation keeps the
    // result non-degenerate at the small test SFs (a nation is 1/25 of
    // 100 suppliers at sf0.01); the join chain is a superset of the
    // official one (supplier -> nation -> region).
    "q20_excess_suppliers" -> ((s, dir) => sql(s, dir,
      s"""WITH $sparkPartsupp
         |SELECT s_suppkey, s_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND 2 * ps_availqty > (
         |        SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
         |        FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'))""".stripMargin)),

    // CUBE: all four grouping combinations in one pass (Spark expands to
    // a single shuffle with grouping-id; 100 TB cost is one scan, not
    // four). Sentinel labels keep the null grouping keys comparable.
    // rollup rows are labeled via grouping(), not a coalesce sentinel —
    // a genuine 'ALL' or NULL data value must stay distinguishable from
    // the CUBE's aggregate rows
    "q_cube_agg" -> ((s, dir) => sql(s, dir,
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)),

    // Fixed-width histogram of order value: bucket index is an exact
    // integer floor of a single IEEE division — identical in both
    // engines. The shape of a 100 TB histogram job: one scan, one
    // combine-friendly groupBy on a small integer key.
    "q_histogram" -> ((s, dir) => sql(s, dir,
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY CAST(floor(o_totalprice / 50000) AS BIGINT)""".stripMargin)),

    // Ordered set-valued aggregation: the distinct market segments per
    // nation as one sorted CSV string. Spark materializes the per-group
    // set and sorts it inside the row (collect_set + array_sort — bounded
    // by segment cardinality, never by row count); DuckDB's ordered
    // string_agg over a distinct subquery produces the identical string.
    "x_group_concat" -> ((s, dir) => sql(s, dir,
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |  array_join(array_sort(collect_set(c_mktsegment)), ',') AS segments
        |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // Data-quality column profiling: per-column row/null/distinct counts
    // and min/max, one scan per profiled table (Spark collapses the
    // UNION ALL of per-column aggregates over the same scan via exchange
    // reuse; all aggregates combine map-side). Doubles surface as exact
    // integer cents so the min/max text is engine-independent.
    "x_data_profile" -> ((s, dir) => sql(s, dir,
      """SELECT 'o_orderstatus' AS col, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderstatus) AS STRING) AS min_v,
        |  CAST(max(o_orderstatus) AS STRING) AS max_v
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice_cents', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_totalprice) AS BIGINT),
        |  CAST(count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
        |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS STRING),
        |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS STRING)
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_custkey) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS STRING), CAST(max(o_custkey) AS STRING)
        |FROM orders""".stripMargin)),

    // Referential-integrity audit: orphan counts across the star's
    // foreign keys, each one left join + conditional count (broadcast
    // parent side at scale; no orphans expected in this data, so the
    // query also acts as a generator-consistency check).
    "x_referential_check" -> ((s, dir) => sql(s, dir,
      """SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |UNION ALL
        |SELECT 'orders->customer', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders o2 LEFT JOIN customer c ON c.c_custkey = o2.o_custkey
        |UNION ALL
        |SELECT 'customer->nation', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer c2 LEFT JOIN nation n ON n.n_nationkey = c2.c_nationkey""".stripMargin)),

    // Per-customer order time series: previous-order delta and 3-order
    // moving average. All arithmetic is exact integer cents inside the
    // window frames; the single closing division is one IEEE op on
    // identical inputs. (o_orderdate, o_orderkey) is a unique total
    // order per customer, so frames are deterministic.
    "x_timeseries_features" -> ((s, dir) => sql(s, dir,
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  cents - lag(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_cents,
        |  CAST(CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |       / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3_cents
        |FROM c""".stripMargin)),

    // Market-basket association rules: support / confidence / lift for
    // part pairs co-ordered in the same order, top-25 by lift. The pair
    // generator is a WITHIN-ORDER self-join, so candidate count is
    // Σ_orders (basket_size choose 2) — basket sizes are bounded (~7
    // lines/order in TPC-H-shaped data), never |parts|². Item counts are
    // a combine-friendly groupBy that BROADCASTS back onto the bounded
    // pair table; all ratios are exact integer cross-multiplications
    // quantized to ppm (lift_ppm = c12·n·10⁶ DIV (c1·c2) — no floating
    // point anywhere), and the global top-25 plans as TakeOrdered.
    // The distinct (order, part) set is referenced FOUR times (basket
    // count, item counts, both self-join sides) — Spark inlines CTEs, so
    // it materializes once via Tables.cacheView (one lineitem scan
    // instead of four, plan-audited) and is SHARED with the triangle
    // count's support-2 edge derivation (same distinct set) and across
    // bench reps, the trainedView discipline.
    "x_market_basket" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      Tables.cacheView("mb_li",
        s.sql("SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"))
      sql(s, dir,
      """WITH li AS (SELECT * FROM mb_li),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
        |itm AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY l_partkey),
        |pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS c12
        |       FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
        |       GROUP BY a.l_partkey, b.l_partkey
        |       HAVING count(*) >= 2),
        |r AS (SELECT p1, p2, c12, ia.c AS c1, ib.c AS c2,
        |        c12 * 1000000 DIV nb.n AS support_ppm,
        |        c12 * 1000000 DIV ia.c AS confidence_ppm,
        |        c12 * nb.n * 1000000 DIV (ia.c * ib.c) AS lift_ppm
        |      FROM pr JOIN itm ia ON ia.l_partkey = pr.p1 JOIN itm ib ON ib.l_partkey = pr.p2 CROSS JOIN nb),
        |top AS (SELECT * FROM r ORDER BY lift_ppm DESC, p1, p2 LIMIT 25)
        |SELECT p1, p2, c12 AS c_both, c1, c2, support_ppm, confidence_ppm, lift_ppm,
        |  CAST(row_number() OVER (ORDER BY lift_ppm DESC, p1, p2) AS BIGINT) AS rank
        |FROM top ORDER BY lift_ppm DESC, p1, p2 LIMIT 25""".stripMargin)
    })
  )

  def oracle: Map[String, String] = Map(
    // every event lands in exactly the two epoch-aligned 3h-step starts
    "x_hopping_window" ->
      """WITH g AS (
        |  SELECT event_type, user_id, ts,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
        |    make_timestamp(((epoch_us(ts) // 10800000000) - i) * 10800000000) AS win_start
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i))
        |SELECT event_type, win_start, win_start + INTERVAL 6 HOUR AS win_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM g
        |WHERE ts >= win_start AND ts < win_start + INTERVAL 6 HOUR
        |GROUP BY event_type, win_start""".stripMargin,

    "x_partition_checksum" ->
      s"""SELECT event_type,
         |  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(${duckH64("event_id::VARCHAR || '|' || user_id::VARCHAR || '|' || " +
           "epoch_us(ts)::VARCHAR || '|' || (CAST(FLOOR(value * 100 + 0.5) AS BIGINT))::VARCHAR")} % 1000000007) AS BIGINT) AS checksum
         |FROM events
         |GROUP BY 1, 2""".stripMargin,

    // the naive global-sort order statistic — the engine's
    // histogram-refine answer must equal it exactly
    "x_exact_quantiles" ->
      """WITH c AS (
        |  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c),
        |n AS (SELECT count(*) AS n FROM c),
        |t AS (
        |  SELECT CAST(p AS BIGINT) AS p, ((n - 1) * p) // 100 + 1 AS k
        |  FROM n CROSS JOIN (SELECT unnest([25, 50, 75, 99]) AS p))
        |SELECT t.p, CAST(t.k AS BIGINT) AS k, r.cents AS q_cents
        |FROM t JOIN r ON r.rn = t.k""".stripMargin,

    "x_group_quantiles" ->
      """WITH c AS (
        |  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |r AS (SELECT g, cents, row_number() OVER (PARTITION BY g ORDER BY cents) AS rn FROM c),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY g),
        |t AS (SELECT n.g, p, ((n.n - 1) * p) // 100 + 1 AS k
        |      FROM n CROSS JOIN (SELECT unnest([50, 90, 99]) AS p))
        |SELECT t.g AS event_type, CAST(t.p AS BIGINT) AS p, CAST(t.k AS BIGINT) AS k, r.cents AS q_cents
        |FROM t JOIN r ON r.g = t.g AND r.rn = t.k""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS st_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS st_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS st_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_correlated_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT min(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS min_line_price
        |FROM orders WHERE o_totalprice > 400000""".stripMargin,

    "q_left_outer_agg" ->
      s"""SELECT c_custkey, c_name, o.n_orders, o.spend
         |FROM customer
         |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders, $decSpend AS spend
         |           FROM orders GROUP BY o_custkey) o
         |  ON o.o_custkey = c_custkey
         |WHERE c_custkey <= 300""".stripMargin,

    "q_full_outer_counts" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer WHERE c_acctbal > 4500 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier WHERE s_acctbal > 4500 GROUP BY s_nationkey) s
        |  ON c.nk = s.nk""".stripMargin,

    "q_cross_join_dims" ->
      """SELECT r_name, p.o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin,

    "q_scalar_subquery" ->
      s"""SELECT o_orderkey, o_totalprice,
         |  o_totalprice - (SELECT $decSpend / count(*) FROM orders) AS delta_vs_avg
         |FROM orders WHERE o_totalprice > 480000""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_fast
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin,

    "q_date_functions" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |  CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         |  count(*) AS n, $decSpend AS spend
         |FROM orders GROUP BY 1, 2, 3""".stripMargin,

    "q_string_functions" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substring(c_name, 10, 5) AS sub,
        |  replace(c_name, 'Customer#', 'C') AS repl,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  c_name LIKE '%12%' AS has12,
        |  CAST(strpos(c_name, '9') AS BIGINT) AS pos9,
        |  concat_ws('-', c_mktsegment, c_name) AS tagged
        |FROM customer WHERE c_custkey <= 200""".stripMargin,

    "q_exact_stddev" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2,
        |  sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |        - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
        |       / (count(*) - 1)) AS stddev_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_median_window" ->
      """SELECT o_custkey, o_totalprice AS median_price FROM (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders) WHERE rn = (cnt + 1) // 2""".stripMargin,

    "q_range_frame_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
        |FROM orders""".stripMargin,

    "q_grouping_sets" ->
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""".stripMargin,

    "q_not_exists" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)""".stripMargin,

    "q_part_margin" ->
      """SELECT p_type, p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |  count(*) AS n,
        |  CAST(MAX(p_retailprice) AS DOUBLE) AS max_retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type, p_brand""".stripMargin,

    "q9_profit" ->
      s"""WITH $duckPartsupp
         |SELECT nation, yr,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         |         - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
         |    l_extendedprice, l_discount, ps_supplycost, l_quantity
         |  FROM lineitem, orders, part, supplier, partsupp, nation
         |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
         |    AND l_suppkey = s_suppkey
         |    AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |    AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%bolt%') t
         |GROUP BY nation, yr""".stripMargin,

    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    l_extendedprice, l_discount
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND n1.n_nationkey IN (3, 4) AND n2.n_nationkey IN (3, 4)
        |    AND n1.n_nationkey <> n2.n_nationkey) t
        |GROUP BY supp_nation, cust_nation, yr""".stripMargin,

    "q8_market_share" ->
      """SELECT yr,
        |  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name AS nation,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
        |  FROM lineitem, orders, customer, nation, region
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'ASIA') t
        |GROUP BY yr""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1' AND p_size <= 15
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q18_large_volume_customer" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q2_min_acct_supplier" ->
      s"""WITH $duckPartsupp
         |SELECT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name, n_name, p_partkey, p_type,
         |  CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
         |FROM part, supplier, partsupp, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size IN (5, 15)
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
         |  AND ps_supplycost_cents = (
         |    SELECT min(ps2.ps_supplycost_cents)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'ASIA')""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,

    "q14_promo_share" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
        |  / CAST(SUM(vol) AS DOUBLE) AS promo_share
        |FROM (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01') t""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,

    "q19_disjunctive_filters" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY s_name""".stripMargin,

    "q_window_breadth" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 2) OVER w AS prev2_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q22_dormant_customers" ->
      """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
        |  count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY CAST(c_nationkey % 5 AS BIGINT)""".stripMargin,

    "x_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    TIMESTAMP '1995-01-01 00:00:00' + INTERVAL ((event_id * 97) % 200000000) SECOND AS ts2
        |  FROM events),
        |od AS (
        |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts2, od.o_orderkey, od.o_totalprice
        |FROM e ASOF LEFT JOIN od
        |  ON e.user_id = od.user_id AND e.ts2 >= od.o_orderdate""".stripMargin,

    "x_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    TIMESTAMP '1995-01-01 00:00:00' + INTERVAL ((event_id * 97) % 200000000) SECOND AS ts2
        |  FROM events),
        |od AS (
        |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts2, od.o_orderkey, od.o_totalprice
        |FROM e ASOF LEFT JOIN od
        |  ON e.user_id = od.user_id AND e.ts2 <= od.o_orderdate""".stripMargin,

    "x_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS c_id, value AS c_value
        |      FROM events WHERE event_type = 'click'),
        |back AS (
        |  SELECT p.event_id, p.user_id, p.ts,
        |    c.c_ts AS b_ts, c.c_id AS b_id, c.c_value AS b_value
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.c_ts),
        |fwd AS (
        |  SELECT p.event_id, c.c_ts AS f_ts, c.c_id AS f_id, c.c_value AS f_value
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.c_ts)
        |SELECT b.event_id, b.user_id, b.ts,
        |  CASE WHEN take_back THEN b_id ELSE f_id END AS near_id,
        |  CASE WHEN take_back THEN b_value ELSE f_value END AS near_value,
        |  CASE WHEN take_back AND b_ts IS NOT NULL THEN 'b'
        |       WHEN f_ts IS NOT NULL THEN 'f' END AS dir,
        |  CASE WHEN take_back THEN epoch_us(b.ts) - epoch_us(b_ts)
        |       ELSE epoch_us(f_ts) - epoch_us(b.ts) END AS lag_us
        |FROM (
        |  SELECT b.*, f.f_ts, f.f_id, f.f_value,
        |    b_ts IS NOT NULL AND (f_ts IS NULL OR
        |      epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)) AS take_back
        |  FROM back b JOIN fwd f ON b.event_id = f.event_id) b""".stripMargin,

    "x_range_join" ->
      """WITH e AS (SELECT * FROM events WHERE event_type = 'error')
        |SELECT e.event_id AS error_id, e.user_id,
        |  count(x.event_id) AS n_follow,
        |  CAST(SUM(CAST(x.value AS DECIMAL(12,2))) AS DOUBLE) AS follow_value,
        |  min(x.ts) AS first_follow_ts
        |FROM e LEFT JOIN events x
        |  ON x.user_id = e.user_id AND x.ts > e.ts AND x.ts <= e.ts + INTERVAL 12 HOUR
        |GROUP BY e.event_id, e.user_id""".stripMargin,

    "x_concentration_share" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |    SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM events GROUP BY event_type, user_id),
        |ranked AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents DESC, user_id) AS rk
        |  FROM u)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN rk <= 10 THEN cents ELSE 0 END) AS BIGINT) * 1000
        |    // CAST(SUM(cents) AS BIGINT) AS top10_share_pm
        |FROM ranked GROUP BY event_type""".stripMargin,

    "x_interval_concurrency" ->
      """WITH w AS (
        |  SELECT user_id, ts AS s, ts + INTERVAL 12 HOUR AS e
        |  FROM events WHERE event_type = 'error'),
        |b AS (
        |  SELECT user_id, s AS t, 1 AS delta FROM w
        |  UNION ALL
        |  SELECT user_id, e AS t, -1 AS delta FROM w),
        |r AS (
        |  SELECT user_id,
        |    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM b)
        |SELECT user_id, CAST(max(open) AS BIGINT) AS peak_concurrent
        |FROM r GROUP BY user_id""".stripMargin,

    "x_pit_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    TIMESTAMP '1995-01-01 00:00:00' + INTERVAL ((event_id * 97) % 200000000) SECOND AS ts2
        |  FROM events),
        |iv AS (
        |  SELECT user_id, valid_from, o_orderkey, o_totalprice,
        |    least(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
        |          valid_from + INTERVAL 30 DAY) AS valid_to
        |  FROM (
        |    SELECT o_custkey AS user_id, o_orderdate AS valid_from, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts2, iv.o_orderkey, iv.o_totalprice
        |FROM e LEFT JOIN iv
        |  ON e.user_id = iv.user_id AND e.ts2 >= iv.valid_from AND e.ts2 < iv.valid_to""".stripMargin,

    "x_interval_overlap" ->
      """WITH w AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate AS ws,
        |    o_orderdate + INTERVAL 30 DAY AS we
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS a_key, b.o_orderkey AS b_key,
        |  (epoch_us(least(a.we, b.we)) - epoch_us(greatest(a.ws, b.ws))) // 86400000000 AS overlap_days
        |FROM w a JOIN w b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |  AND a.ws < b.we AND b.ws < a.we""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $duckPartsupp,
         |natps AS (
         |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS val_cents
         |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  WHERE s_nationkey = 3)
         |SELECT ps_partkey, CAST(SUM(val_cents) AS DOUBLE) / 100.0 AS part_value
         |FROM natps GROUP BY ps_partkey
         |HAVING SUM(val_cents) * (SELECT count(DISTINCT ps_partkey) FROM natps) >
         |       2 * (SELECT SUM(val_cents) FROM natps)""".stripMargin,

    "q16_parts_supplier" ->
      s"""WITH $duckPartsupp
         |SELECT p_type, CAST(p_size AS BIGINT) AS p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY p_type, CAST(p_size AS BIGINT)""".stripMargin,

    "q20_excess_suppliers" ->
      s"""WITH $duckPartsupp
         |SELECT s_suppkey, s_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND 2 * ps_availqty > (
         |        SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
         |        FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'))""".stripMargin,

    "q_cube_agg" ->
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY CAST(floor(o_totalprice / 50000) AS BIGINT)""".stripMargin,

    "x_group_concat" ->
      """WITH d AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer),
        |segs AS (SELECT c_nationkey,
        |           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        |         FROM d GROUP BY c_nationkey),
        |cnt AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |        FROM customer GROUP BY c_nationkey)
        |SELECT cnt.c_nationkey, cnt.n_customers, segs.segments
        |FROM cnt JOIN segs ON segs.c_nationkey = cnt.c_nationkey""".stripMargin,

    "x_data_profile" ->
      """SELECT 'o_orderstatus' AS col, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderstatus) AS VARCHAR) AS min_v,
        |  CAST(max(o_orderstatus) AS VARCHAR) AS max_v
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice_cents', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_totalprice) AS BIGINT),
        |  CAST(count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
        |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR),
        |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_custkey) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders""".stripMargin,

    "x_referential_check" ->
      """SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |UNION ALL
        |SELECT 'orders->customer', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders o2 LEFT JOIN customer c ON c.c_custkey = o2.o_custkey
        |UNION ALL
        |SELECT 'customer->nation', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer c2 LEFT JOIN nation n ON n.n_nationkey = c2.c_nationkey""".stripMargin,

    "x_timeseries_features" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  cents - lag(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_cents,
        |  CAST(CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |       / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3_cents
        |FROM c""".stripMargin,

    "x_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
        |itm AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY l_partkey),
        |pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS c12
        |       FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
        |       GROUP BY a.l_partkey, b.l_partkey
        |       HAVING count(*) >= 2),
        |r AS (SELECT p1, p2, c12, ia.c AS c1, ib.c AS c2,
        |        c12 * 1000000 // nb.n AS support_ppm,
        |        c12 * 1000000 // ia.c AS confidence_ppm,
        |        c12 * nb.n * 1000000 // (ia.c * ib.c) AS lift_ppm
        |      FROM pr JOIN itm ia ON ia.l_partkey = pr.p1 JOIN itm ib ON ib.l_partkey = pr.p2 CROSS JOIN nb)
        |SELECT p1, p2, c12 AS c_both, c1, c2, support_ppm, confidence_ppm, lift_ppm,
        |  CAST(row_number() OVER (ORDER BY lift_ppm DESC, p1, p2) AS BIGINT) AS rank
        |FROM r ORDER BY lift_ppm DESC, p1, p2 LIMIT 25""".stripMargin
  )
}
