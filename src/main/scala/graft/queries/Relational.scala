package graft.queries

import graft.Tables
import graft.etl.Normalize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2) exercised over the testdata
  * star schema, each with a DuckDB oracle.
  *
  * Oracle-determinism rules used throughout (the driver hash-compares
  * values):
  *  - double aggregation is never done directly: per-row double arithmetic
  *    (bit-identical across engines) is cast to DECIMAL, summed exactly
  *    (order-independent), and only then cast back to double;
  *  - every LIMIT sits on a total order (explicit tie-break keys);
  *  - `events.ts` is nanosecond parquet: Spark truncates to µs on read, so
  *    oracles compare/order via CAST(ts AS TIMESTAMP) (same truncation);
  *  - every computed column is aliased identically on both sides.
  */
object Relational {

  /** Exact, order-independent sum of a per-row double expression. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")
  private val DSum = "CAST(SUM(CAST(%s AS DECIMAL(18,4))) AS DOUBLE)"

  /** q70 Morton-key geometry: [[ZBits]] bits per dimension interleave
    * into a 2·ZBits-bit z-value. 8 bits keeps every prefix bucket
    * populated at test scale; a production writer range-ranks each
    * dimension to 16+ bits first — same machinery, wider key.
    */
  private val ZBits = 8
  private val ZMask = (1L << ZBits) - 1

  /** The z-value interleave as DuckDB SQL over columns `x`/`y` —
    * generated from the SAME loop shape as the Spark side (x bits at
    * odd positions, y at even), so the two engines cannot drift.
    */
  private def sqlZ: String =
    (0 until ZBits).map { i =>
      s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R-groupBy/partial-agg (SURVEY §2.1 aggregations; TPC-H Q1 shape)
    "q01_pricing_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    }),

    // top-k over join + agg (sort/limit with total order; TPC-H Q3 shape)
    "q02_topk_revenue" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),

    // multi-way join through dims (broadcast) + agg (TPC-H Q5 shape)
    "q03_region_revenue" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val cu = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // pushdown-friendly filter + global agg (TPC-H Q6 shape)
    "q04_filter_sum" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // R14 argmax checkpoint: greatest (modified, id) tuple via orderBy+limit 1
    "q05_argmax_checkpoint" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        .limit(1)
        .select(to_date(col("o_orderdate")).as("greatest_date"), col("o_orderkey"))
    }),

    // R15 min-by audit pick: smallest (ts, id)
    "q06_minby_audit" -> ((s, dir) => {
      Tables(s, dir, "events")
        .orderBy(asc("ts"), asc("event_id"))
        .limit(1)
        .select("event_id", "user_id", "event_type")
    }),

    // R16 anti-join: configured-but-never-loaded analogue
    "q07_anti_join" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // semi-join (EXISTS) + agg
    "q08_semi_join" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
    }),

    // customer order-count distribution — the TPC-H Q13 shape, the one
    // relational pattern the inventory lacked: a LEFT OUTER join that
    // must keep zero-order customers (an inner join silently erases the
    // "0 orders" bucket — the classic Q13 bug), then TWO stacked
    // aggregations (per-customer count → per-count customer histogram).
    // Plan: one outer equi-join shuffled on the key + two map-combined
    // aggs; output ≤ max-orders-per-customer rows. At scale the first
    // agg rides the join's partitioning (no extra exchange).
    "q137_order_histogram" -> ((s, dir) => {
      val perCust = Tables(s, dir, "customer").select(col("c_custkey"))
        .join(Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
      perCust.groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
    }),

    // R17/R20 upsert last-writer-wins: latest row per key via window dedup
    "q09_upsert_lastwins" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    }),

    // window rank per group with total tie-break
    "q10_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // set op: UNION distinct across two sources
    "q11_set_union" -> ((s, dir) => {
      Tables(s, dir, "lineitem").select(col("l_returnflag").as("v"))
        .union(Tables(s, dir, "orders").select(col("o_orderstatus").as("v")))
        .distinct()
    }),

    // R1 keyset-cursor pagination filter: (ts, id) >= cursor tuple
    "q12_keyset_cursor" -> ((s, dir) => {
      val t0 = lit("2024-01-15 00:00:00").cast("timestamp")
      Tables(s, dir, "events")
        .filter(col("ts") > t0 || (col("ts") === t0 && col("event_id") >= 5000))
        .agg(count(lit(1)).as("n"), min("event_id").as("min_id"),
          max("event_id").as("max_id"))
    }),

    // R16 tuple-IN semi-filter
    "q13_tuple_in" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(expr("(l_returnflag, l_linestatus) IN (('A','F'),('N','O'),('R','F'))"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    }),

    // R32 existence/count check
    "q14_count_check" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(count(lit(1)).as("n"))
        .select(lit("lineitem").as("tbl"), col("n"))
    }),

    // R3 content hash (sha-256, the grid-hash primitive)
    "q15_content_hash" -> ((s, dir) => {
      Tables(s, dir, "documents").select(col("doc_id"), sha2(col("text"), 256).as("h"))
    }),

    // hierarchical rollup (grouping-sets family): per-(flag,status),
    // per-flag subtotals, and a grand total in one pass
    "q37_rollup" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // CUBE completes the grouping-set family beside q37's ROLLUP: all
    // four marginals of (status, flag) in ONE pass — the Expand operator
    // replicates each row per grouping set BEFORE the map-side combine,
    // so the plan stays a single two-phase aggregate (never four scans).
    // grouping_id disambiguates a real NULL key from a marginal row —
    // the standard CUBE-consumer contract, identical in both engines.
    "q144_status_cube" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          grouping_id().as("gid"))
    }),

    // as-of association, window-formulated: each event paired with the
    // most recent prior-or-same-time 'signup' of the same user. The
    // scalable shape for as-of at 100 TB: one shuffle on the key, a
    // running max over the ordered partition — no range-join explosion.
    "q38_asof_signup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("asof_signup_us",
          max(when(col("event_type") === "signup", unix_micros(col("ts"))))
            .over(w))
        .filter(col("event_type") =!= "signup")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("asof_signup_us"))
    }),

    // bucketed-staging join — the [[graft.Bucketing]] consumer: both
    // relations are staged hash-bucketed AND per-bucket sorted on the
    // join key, so the join (and the groupBy on the same key — hash
    // partitioning on a subset of the grouping keys satisfies the agg's
    // clustering too) plans with ZERO Exchange operators. At 100 TB this
    // is the pay-the-shuffle-once posture: the fact table re-shuffles on
    // NO subsequent query against any co-staged relation. Staging runs
    // once per (session, sf dir) — the catalog check mirrors how a
    // warehouse amortizes the staging write across every later join —
    // and the merge hint keeps the plan the sort-merge shape a big×big
    // join takes (a broadcast at toy scale would hide the property the
    // staging buys). Semantics are the plain join+agg the oracle runs;
    // the staging is an implementation detail of the Spark plan.
    "q64_bucketed_join" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val ordersT = s"graft_q64_orders_$tag"
      val itemsT = s"graft_q64_items_$tag"
      if (!s.catalog.tableExists(ordersT)) {
        // the in-memory catalog starts empty per JVM, so a fresh session
        // always re-stages (overwrite) — stale files from an older run
        // can never serve a query
        graft.Bucketing.stage(
          Tables(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderstatus")),
          ordersT, "o_orderkey", 8)
        graft.Bucketing.stage(
          Tables(s, dir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"),
              col("l_extendedprice"), col("l_discount")),
          itemsT, "o_orderkey", 8)
      }
      s.table(ordersT).join(s.table(itemsT).hint("merge"), "o_orderkey")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
    }),

    // Z-order (Morton) clustering statistics — the LAYOUT primitive for
    // multi-dimensional pruning at 100 TB (the technique behind Delta /
    // Iceberg OPTIMIZE ZORDER): interleaving the bits of two dimensions
    // into one sort key makes any fixed z-PREFIX bound BOTH dimensions
    // at once, so files written in z-order carry narrow min/max stats on
    // every z-ordered column and a predicate on either dimension prunes.
    // This query computes the 16-bit Morton key of (o_custkey low byte,
    // order-date epoch-day low byte), buckets rows by the key's top 4
    // bits (the file-boundary analogue — a real writer would range-rank
    // each dimension to 16+ bits first; the bit machinery is identical),
    // and reports each bucket's dimension envelopes: the z-prefix
    // property guarantees max−min ≤ 63 on BOTH dims in every bucket,
    // which is exactly the row-group-stats narrowness pruning feeds on.
    // All-integer (bit shifts and masks generated from ONE Scala loop
    // for both engines — no drift possible), one narrow projection, one
    // shuffle for the aggregate. ZorderSpec pins the envelope bound and
    // the single-Exchange plan.
    "q70_zorder_stats" -> ((s, dir) => {
      val z = (0 until ZBits).map { i =>
        shiftleft(shiftright(col("x"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
          shiftleft(shiftright(col("y"), i).bitwiseAND(lit(1L)), 2 * i)
      }.reduce(_ + _)
      Tables(s, dir, "orders")
        .select(
          col("o_custkey").cast("long").bitwiseAND(lit(ZMask)).as("x"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").bitwiseAND(lit(ZMask)).as("y"))
        .select(col("x"), col("y"), z.as("z"))
        .select(col("x"), col("y"),
          shiftright(col("z"), 2 * ZBits - 4).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
    }),

    // R12 column normalization surfaced as output schema
    "q16_normalize_cols" -> ((s, dir) => {
      val names = Normalize.columnNames(Seq("Région Näme", "2019 total", "#"))
      Tables(s, dir, "region").select(
        col("r_name").as(names(0)),
        col("r_regionkey").as(names(1)),
        col("r_name").as(names(2)))
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${DSum.format("l_quantity")} AS sum_qty,
         |${DSum.format("l_extendedprice")} AS sum_base_price,
         |${DSum.format("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |COUNT(*) AS count_order,
         |${DSum.format("l_quantity")}/COUNT(*) AS avg_qty
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_revenue" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |${DSum.format("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q03_region_revenue" ->
      s"""SELECT r_name, n_name,
         |${DSum.format("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY r_name, n_name""".stripMargin,

    "q04_filter_sum" ->
      s"""SELECT ${DSum.format("l_extendedprice*l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q05_argmax_checkpoint" ->
      """SELECT CAST(o_orderdate AS DATE) AS greatest_date, o_orderkey
        |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin,

    "q06_minby_audit" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY CAST(ts AS TIMESTAMP), event_id LIMIT 1""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    // COUNT(o_orderkey), not COUNT(*): the outer join's null rows must
    // count as zero orders
    "q137_order_histogram" ->
      """WITH pc AS (SELECT c.c_custkey,
        |  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers
        |FROM pc GROUP BY n_orders""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,

    "q09_upsert_lastwins" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,

    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,

    "q11_set_union" ->
      """SELECT l_returnflag AS v FROM lineitem
        |UNION SELECT o_orderstatus AS v FROM orders""".stripMargin,

    "q12_keyset_cursor" ->
      """SELECT COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00'
        |OR (CAST(ts AS TIMESTAMP) = TIMESTAMP '2024-01-15 00:00:00' AND event_id >= 5000)""".stripMargin,

    "q13_tuple_in" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |WHERE (l_returnflag, l_linestatus) IN (('A','F'),('N','O'),('R','F'))
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q14_count_check" ->
      "SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem",

    "q15_content_hash" ->
      "SELECT doc_id, sha256(text) AS h FROM documents",

    "q16_normalize_cols" ->
      """SELECT r_name AS "region name", r_regionkey AS "_2019 total", r_name AS "_"
        |FROM region""".stripMargin,

    "q37_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |${DSum.format("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    // GROUPING's leftmost argument is the most significant bit — the
    // same convention as Spark's grouping_id over the cube column order
    "q144_status_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |${DSum.format("o_totalprice")} AS sum_price,
         |CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    // the bucketed staging is an implementation detail of the Spark
    // plan; the semantics are the plain join + aggregate
    "q64_bucketed_join" ->
      s"""SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_items,
         |${DSum.format("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderkey, o_orderstatus""".stripMargin,

    // all-integer bit arithmetic; the interleave expression is generated
    // from the same Scala loop as the Spark plan
    "q70_zorder_stats" ->
      s"""WITH d AS (SELECT
         |  CAST(o_custkey AS BIGINT) & $ZMask AS x,
         |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) & $ZMask AS y
         |  FROM orders),
         |z AS (SELECT x, y, $sqlZ AS z FROM d),
         |b AS (SELECT x, y, z >> ${2 * ZBits - 4} AS bucket FROM z)
         |SELECT bucket, COUNT(*) AS n,
         |  MIN(x) AS min_x, MAX(x) AS max_x,
         |  MIN(y) AS min_y, MAX(y) AS max_y
         |FROM b GROUP BY bucket""".stripMargin,

    "q38_asof_signup" ->
      """SELECT event_id, user_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  MAX(CASE WHEN event_type = 'signup'
        |        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_us
        |FROM events QUALIFY event_type != 'signup'""".stripMargin)
}
