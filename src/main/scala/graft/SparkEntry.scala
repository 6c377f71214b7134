package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables
import graft.ops.{Coerce, Dedup, Merge, Normalize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Naming scheme ties each query to SURVEY §2's operator inventory:
  * `pN_*` = reference projection/transform ops, `w4/s8` = upsert-merge,
  * `qN_*` = relational/agg coverage, `xN_*` = EXT LLM-pipeline ops.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - money/measure aggregates go through DECIMAL casts on BOTH sides —
  *    double sums are partition-order-dependent, decimal sums are exact;
  *  - every query carries a total ORDER BY (ties broken by keys); Catalyst
  *    drops these sorts under Bench's count() (EliminateSorts), so they
  *    cost nothing in the bench path;
  *  - aliases match the oracle SQL exactly (driver sorts columns by name).
  */
object SparkEntry {

  /** Money-safe decimal cast: exact arithmetic, same rule in the oracle. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** Flagship: the reference's full W1+W2 chain re-expressed on `events`
    * (SURVEY §7.2.1) — JSON parse (X6) → flatten (P2) → rename (P3) →
    * schema coercion (P5-P11) → LWW latest-per-key dedup (W4) → project.
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val parsed = ev.withColumn("p", from_json(col("props"), propsSchema)).drop("props")
    val flat = Normalize.flatten(parsed)
    val renamed = Normalize.renameColumns(flat, Map("p.k" -> "k"))
    val target = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts", TimestampType), StructField("k", LongType)))
    val coerced = Coerce.toSchema(renamed, target)
    Merge.latestByKey(coerced, Seq("user_id", "event_type"), Seq("ts"), Seq("event_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----------------------------------------------------------------
    // Relational / aggregation coverage (SURVEY §2.3 — absent in the
    // reference, required for a complete engine; also the bench workload)
    // ----------------------------------------------------------------

    // TPC-H Q1-style pricing summary: single scan, hash agg with map-side
    // partial aggregation; decimal sums for cross-engine exactness.
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-12-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("decimal(38,4)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style: selective dim filter → join fact → agg → top-k.
    // customer is small → Catalyst broadcasts it; lineitem never shuffles
    // for the join, only for the final agg.
    "q3_top_revenue_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast("decimal(38,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Semi join (EXISTS): orders having any high-quantity line.
    "join_semi_highqty" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Anti join (NOT EXISTS): orders with no lineitems at all.
    "join_anti_no_lines" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // Window top-k: 3 biggest orders per customer, rank exposed.
    "window_topk_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
        .orderBy("o_custkey", "rk")
    }),

    // Rollup over the region→nation hierarchy (grouping-sets machinery).
    "agg_rollup_region" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast("decimal(38,2)").as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // Distinct aggregation per segment.
    "agg_distinct_segments" -> ((s, dir) => {
      Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          sum(dec(col("c_acctbal"))).cast("decimal(38,2)").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // Set op: customers ordering in 1995 but never in 2000+ (EXCEPT).
    "set_except_customers" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
      val b = o.filter(year(col("o_orderdate")) >= 2000).select(col("o_custkey").as("custkey"))
      a.except(b).orderBy("custkey")
    }),

    // ----------------------------------------------------------------
    // Reference parity ops (SURVEY §2.2) demonstrated on harness tables
    // ----------------------------------------------------------------

    // P2/X6 — typed JSON parse + recursive struct flatten (json_normalize).
    "p2_flatten_json" -> ((s, dir) => {
      val parsed = Tables.events(s, dir)
        .withColumn("p", from_json(col("props"), propsSchema))
      Normalize.flatten(parsed.select(col("event_id"), col("p")))
        .withColumnRenamed("p.k", "k")
        .orderBy("event_id")
    }),

    // P3 — bulk rename with pass-through semantics (pandas rename).
    "p3_rename_bulk" -> ((s, dir) => {
      Normalize.renameColumns(Tables.customer(s, dir), Map(
        "c_custkey" -> "customer_id", "c_name" -> "full_name",
        "c_acctbal" -> "account_balance", "c_mktsegment" -> "market_segment",
        "notAColumn" -> "ignored"))
        .select(col("customer_id"), col("full_name"), col("account_balance"),
          col("market_segment"), col("c_nationkey"))
        .orderBy("customer_id")
    }),

    // P4 — consolidate sparse columns into one null-dropping JSON column.
    "p4_consolidate_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("et", when(col("event_type") === "view", lit(null)).otherwise(col("event_type")))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .select(col("event_id"), to_json(struct(col("et"), col("k"))).as("custom_fields"))
        .orderBy("event_id")
    }),

    // P5 — CSV float-artifact scrub ("17.0" → "17"), native expression.
    "p5_float_scrub" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          Coerce.scrubFloatArtifact(col("l_quantity")).as("qty_str"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P6 — numeric coercion with errors='coerce' semantics (garbage→NULL).
    "p6_coerce_long" -> ((s, dir) => {
      val dirty = when(col("event_type") === "error", lit("N/A"))
        .otherwise(get_json_object(col("props"), "$.k"))
      Tables.events(s, dir)
        .select(col("event_id"), Coerce.toLongCoerce(dirty).as("k_long"))
        .orderBy("event_id")
    }),

    // P7 — string coercion with the reference's ' ' sentinel for missing.
    "p7_string_sentinel" -> ((s, dir) => {
      val maybeNull = when(col("event_type") === "view", lit(null)).otherwise(col("event_type"))
      Tables.events(s, dir)
        .select(col("event_id"), Coerce.toSentinelString(maybeNull).as("etype"))
        .orderBy("event_id")
    }),

    // P9/P11 — dual-format timestamp parse, unparseable → NULL.
    "p9_ts_parse" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_str",
          when(col("event_id") % 10 === 0, lit("not-a-date"))
            .otherwise(date_format(col("ts"), Coerce.referenceTsFormat)))
      ev.select(col("event_id"), col("ts_str"),
          Coerce.toTimestampUtc(col("ts_str")).as("ts_parsed"))
        .orderBy("event_id")
    }),

    // W4 — LWW latest state per (user, event_type) over the event log.
    "w4_lww_latest" -> ((s, dir) => {
      Merge.latestByKey(Tables.events(s, dir),
          Seq("user_id", "event_type"), Seq("ts"), Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy("user_id", "event_type")
    }),

    // S8 — upsert: per-user snapshot before the split merged with incoming
    // events after it; incoming wins per key (ON CONFLICT DO UPDATE).
    "s8_merge_upsert" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val split = to_timestamp(lit("2024-02-15"))
      val existing = Merge.latestByKey(ev.filter(col("ts") < split),
        Seq("user_id"), Seq("ts"), Seq("event_id"))
      val incoming = Merge.latestByKey(ev.filter(col("ts") >= split),
        Seq("user_id"), Seq("ts"), Seq("event_id"))
      Merge.upsertLww(existing, incoming, Seq("user_id"), Seq("ts"), Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy("user_id")
    }),

    // ----------------------------------------------------------------
    // EXT — LLM-pipeline ops (SURVEY §2.5)
    // ----------------------------------------------------------------

    // X1 — exact dedup via content digest (group on sha2, min id kept).
    "x1_dedup_exact" -> ((s, dir) => {
      Dedup.exactByContent(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("content_hash")
    }),

    // X1 — deterministic dropDuplicates: first doc per (lang, source).
    "x1_dedup_first_per_key" -> ((s, dir) => {
      Dedup.firstPerKey(Tables.documents(s, dir), Seq("lang", "source"), Seq("doc_id"))
        .select(col("lang"), col("source"), col("doc_id"))
        .orderBy("lang", "source")
    }),

    // X6 — JSON prop extraction, filter pushdown, exact integer agg.
    "x6_json_filter_agg" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, dir)
        .withColumn("k", k)
        .filter(col("k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy("event_type")
    })
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops → driver
    * records a weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue_orders" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "join_semi_highqty" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "join_anti_no_lines" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "window_topk_orders" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "agg_rollup_region" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_distinct_segments" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | count(DISTINCT c_nationkey) AS n_nations,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "set_except_customers" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) >= 2000
        |ORDER BY custkey""".stripMargin,

    "p2_flatten_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "p3_rename_bulk" ->
      """SELECT c_custkey AS customer_id, c_name AS full_name,
        | c_acctbal AS account_balance, c_mktsegment AS market_segment, c_nationkey
        |FROM customer ORDER BY customer_id""".stripMargin,

    "p4_consolidate_json" ->
      """SELECT event_id,
        | CAST(json_merge_patch('{}', to_json(struct_pack(
        |   et := CASE WHEN event_type = 'view' THEN NULL ELSE event_type END,
        |   k := CAST(json_extract_string(props, '$.k') AS BIGINT)))) AS VARCHAR) AS custom_fields
        |FROM events ORDER BY event_id""".stripMargin,

    "p5_float_scrub" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_quantity = CAST(CAST(l_quantity AS BIGINT) AS DOUBLE)
        |      THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
        |      ELSE CAST(l_quantity AS VARCHAR) END AS qty_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p6_coerce_long" ->
      """SELECT event_id,
        | TRY_CAST(TRY_CAST(CASE WHEN event_type = 'error' THEN 'N/A'
        |   ELSE json_extract_string(props, '$.k') END AS DOUBLE) AS BIGINT) AS k_long
        |FROM events ORDER BY event_id""".stripMargin,

    "p7_string_sentinel" ->
      """SELECT event_id,
        | CASE WHEN event_type = 'view' OR event_type IS NULL
        |        OR event_type IN ('nan', 'NaN') THEN ' '
        |      ELSE event_type END AS etype
        |FROM events ORDER BY event_id""".stripMargin,

    "p9_ts_parse" ->
      """SELECT event_id, ts_str,
        | COALESCE(TRY_STRPTIME(ts_str, '%m-%d-%Y %H:%M:%S'),
        |          TRY_CAST(ts_str AS TIMESTAMP)) AS ts_parsed
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 10 = 0 THEN 'not-a-date'
        |             ELSE strftime(ts, '%m-%d-%Y %H:%M:%S') END AS ts_str
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,

    "w4_lww_latest" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |         ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "s8_merge_upsert" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |         ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "x1_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
        | count(*) AS n_dupes
        |FROM documents GROUP BY sha256(text) ORDER BY content_hash""".stripMargin,

    "x1_dedup_first_per_key" ->
      """SELECT lang, source, doc_id FROM (
        |  SELECT lang, source, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY lang, source""".stripMargin,

    "x6_json_filter_agg" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
