package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout scale patterns: partitioned writes with partition
  * pruning, bucketed tables with exchange-free joins, and the S9 error
  * channel listener. */
class StorageLayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("partitionBy write → partition-pruned read (no full scan)") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .write.partitionBy("lang").mode("overwrite").parquet(s"$dir/docs")
    val pruned = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    // pruning actually skips other partitions: scanned files all under lang=en
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")))
  }

  test("dynamic partition overwrite replaces only the partitions present in the batch") {
    // The incremental-reload primitive: a daily job rewrites the day(s)
    // it processed and MUST NOT truncate the rest of the table — static
    // overwrite mode (the default) would. Scoped conf, restored after.
    val dir = Files.createTempDirectory("graft_dyn").toString
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "dynamic")
      Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(s"$dir/t")
      // re-load of d2 only; d1 must survive untouched
      Seq((30L, "d2"), (31L, "d2")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(s"$dir/t")
      val got = spark.read.parquet(s"$dir/t")
        .select("id", "day").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "d1"), (2L, "d1"), (30L, "d2"), (31L, "d2")))
    } finally spark.conf.set(key, prev)
  }

  test("schema evolution: mergeSchema unions old and new file schemas, old files read nulls") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    // v1 writer: (id, a); later deploy adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$dir/t/batch=1")
    Seq((3L, "z", 10.5)).toDF("id", "a", "b")
      .write.parquet(s"$dir/t/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet == Set("id", "a", "b", "batch"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.isNullAt(merged.columns.indexOf("b"))))
    assert(rows(2).getDouble(merged.columns.indexOf("b")) == 10.5)
    // and the coercion pipeline drives the merged frame to a target schema
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
    val coerced = graft.ops.Coerce.toSchema(merged.drop("batch"), target)
    assert(coerced.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val o = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      o.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      val a = spark.table("orders_bkt").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      // bucketed distribution satisfies the agg's requirement: no Exchange
      val aggPlan = a.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan.take(500))
      val selfJoin = spark.table("orders_bkt").as("x")
        .join(spark.table("orders_bkt").as("y"), "o_custkey")
      val joinPlan = selfJoin.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"))
      assert(!joinPlan.contains("Exchange hashpartitioning"), joinPlan.take(500))
      assert(selfJoin.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
    }
  }

  test("two-table bucketed join (storage_bucketed_join shape) has no exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      graft.io.Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bkt_l")
      graft.io.Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bkt_o")
      val j = spark.table("bkt_l")
        .join(spark.table("bkt_o"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // matching bucket layouts satisfy the join; only the (tiny) agg on
      // a DIFFERENT key may exchange
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
        && !plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(800))
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_l")
      spark.sql("DROP TABLE IF EXISTS bkt_o")
    }
  }

  test("observe(): pipeline metrics ride the job without a second scan") {
    // the monitoring twin of the S9 error channel: row counts and sums
    // collected AS the job runs (no extra action, no extra scan) via the
    // Observation API — at scale this is how a load job reports its own
    // volume without paying for a count() pass
    val obs = new org.apache.spark.sql.Observation("load_metrics")
    val df = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total_price"),
        count_if(col("o_totalprice") > 100000).as("n_large"))
    val written = df.filter(col("o_orderstatus") =!= "X").count() // the real action
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] > 0)
    assert(m("n_rows").asInstanceOf[Long] >= written)
    assert(m("total_price") != null && m("n_large").asInstanceOf[Long] >= 0)
  }

  test("S9 error channel records failed actions") {
    val failures = graft.io.ErrorChannel.attach(spark)
    // ANSI division by zero fails at execution time, not analysis
    intercept[Exception] {
      Seq(1L, 0L).toDF("d").select((lit(10L) / col("d")).as("q"))
        .filter(col("q") > 0).count()
    }
    // listener delivery is async on the listener bus
    val deadline = System.currentTimeMillis() + 10000
    while (failures.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(!failures.isEmpty)
    val f = failures.peek()
    assert(f.action == "count")
  }
}
