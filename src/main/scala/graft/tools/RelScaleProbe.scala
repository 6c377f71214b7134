package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ×N empirical scale probe for the RELATIONAL (TPC-H-shaped)
  * half of the board — the complement of [[ScaleProbe]], which inflates
  * only the documents corpus. Inflates `lineitem` + `orders` with a
  * consistent union-with-id-remap (`o_orderkey → o_orderkey*f + rep`,
  * same on `l_orderkey`), so referential integrity is preserved while
  * the per-dimension fan-out (orders per customer, lines per part, lines
  * per supplier) grows f× — the "fact tables grow, dimensions don't"
  * shape of a real production scale-up. Dimension/other tables are
  * symlinked from the source fixture dir unchanged.
  *
  * Each probed query runs twice per factor: run 1 is cold (first scan of
  * the inflated files + codegen), run 2 is the steady state the scaling
  * verdict is read from. A fixed CPU-only control workload is timed per
  * factor so box drift between the f=1 and f=10 sections is visible.
  *
  * Usage: `runMain graft.tools.RelScaleProbe [f1 f2 ...]` (default 1 10);
  * `SCALE_QS=q3_top_revenue_orders,...` filters the query list.
  */
object RelScaleProbe {
  /** The 10 slowest relational board queries (BENCH_FULL r7) plus the
    * classic deep-join TPC-H shapes q3/q5/q9/q18/q21 named by the
    * round-7 review. All of these read lineitem and/or orders. */
  val probeQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_local_volume",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q17_small_quantity", "q18_large_orders", "sql_q21_sole_blame",
    "sql_correlated_scalar", "agg_basket_lift", "agg_rfm_segments",
    "agg_abc_customers", "agg_equidepth_hist", "agg_weighted_median",
    "skew_salted_join", "skew_salted_auto", "storage_bucketed_join")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val only: Set[String] = sys.env.get("SCALE_QS")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val scratch = new java.io.File(
      sys.env.getOrElse("SCALE_SCRATCH", "tmp/relscale")).getAbsolutePath
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def control(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32).selectExpr("sum(id % 7) AS s").collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    // Untimed warm-up at the first factor: session init, codegen
    // compiler, parquet footer reads, and the prefix-sum machinery all
    // JIT here instead of inflating the first timed section (without
    // this, the f=1 control read 3.7 s vs 0.13 s at f=10 — every f=1
    // ratio was really measuring JVM warm-up).
    locally {
      val dir0 = s"$scratch/x${factors.head}"
      materialize(spark, srcDir, dir0, factors.head)
      probeQueries.filter(q => only.isEmpty || only(q)).foreach { q =>
        graft.SparkEntry.queries(q)(spark, dir0).count(): Unit
      }
      spark.catalog.clearCache()
    }
    factors.foreach { f =>
      val dir = s"$scratch/x$f"
      materialize(spark, srcDir, dir, f)
      println(f"[relscale] f=$f%-3d control ${control()}%7.3f s")
      probeQueries.filter(q => only.isEmpty || only(q)).foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        spark.catalog.clearCache()
        println(f"[relscale] f=$f%-3d $q%-26s cold ${runs(0)._1}%7.2f s  warm ${runs(1)._1}%7.2f s  (${runs(1)._2} rows)")
      }
    }
    spark.stop()
  }

  /** Build the ×f fixture dir once (idempotent via an `_GRAFT_OK`
    * marker): inflated lineitem/orders written as parquet, every other
    * table symlinked to the source fixture file. */
  private def materialize(spark: SparkSession, srcDir: String, dir: String, f: Int): Unit = {
    if (Files.exists(Paths.get(dir, "_GRAFT_OK"))) return
    Files.createDirectories(Paths.get(dir))
    val rep = spark.range(f.toLong).toDF("rep")
    def inflate(name: String, key: String): Unit = {
      val base = graft.io.Tables.load(spark, srcDir, name)
      val out = base.crossJoin(rep)
        .withColumn(key, col(key) * f + col("rep"))
        .drop("rep")
        // keep source column order so downstream SELECT * shapes match
        .select(base.columns.map(col).toIndexedSeq: _*)
      out.repartition(32)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    inflate("orders", "o_orderkey")
    inflate("lineitem", "l_orderkey")
    Seq("region", "nation", "customer", "supplier", "part",
      "events", "documents", "embeddings").foreach { t =>
      val link = Paths.get(dir, s"$t.parquet")
      val target = Paths.get(srcDir, s"$t.parquet")
      if (!Files.exists(link) && Files.exists(target))
        Files.createSymbolicLink(link, target): Unit
    }
    Files.createFile(Paths.get(dir, "_GRAFT_OK")): Unit
  }
}
