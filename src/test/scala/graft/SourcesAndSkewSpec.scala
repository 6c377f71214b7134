package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** DSv2 paged source (partition planning + pruning) and skew helpers. */
class SourcesAndSkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def paged = spark.read
    .format("graft.sources.PagedRestSource")
    .option("pages", "6").option("pageSize", "50")
    .load()

  test("DSv2 source: pages × pageSize rows, one partition per page") {
    assert(paged.count() == 300)
    assert(paged.rdd.getNumPartitions == 6)
    assert(paged.select(countDistinct(col("page"))).collect().head.getLong(0) == 6)
  }

  test("DSv2 source: pagesPerPartition coalesces page ranges") {
    val df = spark.read.format("graft.sources.PagedRestSource")
      .option("pages", "6").option("pageSize", "10")
      .option("pagesPerPartition", "3").load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 60)
  }

  test("DSv2 source: column pruning reaches the reader") {
    val pruned = paged.select("lms_user_id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("lms_user_id"))
    assert(pruned.distinct().count() == 300)
    // ReadSchema in the scan should not carry the other 4 columns
    val scanLine = pruned.queryExecution.simpleString
    assert(!scanLine.contains("first_name"))
  }

  test("DSv2 source: filter pushdown evaluates at the source, results exact") {
    val f = paged.filter(col("department_id") === "dept_3" && col("lms_user_id") < 100)
    // plan advertises the pushed filters
    assert(f.queryExecution.executedPlan.toString.contains("PushedFilters"))
    val got = f.select("lms_user_id").collect().map(_.getLong(0)).sorted
    val want = (0L until 100L).filter(_ % 7 == 3)
    assert(got.toSeq == want)
  }

  test("DSv2 source: page filter prunes input partitions at planning time") {
    val f = paged.filter(col("page") < 2)
    assert(f.rdd.getNumPartitions == 2) // 6 pages → only 2 planned
    assert(f.count() == 100)
    val eq = paged.filter(col("page") === 4)
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.count() == 50)
    // contradictory bounds plan zero partitions and return nothing
    assert(paged.filter(col("page") > 3 && col("page") < 2).count() == 0)
  }

  test("DSv2 source: deterministic content (same options, same rows)") {
    val a = paged.orderBy("lms_user_id").collect()
    val b = paged.orderBy("lms_user_id").collect()
    assert(a.sameElements(b))
    assert(a.head.getString(1) == "user_0")
  }

  test("heavyHitters == exact GROUP BY HAVING on skewed data") {
    // one hot key (40% of rows), many cold keys
    val rows = Seq.tabulate(500)(i => if (i % 5 < 2) 7L else (100 + i).toLong)
    val df = rows.toDF("k")
    val got = Skew.heavyHitters(df, "k", perMille = 100, counters = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.size
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000 > n.toLong * 100 }.toMap
    assert(got == want)
    assert(got.contains(7L)) // the hot key survives the sketch
  }

  test("MisraGries sketch never misses a key above the guarantee line") {
    // adversarial: distinct cold keys far exceeding the counter budget
    val rows = Seq.fill(300)(1L) ++ (1L to 700L).map(_ + 1000L)
    val df = rows.toDF("k")
    // 1000 rows, k with 300 (30%) must survive 32 counters (n/(k+1) ≈ 30)
    val got = Skew.heavyHitters(df, "k", perMille = 100, counters = 32)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("saltedJoin == plain join result on a skewed key") {
    val fact = Seq.tabulate(200)(i => (if (i % 4 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 199).map(i => s"k$i")).map(k => (k, s"d_$k"))
      .toDF("key", "attr")
    val plain = fact.join(dim, "key").select("key", "v", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "key", 8).select("key", "v", "attr")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("autoSaltedJoin == plain join with and without engaged skew; " +
      "census sizes the salt only when a key exceeds the task budget") {
    // two hot keys over the 50-row budget, a long tail under it
    val fact = (Seq.fill(300)(7L) ++ Seq.fill(120)(13L) ++
      (100L until 400L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val dim = ((Seq(7L, 13L) ++ (100L until 400L)).map(k => (k, s"d_$k")))
      .toDF("key", "attr")
    val plain = fact.join(dim, "key").select("key", "v", "attr")
      .collect().map(_.toSeq).toSet
    val auto = Skew.autoSaltedJoin(fact, dim, "key", targetRowsPerTask = 50L)
      .select("key", "v", "attr").collect().map(_.toSeq).toSet
    assert(auto == plain)
    // no key over the budget → degenerates to the plain join, same rows
    val calm = Skew.autoSaltedJoin(fact, dim, "key",
      targetRowsPerTask = 100000L)
      .select("key", "v", "attr").collect().map(_.toSeq).toSet
    assert(calm == plain)
  }

  test("saltedCount == plain count per key") {
    val df = Seq.fill(500)("hot").map(Tuple1(_)).toDF("key")
      .union(Seq("a", "b", "a").map(Tuple1(_)).toDF("key"))
    val plain = df.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "key", 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
