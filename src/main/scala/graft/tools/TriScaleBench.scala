package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r13 ask #1): tri-decade scaling sweep — time a named
  * query subset at several scale factors in ONE warm JVM and print
  * per-(dir, query) steady-state seconds, for the per-query scaling
  * exponent table in BENCH_NOTES. Protocol per dir: untimed warm pass
  * over the subset (codegen + first-touch I/O), then one timed pass;
  * failures print ERR loudly instead of timing a swallowed exception
  * as ~0 s (the WarmBench behavior this tool exists to avoid).
  *
  * Usage: `runMain graft.tools.TriScaleBench <q1,q2,...|top:N> <dir>...`
  * — `top:N` takes the N most expensive queries from BENCH_FULL.json. */
object TriScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TriScaleBench <queries|top:N> <dir>...")
    val names: Seq[String] =
      if (args(0).startsWith("top:")) {
        val n = args(0).stripPrefix("top:").toInt
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/root/repo/BENCH_FULL.json")), "UTF-8")
        // minimal "name": seconds scrape of the flat queries map
        val re = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
        re.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toSeq
          .filter(kv => graft.SparkEntry.queries.contains(kv._1))
          .sortBy(-_._2).take(n).map(_._1)
      } else args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val sf = dir.split("/").last
      names.foreach { n =>
        try { graft.SparkEntry.queries(n)(spark, dir).count(): Unit }
        catch { case e: Throwable =>
          println(s"[tri] $sf $n WARM-ERR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}")
        }
        spark.catalog.clearCache()
      }
      System.gc()
      names.foreach { n =>
        val t0 = System.nanoTime()
        try {
          val rows = graft.SparkEntry.queries(n)(spark, dir).count()
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[tri] $sf $n%-28s $s%8.2f s  ($rows rows)")
        } catch { case e: Throwable =>
          println(s"[tri] $sf $n ERR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
