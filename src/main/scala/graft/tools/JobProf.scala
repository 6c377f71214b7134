package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: per-JOB wall-clock attribution inside one query.
  * Registers a SparkListener, runs the named SparkEntry queries once
  * (after an untimed warm rep), and prints every Spark job's duration,
  * callsite and description — the instrument for finding which of the
  * dozens of small actions inside an iterative/streaming operator
  * (staging writes, per-batch collects, equality pins) actually carry
  * the wall-clock. Usage: JobProf <sfDir> <q1,q2,...> */
object JobProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("stream_ivf_ingest"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, t0: Long, site: String, desc: String)
    val open = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(J, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        open.put(js.jobId, J(js.jobId, js.time, site, desc)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = open.remove(je.jobId)
        if (j != null) done.add((j, je.time - j.t0)): Unit
      }
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).count() // warm rep, untimed, unprofiled
      spark.catalog.clearCache(); System.gc()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let the listener bus drain
      val js = done.toArray(Array.empty[(J, Long)]).sortBy(_._1.id)
      println(f"[jobprof] ===== $n: $rows rows, $total%.2f s wall, ${js.length} jobs, " +
        f"${js.map(_._2).sum / 1e3}%.2f s in-job =====")
      js.foreach { case (j, ms) =>
        println(f"[jobprof] job${j.id}%4d ${ms / 1e3}%7.3f s  ${j.site}%-40s ${j.desc.take(60)}")
      }
      // rollup by callsite
      js.groupBy(_._1.site).map { case (s, xs) => (s, xs.map(_._2).sum, xs.length) }
        .toSeq.sortBy(-_._2).foreach { case (s, ms, n0) =>
          println(f"[jobprof] SITE ${ms / 1e3}%7.3f s  n=$n0%3d  $s")
        }
      done.clear()
    }
    spark.stop()
  }
}
