package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: archive-ingest throughput (members extracted + CRC/
  * checksum-verified per second) for the ZIP and .tar.gz walks at
  * ×1/×5/×20 archive counts, local[32] — the BENCH_NOTES codec-row
  * convention. Usage: runMain graft.tools.ArchiveProbe [nBase] */
object ArchiveProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mPerArchive = 20
    Seq(1, 5, 20).foreach { f =>
      val n = nBase * f
      def members(id: Long) = (0 until mPerArchive).map { j =>
        (s"m$j.bin", Array.tabulate[Byte](512)(i =>
          ((id + j * 31 + i * 7) % 251).toByte))
      }
      val t0 = System.nanoTime()
      val zipMembers = spark.range(n.toLong).as[Long].mapPartitions(_.map {
        id =>
          val zip = graft.ops.Multimodal.encodeZip(
            members(id).map { case (nm, d) => (nm, d, id % 2 == 0) })
          graft.ops.Multimodal.decodeZipEntries(id, zip).length.toLong
      }).reduce(_ + _)
      val tZip = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val tarMembers = spark.range(n.toLong).as[Long].mapPartitions(_.map {
        id =>
          val tgz = graft.ops.Multimodal.gzipCompress(
            graft.ops.Multimodal.encodeTar(members(id)))
          graft.ops.Multimodal.decodeTarEntries(id,
            graft.ops.Multimodal.gunzip(tgz)).length.toLong
      }).reduce(_ + _)
      val tTar = (System.nanoTime() - t1) / 1e9
      println(f"[arch] x$f%-2d zip: $zipMembers members in $tZip%6.2f s " +
        f"= ${zipMembers / tZip}%9.0f members/s   targz: $tarMembers in " +
        f"$tTar%6.2f s = ${tarMembers / tTar}%9.0f members/s")
    }
    spark.stop()
  }
}
