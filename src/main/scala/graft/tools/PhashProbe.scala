package graft.tools

import graft.ops.Multimodal

/** Dev probe (no Spark): measure the DCT-pHash Hamming geometry of the
  * requant fixture — each id's raster encoded as JPEG at quant step 4
  * (visually lossless) and step 24 (visibly lossy) — to pick the twin
  * threshold and band count for the x5_phash_requant gate. Prints the
  * max twin distance, the min cross-image distance, and whether every
  * twin pair shares at least one exact 16-bit band (the candidate
  * channel's recall condition). */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 150
    val q2 = if (args.length > 1) args(1).toInt else 16
    val (w, h) = (64, 64)
    def mix(a: Long): Long = {
      var x = a * 0x9E3779B97F4A7C15L
      x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29; x
    }
    def pix(id: Long)(i: Int): Int = {
      val bx = (i % w) / 8; val by = (i / w) / 8
      (math.floorMod(mix(id * 64 + by * 8 + bx), 256)).toInt
    }
    def fp(hsh: graft.ops.Multimodal.ImageHash): Long =
      (hsh.hash_hi << 32) | (hsh.hash_lo & 0xFFFFFFFFL)
    val hashes = (0L until n.toLong).map { id =>
      val hq = Multimodal.dctHashJpeg(2 * id, Multimodal.encodeJpeg(
        w, h, pix(id), Multimodal.uniformQuantTable(4)))
      val lq = Multimodal.dctHashJpeg(2 * id + 1, Multimodal.encodeJpeg(
        w, h, pix(id), Multimodal.uniformQuantTable(q2)))
      (fp(hq), fp(lq))
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def sharesBand(a: Long, b: Long): Boolean = (0 until 4).exists { k =>
      ((a >>> (16 * k)) & 0xFFFF) == ((b >>> (16 * k)) & 0xFFFF)
    }
    val twin = hashes.map { case (a, b) => ham(a, b) }
    println(s"[phash] twin hamming: max ${twin.max} " +
      s"mean ${twin.sum.toDouble / n}%.2f  dist ${
        twin.groupBy(identity).toSeq.sortBy(_._1)
          .map { case (d, xs) => s"$d:${xs.size}" }.mkString(" ")}")
    println(s"[phash] twins sharing >=1 band: ${
      hashes.count { case (a, b) => sharesBand(a, b) }}/$n")
    var minCross = 64
    var bandCross = 0
    val all = hashes.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((a, i), (b, i)) }
    for (i <- all.indices; j <- (i + 1) until all.length
         if all(i)._2 != all(j)._2) {
      val d = ham(all(i)._1, all(j)._1)
      if (d < minCross) minCross = d
      if (sharesBand(all(i)._1, all(j)._1) && d <= 10) bandCross += 1
    }
    println(s"[phash] min cross hamming: $minCross  " +
      s"cross pairs sharing a band at d<=10: $bandCross")
  }
}
