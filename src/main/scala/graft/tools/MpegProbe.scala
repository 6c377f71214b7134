package graft.tools

import graft.ops.MpegAudio

/** Dev probe (no Spark): measure the MPEG-1 Layer I/II round-trip SNR
  * of the computed-prototype filterbank on band-limited test tones and
  * noise, across bitrates, to pick the gate's SNR floor. */
object MpegProbe {
  /** `runMain graft.tools.MpegProbe throughput [n]` — local[32]
    * encode+decode round trips per second (the codec-throughput row
    * convention of BENCH_NOTES), ×1/×5/×20 doc counts. */
  private def throughput(nBase: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(1, 5, 20).foreach { f =>
      val n = nBase * f
      val t0 = System.nanoTime()
      val ok = spark.range(n.toLong).as[Long].mapPartitions(_.map { id =>
        val pcm = Array.tabulate(2304) { i =>
          (math.sin(2 * math.Pi * (300 + id % 50) * i / 48000.0) * 16000).toShort
        }
        val rt = graft.ops.MpegAudio.roundTripStats(id, pcm,
          if (id % 2 == 0) 2 else 1, if (id % 2 == 0) 96 else 128, 20)
        if (rt.snr_ok) 1L else 0L
      }).reduce(_ + _)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[mpeg] throughput x$f%-2d: $n docs (2304 samples each) " +
        f"in $wall%6.2f s = ${n / wall}%8.0f codecs/s  (snr_ok $ok/$n)")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("throughput")) {
      throughput(if (args.length > 1) args(1).toInt else 2000)
      return
    }
    val n = 1152 * 6
    def tone(freqs: Seq[(Double, Double)]): Array[Short] =
      Array.tabulate(n) { i =>
        val v = freqs.map { case (f, a) =>
          a * math.sin(2 * math.Pi * f * i / 48000.0) }.sum
        math.round(v * 32767 * 0.5).toShort
      }
    def noise(seed: Long): Array[Short] = {
      var s = seed
      Array.tabulate(n) { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 40).toShort / 3).toShort
      }
    }
    val signals = Seq(
      "sine440" -> tone(Seq(440.0 -> 1.0)),
      "chord" -> tone(Seq(440.0 -> 0.5, 1320.0 -> 0.3, 3500.0 -> 0.2)),
      "hi7k" -> tone(Seq(7000.0 -> 0.8, 11000.0 -> 0.2)),
      "noise" -> noise(42))
    for ((name, pcm) <- signals; layer <- Seq(1, 2)) {
      val rates = if (layer == 1) Seq(64, 192, 384) else Seq(56, 96, 192)
      for (kbps <- rates) {
        val rt = MpegAudio.roundTripStats(1L, pcm, layer, kbps, 0)
        println(f"[mpeg] $name%-8s L$layer @ $kbps%3d kbps: " +
          f"snr ${rt.snr_db}%3d dB  frames ${rt.n_frames}")
      }
    }
  }
}
