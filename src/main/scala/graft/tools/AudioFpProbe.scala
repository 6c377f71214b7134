package graft.tools
object AudioFpProbe {
  def main(args: Array[String]): Unit = {
    var bad = 0
    (0L until 100L).foreach { id =>
      val bands = Array((1 + id % 7).toInt, (9 + id % 5).toInt,
        (16 + id / 5 % 5).toInt, (23 + id / 25 % 4).toInt)
      val amps = Array(0.5, 0.25, 0.12, 0.06)
      val pcm = Array.tabulate(2304) { i =>
        var v = 0.0
        var b = 0
        while (b < 4) {
          v += amps(b) * math.sin(2 * math.Pi * (bands(b) + 0.5) * 750.0 * i / 48000.0)
          b += 1
        }
        math.round(v * 32767).toShort
      }
      val d96 = graft.ops.MpegAudio.decodeMpegAudio(1, graft.ops.MpegAudio.encodeMp2(pcm, 96))
      val d192 = graft.ops.MpegAudio.decodeMpegAudio(2, graft.ops.MpegAudio.encodeMp2(pcm, 192))
      val f96 = graft.ops.MpegAudio.audioFingerprints(d96)
      val f192 = graft.ops.MpegAudio.audioFingerprints(d192)
      if (f96 != f192) {
        bad += 1
        if (bad <= 5) {
          def un(fp: Long) = (0 until 4).map(r => (fp >> (5 * (3 - r))) & 31)
          println(s"[afp] id $id bands ${bands.toSeq}: " +
            f96.zip(f192).map { case ((f, a), (_, b)) =>
              s"f$f ${un(a)} vs ${un(b)}" }.mkString("  "))
        }
      }
    }
    println(s"[afp] mismatched clips: $bad/100")
  }
}
