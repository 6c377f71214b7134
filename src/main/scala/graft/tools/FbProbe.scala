package graft.tools

/** Dev probe: pure filterbank cascade (no quantization) via reflection
  * on MpegAudio's private kernels re-implemented inline — finds the
  * true cascade delay and SNR by scanning alignments. */
object FbProbe {
  def main(args: Array[String]): Unit = {
    val proto: Array[Double] = {
      // root-raised-cosine, rolloff 1, T = 64, centered at 255.5
      val T = 64.0
      val h = Array.tabulate(512) { n =>
        val t = n - 255.5
        val x = 4.0 * t / T
        (4.0 / (math.Pi * T)) * math.cos(2 * math.Pi * t / T) / (1.0 - x * x)
      }
      val sum = h.sum; h.map(_ / sum)
    }
    val mod = Array.tabulate(32, 128)((k, n) => math.cos((2 * k + 1) * (n - 16) * math.Pi / 64))
    val syn = Array.tabulate(32, 128)((k, n) => math.cos((2 * k + 1) * (n + 16) * math.Pi / 64))
    val N = 8192
    val x = { var st = 42L
      Array.tabulate(N) { _ =>
        st = st * 6364136223846793005L + 1442695040888963407L
        (st >>> 40).toDouble / (1L << 23) - 1.0
      } }
    val xp = new Array[Double](N + 512)
    System.arraycopy(x, 0, xp, 512, N)
    val acc = new Array[Double](N + 2048)
    var t = 0
    while (32 * t + 31 < N) {
      // analysis: S[k] = sum_n proto[n] mod[k][n%128] xp[512+32t+31-n]
      val s = new Array[Double](32)
      var k = 0
      while (k < 32) {
        var a = 0.0; var n = 0
        while (n < 512) { a += proto(n) * mod(k)(n & 127) * xp(512 + 32 * t + 31 - n); n += 1 }
        s(k) = a; k += 1
      }
      // synthesis: acc[32t+n] += 32 proto[n] sum_k s[k] syn[k][n%128]
      val g = new Array[Double](128)
      var n = 0
      while (n < 128) {
        var a = 0.0; k = 0
        while (k < 32) { a += s(k) * syn(k)(n); k += 1 }
        g(n) = a; n += 1
      }
      n = 0
      while (n < 512) { acc(32 * t + n) += 32.0 * proto(n) * g(n & 127); n += 1 }
      t += 1
    }
    // scan delays
    var bestD = -1; var bestSnr = -999.0; var bestGain = 0.0
    for (d <- 0 until 1024) {
      var sxy = 0.0; var sxx = 0.0; var syy = 0.0
      var i = 1024
      while (i < N - 1024) {
        val a = x(i); val b = acc(i + d)
        sxy += a * b; sxx += a * a; syy += b * b
        i += 1
      }
      if (sxx > 0 && syy > 0) {
        val gain = sxy / sxx
        var err = 0.0; var sig = 0.0
        i = 1024
        while (i < N - 1024) {
          val e = acc(i + d) / gain - x(i); err += e * e; sig += x(i) * x(i)
          i += 1
        }
        val snr = 10 * math.log10(sig / math.max(err, 1e-30))
        if (snr > bestSnr) { bestSnr = snr; bestD = d; bestGain = gain }
      }
    }
    println(f"[fb] best delay $bestD  snr $bestSnr%.1f dB  gain $bestGain%.6f")
    for (d <- 478 to 483) {
      var sxy = 0.0; var sxx = 0.0
      var i = 1024
      while (i < N - 1024) { sxy += x(i) * acc(i + d); sxx += x(i) * x(i); i += 1 }
      val gain = sxy / sxx
      var err = 0.0; var sig = 0.0
      i = 1024
      while (i < N - 1024) {
        val e = acc(i + d) / gain - x(i); err += e * e; sig += x(i) * x(i); i += 1
      }
      println(f"[fb] d=$d snr ${10 * math.log10(sig / math.max(err, 1e-30))}%.1f dB gain $gain%.5f")
    }
  }
}
