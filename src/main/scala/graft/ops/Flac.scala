package graft.ops

/** FLAC (Free Lossless Audio Codec — the public xiph.org format spec /
  * RFC 9639) for the multimodal boundary: a real encoder AND decoder
  * for the fixed-predictor subset, 16-bit mono/stereo at a declared
  * sample rate, with all four stereo decorrelation modes, rice-coded
  * residuals, CRC-8 frame-header and CRC-16 frame protection, and the
  * STREAMINFO MD5 of the unencoded audio verified at decode.
  *
  * Because FLAC is LOSSLESS, the gate is the strongest possible oracle:
  * decode(encode(pcm)) must equal pcm BIT-FOR-BIT — no SNR floor, no
  * tolerance. That also makes the codec self-validating in a way the
  * lossy MPEG family cannot be.
  *
  * What is EXACT public-spec structure here: the fLaC marker and
  * metadata-block framing, the 34-byte STREAMINFO layout, frame-header
  * grammar (14-bit sync, blocking strategy, UTF-8-coded frame number,
  * CRC-8 poly x⁸+x²+x+1), subframe type codes (CONSTANT, VERBATIM,
  * FIXED orders 0–4), the binomial fixed predictors (order-k residual =
  * k-th finite difference — definitional), rice residual coding with
  * zigzag mapping and per-partition parameters incl. the escape code,
  * the mid/side / left-side / right-side lossless decorrelations
  * (side = L−R at bps+1 bits), and the frame CRC-16 (poly x¹⁶+x¹⁵+x²+1,
  * init 0). The encoder always emits the SELF-DESCRIBING header forms —
  * explicit end-of-header block size (code 0b0111) and
  * rate/sample-size-from-STREAMINFO (code 0) — so no from-memory code
  * TABLES are load-bearing (the same no-foreign-validator honesty
  * boundary as MpegAudio's Table C.3 note). LPC subframes are REAL in
  * both directions (round 11): Levinson-Durbin coefficient estimation,
  * 12-bit quantization with a power-of-two shift, and exact 64-bit
  * integer prediction at decode — losslessness never depends on
  * coefficient quality. Round 12 lifts the three boundaries that
  * appear in essentially every reference-encoder FLAC: NON-ZERO RICE
  * PARTITION ORDERS (decode: any valid geometry; encode: exact-cost
  * plan over orders 0-6 via one O(15·n) leaf pass + pairwise merges),
  * the RICE ESCAPE CODE (param 0b1111 → 5-bit width, raw signed
  * residuals — both directions, chosen whenever raw beats rice), and
  * WASTED BITS (decode: unary-counted shift restored after
  * reconstruction; encode: shared trailing-zero bits hoisted into the
  * subframe header), plus TABLE-CODED frame headers (block-size codes
  * on both dyadic ladders incl. the reference encoder's default 4096
  * = code 12, sample-rate codes 1–11 and the explicit byte forms
  * 12–14, the 16-bit sample-size code — emitted whenever the value
  * has a code, decoded always, every form cross-checked against
  * STREAMINFO). BIT DEPTHS 8/16/24 are carried end-to-end (round-12
  * extension — 24-bit is the hi-res standard, the most common foreign
  * regime after CD 16-bit): STREAMINFO + table-coded sample sizes
  * (codes 0b001/0b100/0b110), ceil(bps/8)-byte little-endian MD5, side
  * channels at bps+1 up to 25 bits, and with >16-bit in regime the
  * RICE2 method (0b01 — 5-bit parameters 0–30, escape 31) is now
  * carried in BOTH directions: the exact-cost planner prices both
  * methods per block and reference >16-bit encoders emit RICE2, so
  * foreign hi-res intake requires it (at ≤16-bit the 4-bit method
  * keeps winning on cost, which the planner discovers rather than
  * assumes). CHANNELS 1–8 are carried: stereo with all four
  * decorrelation modes chosen by exact coded cost, 3+ (surround
  * layouts) coded independently under channel-assignment code nch−1 —
  * the only multichannel form the format defines. VARIABLE-BLOCKSIZE
  * streams (blocking strategy 1) are carried both directions: the
  * frame header codes the frame's first SAMPLE number in the extended
  * UTF-8 forms (up to 36 bits), STREAMINFO min≠max, and the encoder
  * exercises the grammar with a deterministic alternating schedule.
  * NON-BYTE-ALIGNED DEPTHS 12/20 are carried since r14 (sample-size
  * codes 0b010/0b101; MD5 packs each sample into ceil(bps/8)
  * little-endian signed bytes per RFC 9639 §9.1.1 — the packing rule
  * is shared by this encoder and decoder, so like every
  * self-round-tripped corner here it is pinned to the RFC text, not
  * to a foreign implementation).
  * ROUND 15 closes the last two depth-regime boundaries: 32-BIT DEPTH
  * is carried end-to-end (the codec's internal sample arrays are Long,
  * so the 33-bit side channel and ~2^37 order-4 residuals that
  * overflowed Int compute exactly; sample-size code 0b111, 4-byte LE
  * MD5 packing), and NEGATIVE QLP SHIFTS decode (the 5-bit field is
  * signed two's complement per the pre-RFC format spec; a negative
  * value left-shifts the accumulator — RFC 9639 forbids encoders
  * writing one, and ours never does, but pre-RFC foreign files are
  * met with the historical public semantics rather than a refusal;
  * `encodeFlacForeignLpc` is the fixture writer that pins it).
  *
  * Scale shape: pure per-payload kernels under `mapPartitions`, zero
  * shuffle — 100 TB throughput is cores × per-core frames/s, like the
  * rest of the codec layer.
  */
object Flac {

  // ------------------------------------------------------------------
  // Bit IO (MSB-first)
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(value: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def bitCount: Long = out.size.toLong * 8 + n
    def padToByte(): Unit = if (n > 0) put(0, 8 - n)
    def toBytes: Array[Byte] = { padToByte(); out.toByteArray }
  }

  private final class BitReader(payload: Array[Byte], fromByte: Int) {
    private var pos = fromByte.toLong * 8
    def read(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) {
        val b = (pos >>> 3).toInt
        require(b < payload.length, "flac: bit stream truncated")
        v = (v << 1) | ((payload(b) >>> (7 - (pos & 7).toInt)) & 1)
        pos += 1; i += 1
      }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0L) q += 1
      q
    }
    def readSigned(bits: Int): Int = {
      val v = read(bits)
      ((v << (64 - bits)).toLong >> (64 - bits)).toInt // sign-extend
    }
    // sample-width signed reads: up to 33 bits (32-bit depth's side
    // channel, r15) — must sign-extend in Long
    def readSignedLong(bits: Int): Long = {
      val v = read(bits)
      (v << (64 - bits)) >> (64 - bits)
    }
    def alignToByte(): Unit = { pos = (pos + 7) & ~7L }
    def bytePos: Int = (pos >>> 3).toInt
    def bitInByte: Int = (pos & 7).toInt
  }

  // ------------------------------------------------------------------
  // CRCs (FLAC header CRC-8 poly 0x07 init 0; frame CRC-16 poly 0x8005
  // init 0 — both over whole bytes, MSB-first)
  // ------------------------------------------------------------------

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** UTF-8-style coded number (the frame/sample-number coding — same
    * scheme as UTF-8 but extended to 7-byte forms carrying 36 bits;
    * variable-blocksize streams code the frame's STARTING SAMPLE here,
    * so the full range matters). Byte-count capacities: 7, 11, 16, 21,
    * 26, 31, 36 bits. */
  private val Utf8Caps = Array(7, 11, 16, 21, 26, 31, 36)

  private def writeUtf8Num(bw: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), "flac: coded number out of range")
    if (v < 0x80) { bw.put(v, 8); return }
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(v)
    var k = 1 // continuation-byte count; total bytes = k + 1
    while (Utf8Caps(k) < bits) k += 1
    val lead = (0xFF << (8 - (k + 1))) & 0xFF
    bw.put((lead | (v >>> (6 * k)).toInt).toLong, 8)
    var j = k - 1
    while (j >= 0) { bw.put(0x80L | ((v >>> (6 * j)) & 0x3F), 8); j -= 1 }
  }

  private def readUtf8Num(br: BitReader, docId: Long): Long = {
    val b0 = br.read(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var cont = 0 // continuation bytes: leading ones in b0 minus one
    var mask = 0x40
    while (mask != 0 && (b0 & mask) != 0) { cont += 1; mask >>= 1 }
    require(cont >= 1 && cont <= 6,
      s"flac: malformed coded-number lead byte $b0 (doc $docId)")
    var v = (b0 & (mask - 1)).toLong
    var j = 0
    while (j < cont) {
      val b = br.read(8).toInt
      require((b & 0xC0) == 0x80,
        s"flac: bad coded-number continuation byte (doc $docId)")
      v = (v << 6) | (b & 0x3F)
      j += 1
    }
    v
  }

  // ------------------------------------------------------------------
  // Fixed predictors (binomial finite differences — definitional)
  // ------------------------------------------------------------------

  private val FixedCoef: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // sample arrays are Long end-to-end inside the codec (r15): the
  // 32-bit regime's side channel is 33 bits and its order-4 residuals
  // reach ~2^37 — Int arithmetic overflows exactly where the old
  // named boundary said it would
  private def residual(x: Array[Long], i: Int, order: Int): Long = {
    var r = x(i)
    val c = FixedCoef(order)
    var j = 0
    while (j < order) { r -= c(j).toLong * x(i - 1 - j); j += 1 }
    r
  }

  private def restore(x: Array[Long], i: Int, order: Int, r: Long): Long = {
    var v = r
    val c = FixedCoef(order)
    var j = 0
    while (j < order) { v += c(j).toLong * x(i - 1 - j); j += 1 }
    v
  }

  // ------------------------------------------------------------------
  // Rice coding (zigzag + unary quotient / param-bit remainder; 4-bit
  // parameter, 0b1111 = escape to raw `bps`-bit residuals)
  // ------------------------------------------------------------------

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Two's-complement bit width needed to store the signed residual
    * `r` (0 for r == 0 — the escape's width-0 all-zero partition). */
  private def signedBitsNeeded(r: Long): Int =
    if (r == 0L) 0
    else 65 - java.lang.Long.numberOfLeadingZeros(if (r < 0) ~r else r)

  /** An exact-cost residual-coding plan: coding method (0 = 4-bit rice,
    * 1 = 5-bit RICE2), partition order, per-partition parameter (15 /
    * 31 = the method's escape) and escape width, and the total bit cost
    * INCLUDING the method/order/parameter fields. */
  private final case class RicePlan(method: Int, po: Int, params: Array[Int],
      rawBits: Array[Int], totalBits: Long)

  /** Per-method grammar constants: parameter-field width and the
    * all-ones escape value (RFC 9639 §9.2.7: method 00 → 4-bit
    * parameters, escape 0b1111; method 01 → 5-bit parameters, escape
    * 0b11111). */
  private def riceParamBits(method: Int): Int = if (method == 0) 4 else 5
  private def riceEscape(method: Int): Int = if (method == 0) 15 else 31

  /** Exhaustive-exact rice plan over BOTH coding methods (4-bit rice
    * params 0..14 and RICE2 5-bit params 0..30 — the latter is what
    * reference encoders emit for >16-bit depths, where optimal
    * parameters exceed 14), partition orders 0..6 (bounded by
    * block-size divisibility and a non-empty warm-up partition), every
    * parameter per partition, and the escape code where raw storage
    * beats rice. One O(31·n) pass computes per-leaf cost vectors at the
    * deepest order; coarser orders merge children pairwise (costs add,
    * escape widths max), so the whole sweep costs O(31·n +
    * 31·2^po·po) — the FLAC reference encoder's `-A` style exact
    * search, not the mean heuristic. */
  private def planRice(us: Array[Long], n: Int, order: Int): RicePlan = {
    val MaxP = 30 // RICE2's largest non-escape parameter
    var maxPo = 0
    while (maxPo < 6 && (n & ((1 << (maxPo + 1)) - 1)) == 0 &&
      (n >> (maxPo + 1)) > order) maxPo += 1
    var parts = 1 << maxPo
    var costs = Array.ofDim[Long](parts, MaxP + 1)
    var escW = new Array[Int](parts)
    var counts = new Array[Int](parts)
    var from = 0
    var part = 0
    while (part < parts) {
      val count = (n >> maxPo) - (if (part == 0) order else 0)
      counts(part) = count
      var i = from
      while (i < from + count) {
        val u = us(i)
        var p = 0
        while (p <= MaxP) { costs(part)(p) += (u >>> p) + 1 + p; p += 1 }
        val bb = signedBitsNeeded(unzigzag(u))
        if (bb > escW(part)) escW(part) = bb
        i += 1
      }
      from += count
      part += 1
    }
    var best: RicePlan = null
    var po = maxPo
    while (po >= 0) {
      var method = 0
      while (method <= 1) {
        val pBits = riceParamBits(method)
        val pMax = if (method == 0) 14 else MaxP
        val params = new Array[Int](parts)
        val raw = new Array[Int](parts)
        var total = 2L + 4L
        part = 0
        while (part < parts) {
          var bestP = 0; var bestBits = Long.MaxValue
          var p = 0
          while (p <= pMax) {
            if (costs(part)(p) < bestBits) { bestBits = costs(part)(p); bestP = p }
            p += 1
          }
          // escape raw width is a 5-bit field: a >31-bit residual (only
          // reachable through a pathological LPC predictor) can never
          // escape — rice at pMax still codes it exactly
          val esc = if (escW(part) > 31) Long.MaxValue / 4
            else 5L + counts(part).toLong * escW(part)
          if (esc < bestBits) {
            params(part) = riceEscape(method); raw(part) = escW(part)
            total += pBits + esc
          } else { params(part) = bestP; total += pBits + bestBits }
          part += 1
        }
        if (best == null || total < best.totalBits)
          best = RicePlan(method, po, params, raw, total)
        method += 1
      }
      if (po > 0) {
        val np = parts / 2
        val nCosts = Array.ofDim[Long](np, MaxP + 1)
        val nEsc = new Array[Int](np)
        val nCnt = new Array[Int](np)
        var k = 0
        while (k < np) {
          var p = 0
          while (p <= MaxP) {
            nCosts(k)(p) = costs(2 * k)(p) + costs(2 * k + 1)(p); p += 1
          }
          nEsc(k) = math.max(escW(2 * k), escW(2 * k + 1))
          nCnt(k) = counts(2 * k) + counts(2 * k + 1)
          k += 1
        }
        costs = nCosts; escW = nEsc; counts = nCnt; parts = np
      }
      po -= 1
    }
    best
  }

  // ------------------------------------------------------------------
  // LPC (quantized-coefficient linear prediction — the subframe type
  // that makes FLAC FLAC). Coefficients estimated by Levinson-Durbin
  // on the block's autocorrelation (doubles, deterministic), then
  // quantized to `LpcPrecision`-bit integers with a power-of-two shift;
  // prediction itself is EXACT integer arithmetic (64-bit accumulator,
  // arithmetic right shift), so the round trip is lossless regardless
  // of coefficient quality — quality only buys compression.
  // ------------------------------------------------------------------

  private val LpcPrecision = 15
  private val LpcOrder = 8

  /** Quantized LPC predictor for a block, or None when LPC is not
    * applicable (degenerate autocorrelation, unstable recursion, or
    * coefficients too large for the shift range). The autocorrelation
    * is estimated on a WELCH-WINDOWED copy of the block (the standard
    * apodization step — the rectangular window's edge truncation biases
    * lag correlations of near-unit-correlation signals enough to ruin
    * the predictor; measured meanAbsRes 33 unwindowed vs 0.7 windowed
    * on a two-tone fixture); prediction itself always runs on the RAW
    * integers. */
  private[graft] def lpcQuantized(x: Array[Long],
      order: Int): Option[(Array[Int], Int)] = {
    val n = x.length
    if (n <= order * 2) return None
    val w = new Array[Double](n)
    var i0 = 0
    while (i0 < n) {
      val t = (2.0 * i0 - (n - 1)) / (n - 1)
      w(i0) = x(i0) * (1.0 - t * t)
      i0 += 1
    }
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0; var i = lag
      while (i < n) { s += w(i) * w(i - lag); i += 1 }
      ac(lag) = s; lag += 1
    }
    if (ac(0) <= 0.0) return None
    // Levinson-Durbin, truncating gracefully when the prediction error
    // collapses — an EXACTLY predictable block (pure sines: 2 poles per
    // tone) drives e → 0 before the requested order, and the
    // already-found coefficients are the perfect predictor
    val a = new Array[Double](order + 1)
    var e = ac(0)
    var usable = 0
    var best: Array[Double] = null
    var m = 1
    var stop = false
    while (m <= order && !stop) {
      var acc = ac(m)
      var j = 1
      while (j < m) { acc -= a(j) * ac(m - j); j += 1 }
      val k = acc / e
      if (k.isNaN || k.isInfinite || math.abs(k) >= 1.0) stop = true
      else {
        val prev = a.clone()
        a(m) = k
        j = 1
        while (j < m) { a(j) = prev(j) - k * prev(m - j); j += 1 }
        e *= (1 - k * k)
        usable = m; best = a.clone()
        if (e <= ac(0) * 1e-12) stop = true
        m += 1
      }
    }
    if (usable == 0) return None
    val coefs = Array.tabulate(usable)(j => best(j + 1))
    val cmax = coefs.map(math.abs).max
    if (cmax == 0.0 || cmax.isNaN || cmax.isInfinite) return None
    var shift = LpcPrecision - 1 - (math.getExponent(cmax) + 1)
    if (shift > 15) shift = 15
    if (shift < 0) return None
    val lim = 1 << (LpcPrecision - 1)
    val q = coefs.map(c => math.max(-lim,
      math.min(lim - 1, math.round(c * (1L << shift)).toInt)))
    if (q.forall(_ == 0)) None else Some((q, shift))
  }

  /** Exact integer LPC prediction of x[i] from the preceding `order`
    * samples: (Σ q[j]·x[i−1−j]) >> shift, 64-bit accumulator. A
    * NEGATIVE shift (r15) left-shifts the accumulator — the 5-bit
    * wire field is signed two's complement per the original format
    * spec, and the historical public decoder semantics for a negative
    * value are `sum << −shift`; RFC 9639 forbids ENCODERS from
    * writing one (ours never does), but pre-RFC files exist. */
  private[graft] def lpcPredict(x: Array[Long], i: Int, q: Array[Int],
      shift: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < q.length) { acc += q(j).toLong * x(i - 1 - j); j += 1 }
    if (shift >= 0) acc >> shift else acc << -shift
  }

  // ------------------------------------------------------------------
  // Subframe encode/decode
  // ------------------------------------------------------------------

  private def writeRice(bw: BitWriter, us: Array[Long], n: Int, order: Int,
      plan: RicePlan): Unit = {
    bw.put(plan.method.toLong, 2) // 00 = 4-bit rice, 01 = 5-bit RICE2
    bw.put(plan.po.toLong, 4)
    val pBits = riceParamBits(plan.method)
    val escape = riceEscape(plan.method)
    var from = 0
    var part = 0
    while (part < (1 << plan.po)) {
      val count = (n >> plan.po) - (if (part == 0) order else 0)
      val p = plan.params(part)
      bw.put(p.toLong, pBits)
      if (p == escape) { // escape: raw signed residuals
        val w = plan.rawBits(part)
        bw.put(w.toLong, 5)
        var i = from
        while (i < from + count) {
          if (w > 0) bw.put(unzigzag(us(i)) & ((1L << w) - 1), w)
          i += 1
        }
      } else {
        var i = from
        while (i < from + count) {
          bw.putUnary((us(i) >>> p).toInt)
          if (p > 0) bw.put(us(i) & ((1L << p) - 1), p)
          i += 1
        }
      }
      from += count
      part += 1
    }
  }

  private def writeSubframe(bw: BitWriter, x0: Array[Long], bps0: Int): Unit = {
    val n = x0.length
    // CONSTANT?
    if (x0.forall(_ == x0(0))) {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1) // pad/type=CONSTANT/wasted
      bw.put(x0(0) & ((1L << bps0) - 1), bps0)
      return
    }
    // wasted bits (r11 ask #2): trailing zero bits shared by EVERY
    // sample in the block (upsampled / bit-shifted sources) come off
    // once in the subframe header instead of rice-coding them n times
    var wasted = Integer.MAX_VALUE
    var i0 = 0
    while (i0 < n && wasted > 0) {
      if (x0(i0) != 0L)
        wasted = math.min(wasted,
          java.lang.Long.numberOfTrailingZeros(x0(i0)))
      i0 += 1
    }
    if (wasted >= bps0) wasted = bps0 - 1 // all-zero is CONSTANT above
    val (x, bps) =
      if (wasted > 0) (x0.map(_ >> wasted), bps0 - wasted) else (x0, bps0)
    def header(tpe: Int): Unit = {
      bw.put(0, 1); bw.put(tpe.toLong, 6)
      if (wasted > 0) { bw.put(1, 1); bw.putUnary(wasted - 1) }
      else bw.put(0, 1)
    }
    // best fixed order by exact planned rice cost (incl. warm-up)
    var bestOrder = 0; var bestBits = Long.MaxValue
    var bestPlan: RicePlan = null; var bestUs: Array[Long] = null
    var order = 0
    while (order <= 4 && order < n) {
      val us = new Array[Long](n - order)
      var i = order
      while (i < n) { us(i - order) = zigzag(residual(x, i, order)); i += 1 }
      val plan = planRice(us, n, order)
      val total = order.toLong * bps + plan.totalBits
      if (total < bestBits) {
        bestBits = total; bestOrder = order; bestPlan = plan; bestUs = us
      }
      order += 1
    }
    // LPC candidate (order 8, exact planned rice cost incl. header extras)
    val lpc = lpcQuantized(x, math.min(LpcOrder, math.max(1, n / 2 - 1)))
      .flatMap { case (q, shift) =>
        val order2 = q.length
        val us = new Array[Long](n - order2)
        var i = order2
        while (i < n) {
          us(i - order2) = zigzag(x(i) - lpcPredict(x, i, q, shift))
          i += 1
        }
        val plan = planRice(us, n, order2)
        val total = order2.toLong * bps + 4 + 5 +
          order2.toLong * LpcPrecision + plan.totalBits
        if (total < bestBits) Some((q, shift, plan, us)) else None
      }
    lpc match {
      case Some((q, shift, plan, us)) =>
        val order2 = q.length
        header(0x20 | (order2 - 1)) // LPC
        var i = 0
        while (i < order2) {
          bw.put(x(i) & ((1L << bps) - 1), bps); i += 1
        }
        bw.put(LpcPrecision.toLong - 1, 4)
        bw.put(shift.toLong, 5)
        q.foreach(c => bw.put(c.toLong & ((1L << LpcPrecision) - 1),
          LpcPrecision))
        writeRice(bw, us, n, order2, plan)
      case None if bestBits >= n.toLong * bps =>
        header(1) // VERBATIM
        var i = 0
        while (i < n) { bw.put(x(i) & ((1L << bps) - 1), bps); i += 1 }
      case None =>
        header(8 | bestOrder) // FIXED|order
        var i = 0
        while (i < bestOrder) {
          bw.put(x(i) & ((1L << bps) - 1), bps); i += 1
        }
        writeRice(bw, bestUs, n, bestOrder, bestPlan)
    }
  }

  /** Per-subframe decode census: type code, wasted-bit count, rice
    * partition order (0 for CONSTANT/VERBATIM), escape-code presence,
    * and the residual coding method (0 = 4-bit rice, 1 = RICE2; 0 for
    * CONSTANT/VERBATIM which carry no residual section). */
  final case class SubframeInfo(tpe: Int, wasted: Int, partitionOrder: Int,
      escaped: Boolean, riceMethod: Int)

  private def readSubframe(br: BitReader, n: Int, bps: Int,
      docId: Long): (Array[Long], SubframeInfo) = {
    require(br.read(1) == 0L, s"flac: subframe sync padding bit set (doc $docId)")
    val tpe = br.read(6).toInt
    // wasted bits (r11 ask #2): flag 1 → unary count follows (k−1 zeros
    // then a 1 = k wasted bits); the subframe body codes x >> k at
    // bps − k and every reconstructed sample shifts back left by k
    val wasted = if (br.read(1) == 1L) br.readUnary() + 1 else 0
    require(wasted < bps,
      s"flac: wasted bits $wasted >= sample size $bps (doc $docId)")
    val sbps = bps - wasted
    val x = new Array[Long](n)
    var poEsc = (0, false, 0)
    if (tpe == 0) { // CONSTANT
      val v = br.readSignedLong(sbps)
      java.util.Arrays.fill(x, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < n) { x(i) = br.readSignedLong(sbps); i += 1 }
    } else if ((tpe & 0x38) == 8 && (tpe & 7) <= 4) { // FIXED, order 0-4
      val order = tpe & 7
      var i = 0
      while (i < order) { x(i) = br.readSignedLong(sbps); i += 1 }
      poEsc = readRiceInto(br, x, n, order, docId)(
        (xs, i2, u) => restore(xs, i2, order, u))
    } else if ((tpe & 0x20) != 0) { // LPC, order 1-32
      val order = (tpe & 0x1F) + 1
      require(order < n,
        s"flac: LPC order $order >= block size $n (doc $docId)")
      var i = 0
      while (i < order) { x(i) = br.readSignedLong(sbps); i += 1 }
      val precM1 = br.read(4).toInt
      require(precM1 != 15, s"flac: invalid qlp precision (doc $docId)")
      val precision = precM1 + 1
      // 5-bit SIGNED two's complement per the original format spec
      // (r15): values ≥ 16 decode as the negative left-shift form —
      // RFC 9639 forbids writing them, pre-RFC files may carry them
      val shiftRaw = br.read(5).toInt
      val shift = if (shiftRaw >= 16) shiftRaw - 32 else shiftRaw
      val q = Array.fill(order)(br.readSigned(precision))
      poEsc = readRiceInto(br, x, n, order, docId)(
        (xs, i2, u) => lpcPredict(xs, i2, q, shift) + u)
    } else throw new IllegalArgumentException(
      s"flac: reserved subframe type $tpe (doc $docId)")
    if (wasted > 0) {
      var i = 0
      while (i < n) { x(i) = x(i) << wasted; i += 1 }
    }
    (x, SubframeInfo(tpe, wasted, poEsc._1, poEsc._2, poEsc._3))
  }

  /** Shared rice-residual reader: fills x[order..n) via `rebuild`
    * (which sees the signed residual value). Carries the FULL rice
    * grammar in BOTH methods (r11 ask #2 + the round-12 depth lift):
    * method 00 (4-bit parameters, escape 0b1111) and method 01 (RICE2,
    * 5-bit parameters, escape 0b11111 — what reference encoders emit
    * for >16-bit depths); any partition order whose geometry is valid
    * (n divisible by 2^po, first partition non-empty after the
    * predictor warm-up — partitions 1.. hold n/2^po residuals, partition
    * 0 holds n/2^po − order), per-partition parameters, and the escape
    * code (method's all-ones param → 5-bit width, residuals stored as
    * raw signed two's complement, NOT zigzagged; width 0 means
    * all-zero). */
  private def readRiceInto(br: BitReader, x: Array[Long], n: Int,
      order: Int, docId: Long)(
      rebuild: (Array[Long], Int, Long) => Long): (Int, Boolean, Int) = {
    val method = br.read(2).toInt
    require(method == 0 || method == 1,
      s"flac: reserved residual method $method (doc $docId)")
    val pBits = riceParamBits(method)
    val escape = riceEscape(method)
    val po = br.read(4).toInt
    require((n & ((1 << po) - 1)) == 0,
      s"flac: block size $n not divisible into 2^$po partitions (doc $docId)")
    require((n >> po) > order,
      s"flac: first rice partition empty (po=$po order=$order n=$n; doc $docId)")
    var escaped = false
    var i = order
    var part = 0
    while (part < (1 << po)) {
      val count = (n >> po) - (if (part == 0) order else 0)
      val p = br.read(pBits).toInt
      if (p == escape) { // escape: raw signed residuals at an explicit width
        escaped = true
        val rawBits = br.read(5).toInt
        var j = 0
        while (j < count) {
          val r = if (rawBits == 0) 0L else br.readSignedLong(rawBits)
          x(i) = rebuild(x, i, r)
          i += 1; j += 1
        }
      } else {
        var j = 0
        while (j < count) {
          val quo = br.readUnary().toLong
          val u = (quo << p) | (if (p > 0) br.read(p) else 0L)
          x(i) = rebuild(x, i, unzigzag(u))
          i += 1; j += 1
        }
      }
      part += 1
    }
    (po, escaped, method)
  }

  // ------------------------------------------------------------------
  // Stereo decorrelation (lossless integer transforms)
  // ------------------------------------------------------------------

  /** Channel-assignment codes: 0 mono-style independent (per channel),
    * 1 = 2-channel independent, 8 left/side, 9 right/side, 10 mid/side
    * (the spec's 4-bit field values; 2-channel independent is 0b0001 =
    * channels−1). */
  private def decorrelate(l: Array[Long], r: Array[Long],
      mode: Int): (Array[Long], Array[Long]) = mode match {
    case 1 => (l, r)
    case 8 => (l, Array.tabulate(l.length)(i => l(i) - r(i))) // left/side
    case 9 => (Array.tabulate(l.length)(i => l(i) - r(i)), r) // right(=ch1)/side? see recorrelate
    case 10 =>
      val mid = Array.tabulate(l.length)(i => (l(i) + r(i)) >> 1)
      val side = Array.tabulate(l.length)(i => l(i) - r(i))
      (mid, side)
    case m => throw new IllegalArgumentException(s"flac: bad mode $m")
  }

  private def recorrelate(a: Array[Long], b: Array[Long],
      mode: Int): (Array[Long], Array[Long]) = mode match {
    case 1 => (a, b)
    case 8 => (a, Array.tabulate(a.length)(i => a(i) - b(i))) // L, L-side
    case 9 => (Array.tabulate(a.length)(i => a(i) + b(i)), b) // side+R, R
    case 10 =>
      val l = new Array[Long](a.length); val r = new Array[Long](a.length)
      var i = 0
      while (i < a.length) {
        val mid2 = (a(i) << 1) | (b(i) & 1L)
        l(i) = (mid2 + b(i)) >> 1
        r(i) = (mid2 - b(i)) >> 1
        i += 1
      }
      (l, r)
    case m => throw new IllegalArgumentException(s"flac: bad mode $m")
  }

  // ------------------------------------------------------------------
  // Stream encode
  // ------------------------------------------------------------------

  /** Carried bit depths — ALL of RFC 9639's: the MD5 sample packing
    * is ceil(bps/8) little-endian signed bytes per sample (§9.1.1 —
    * the non-byte-aligned depths 12/20 pad each sample to the
    * smallest whole byte count, r14). 32-bit carried since r15: the
    * codec's sample arrays are Long end-to-end, so the 33-bit side
    * channel and the ~2^37 order-4 residuals that overflowed Int (the
    * old named boundary) compute exactly. */
  private val CarriedDepths = Set(8, 12, 16, 20, 24, 32)

  /** MD5 of the unencoded audio (channel-interleaved little-endian
    * samples at ceil(bps/8) bytes each, the RFC 9639 §9.1.5 packing —
    * the STREAMINFO integrity field, verified at decode). */
  private def audioMd5(channels: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = (bps + 7) / 8
    val n = channels(0).length
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels.length) {
        val v = channels(ch)(i)
        var b = 0
        while (b < bytes) { md.update(((v >> (8 * b)) & 0xFF).toByte); b += 1 }
        ch += 1
      }
      i += 1
    }
    md.digest()
  }

  /** Encode PCM channels (1–8, equal length, any RFC 9639 depth
    * 8/12/16/20/24/32) as a FLAC
    * stream: fLaC marker + STREAMINFO (with real MD5) + optional
    * metadata blocks + fixed-blocksize frames. Stereo frames pick the
    * cheapest of the four decorrelation modes by exact coded size; 3+
    * channels (surround layouts) code independently under
    * channel-assignment code nch−1, the only multichannel form the
    * format defines.
    *
    * Metadata (round 12, session 2 — what real crawl FLACs carry):
    * `tags` emits a VORBIS_COMMENT block (type 4 — LITTLE-endian
    * lengths per the Vorbis spec, unlike everything else in FLAC;
    * KEY=value UTF-8 comments + `vendor`); `withSeekTable` emits a
    * SEEKTABLE (type 3) with one REAL seekpoint per frame (first
    * sample, byte offset relative to the first frame, frame samples);
    * `metaPadding` > 0 emits a PADDING block (type 1). */
  def encodeFlac(channels: Array[Array[Int]], sampleRate: Int,
      blockSize: Int = 1024, bps: Int = 16,
      variableBlocks: Boolean = false,
      tags: Seq[(String, String)] = Nil, vendor: String = "graft",
      withSeekTable: Boolean = false, metaPadding: Int = 0): Array[Byte] = {
    require(channels.length >= 1 && channels.length <= 8,
      "flac: 1-8 channels (3-bit STREAMINFO field)")
    require(channels.map(_.length).distinct.length == 1,
      "flac: channels must be equal length")
    require(blockSize >= 16 && blockSize <= 65535, "flac: bad block size")
    // STREAMINFO's sample-rate field is 20 bits: a larger value would be
    // silently bit-masked by BitWriter.put into a structurally valid
    // stream with the WRONG declared rate (advisor r11)
    require(sampleRate > 0 && sampleRate < (1 << 20),
      "flac: sample rate out of STREAMINFO range")
    require(CarriedDepths(bps),
      s"flac: bit depth $bps not carried (8/12/16/20/24/32)")
    // bounds in Long: (1 << 31) wraps negative in Int at bps = 32
    val lo = -(1L << (bps - 1)); val hi = (1L << (bps - 1)) - 1
    channels.foreach(_.foreach(v =>
      require(v >= lo && v <= hi, s"flac: sample out of $bps-bit range")))
    val total = channels(0).length
    require(total > 0, "flac: empty input")
    // block schedule: fixed streams repeat blockSize; variable streams
    // (blocking strategy 1) alternate blockSize and blockSize/2 — a
    // deterministic schedule that exercises the strategy's grammar
    // (per-frame sizes, sample-number header coding, min≠max
    // STREAMINFO) without inventing a rate-control heuristic
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    locally {
      var off = 0; var i = 0
      while (off < total) {
        val want = if (!variableBlocks || i % 2 == 0) blockSize
          else math.max(16, blockSize / 2)
        sizes += math.min(want, total - off)
        off += sizes.last; i += 1
      }
    }
    // STREAMINFO min/max block size exclude the possibly-shorter last
    // frame (the spec's stated exception) unless it is the only frame
    val bodySizes = if (sizes.length > 1) sizes.init else sizes
    // encode the frames FIRST so seekpoints carry REAL byte offsets
    val frameRegion = new java.io.ByteArrayOutputStream()
    val seekPts = Seq.newBuilder[(Long, Long, Int)] // (sample, off, n)
    var frame = 0
    var off = 0
    while (off < total) {
      val n = sizes(frame)
      val chunk: Array[Array[Long]] = channels.map(c =>
        Array.tabulate(n)(i => c(off + i).toLong))
      val codedNo = if (variableBlocks) off.toLong else frame.toLong
      seekPts += ((off.toLong, frameRegion.size.toLong, n))
      frameRegion.write(encodeFrame(chunk, codedNo, n, sampleRate, bps,
        variableBlocks))
      frame += 1; off += n
    }
    // metadata blocks after STREAMINFO, each (type, body)
    val blocks = Seq.newBuilder[(Int, Array[Byte])]
    if (withSeekTable) {
      val b = new java.io.ByteArrayOutputStream()
      seekPts.result().foreach { case (sample, foff, n) =>
        Seq(sample, foff).foreach { v =>
          var s = 56
          while (s >= 0) { b.write(((v >>> s) & 0xFF).toInt); s -= 8 }
        }
        b.write((n >> 8) & 0xFF); b.write(n & 0xFF)
      }
      blocks += ((3, b.toByteArray))
    }
    if (tags.nonEmpty) {
      val b = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
        b.write((v >> 16) & 0xFF); b.write((v >> 24) & 0xFF)
      }
      def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")
      val vb = utf8(vendor)
      le32(vb.length); b.write(vb)
      le32(tags.length)
      tags.foreach { case (k, v) =>
        require(k.nonEmpty && k.forall(c => c >= 0x20 && c <= 0x7D && c != '='),
          s"flac: invalid vorbis comment key $k")
        val cb = utf8(s"$k=$v")
        le32(cb.length); b.write(cb)
      }
      blocks += ((4, b.toByteArray))
    }
    if (metaPadding > 0) blocks += ((1, new Array[Byte](metaPadding)))
    val metaBlocks = blocks.result()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'))
    // STREAMINFO: last-block flag (when nothing follows) + type 0 + 34
    val si = new BitWriter
    si.put(if (metaBlocks.isEmpty) 1 else 0, 1); si.put(0, 7); si.put(34, 24)
    si.put(bodySizes.min.toLong, 16); si.put(bodySizes.max.toLong, 16)
    si.put(0, 24); si.put(0, 24) // min/max frame size: 0 = unknown
    si.put(sampleRate.toLong, 20)
    si.put(channels.length.toLong - 1, 3)
    si.put(bps.toLong - 1, 5)
    si.put(total.toLong, 36)
    val siBytes = si.toBytes
    out.write(siBytes)
    out.write(audioMd5(channels, bps))
    metaBlocks.zipWithIndex.foreach { case ((tpe, body), i) =>
      require(body.length < (1 << 24), "flac: metadata block too large")
      val last = i == metaBlocks.length - 1
      out.write((if (last) 0x80 else 0) | tpe)
      out.write((body.length >> 16) & 0xFF)
      out.write((body.length >> 8) & 0xFF)
      out.write(body.length & 0xFF)
      out.write(body)
    }
    frameRegion.writeTo(out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Metadata-block intake (round 12, session 2)
  // ------------------------------------------------------------------

  case class FlacSeekPoint(sample: Long, offset: Long, nSamples: Int)

  /** Parsed metadata of a FLAC stream: Vorbis comments (vendor +
    * KEY=value tags, keys canonicalised UPPER per the case-insensitive
    * spec), real seekpoints (placeholders sample=2^64−1 skipped),
    * padding byte total, and the raw block-type sequence. */
  case class FlacMeta(vendor: String, tags: Seq[(String, String)],
      seekPoints: Seq[FlacSeekPoint], paddingBytes: Int,
      blockTypes: Seq[Int])

  def readFlacMeta(payload: Array[Byte], docId: Long): FlacMeta = {
    require(payload.length > 42 && payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C', s"flac: no fLaC marker (doc $docId)")
    var vendor = ""
    val tags = Seq.newBuilder[(String, String)]
    val seeks = Seq.newBuilder[FlacSeekPoint]
    var padding = 0
    val types = Seq.newBuilder[Int]
    var off = 4
    var last = false
    while (!last) {
      val hdr = payload(off) & 0xFF
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7F
      val len = ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      require(off + 4 + len <= payload.length,
        s"flac: metadata block overruns payload (doc $docId)")
      types += tpe
      val body = off + 4
      tpe match {
        case 1 => padding += len
        case 3 =>
          require(len % 18 == 0,
            s"flac: seektable length $len not a multiple of 18 (doc $docId)")
          var p = body
          while (p < body + len) {
            def be64(at: Int): Long = {
              var v = 0L; var i = 0
              while (i < 8) { v = (v << 8) | (payload(at + i) & 0xFFL); i += 1 }
              v
            }
            val sample = be64(p)
            if (sample != -1L) // 0xFFFF... = placeholder point
              seeks += FlacSeekPoint(sample, be64(p + 8),
                ((payload(p + 16) & 0xFF) << 8) | (payload(p + 17) & 0xFF))
            p += 18
          }
        case 4 =>
          var p = body
          def le32(): Int = {
            require(p + 4 <= body + len,
              s"flac: vorbis length field overruns block (doc $docId)")
            val v = (payload(p) & 0xFF) | ((payload(p + 1) & 0xFF) << 8) |
              ((payload(p + 2) & 0xFF) << 16) | ((payload(p + 3) & 0xFF) << 24)
            p += 4; v
          }
          val vlen = le32()
          require(vlen >= 0 && p + vlen <= body + len,
            s"flac: vorbis vendor overruns block (doc $docId)")
          vendor = new String(payload, p, vlen, "UTF-8"); p += vlen
          val n = le32()
          require(n >= 0,
            s"flac: negative vorbis comment count (doc $docId)")
          var i = 0
          while (i < n) {
            val clen = le32()
            require(clen >= 0 && p + clen <= body + len,
              s"flac: vorbis comment overruns block (doc $docId)")
            val c = new String(payload, p, clen, "UTF-8"); p += clen
            val eq = c.indexOf('=')
            require(eq > 0, s"flac: vorbis comment without '=' (doc $docId)")
            tags += ((c.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
              c.substring(eq + 1)))
            i += 1
          }
        case _ => ()
      }
      off += 4 + len
    }
    FlacMeta(vendor, tags.result(), seeks.result(), padding, types.result())
  }

  /** Frame-header code tables (RFC 9639 §9.1 — tiny, replicated
    * verbatim across public decoders, structurally checkable: the
    * block-size codes are exact powers scattered on two dyadic ladders,
    * the rate codes name standard audio rates; same transcription bar
    * as MpegAudio's sfb tables). Reference encoders emit these on
    * essentially every file (flac's default 4096 block = code 12), so
    * foreign intake must read them; this encoder emits them whenever
    * the value has a code and falls back to the self-describing
    * explicit forms otherwise. */
  private val BlockSizeCodes: Map[Int, Int] = Map(
    192 -> 1, 576 -> 2, 1152 -> 3, 2304 -> 4, 4608 -> 5,
    256 -> 8, 512 -> 9, 1024 -> 10, 2048 -> 11, 4096 -> 12,
    8192 -> 13, 16384 -> 14, 32768 -> 15)
  private val SampleRateCodes: Map[Int, Int] = Map(
    88200 -> 1, 176400 -> 2, 192000 -> 3, 8000 -> 4, 16000 -> 5,
    22050 -> 6, 24000 -> 7, 32000 -> 8, 44100 -> 9, 48000 -> 10,
    96000 -> 11)
  locally {
    BlockSizeCodes.foreach { case (bs, c) => // dyadic-ladder self-check
      assert(if (c >= 8) bs == 256 << (c - 8)
             else if (c >= 2) bs == 576 << (c - 2) else bs == 192)
    }
  }

  /** Frame-header sample-size codes for ALL the spec's depths
    * (RFC 9639 §9.1.4: 0b001 = 8, 0b010 = 12, 0b100 = 16, 0b101 = 20,
    * 0b110 = 24, 0b111 = 32 — the last carried since r15). */
  private val SampleSizeCodes: Map[Int, Int] =
    Map(8 -> 1, 12 -> 2, 16 -> 4, 20 -> 5, 24 -> 6, 32 -> 7)

  private def encodeFrame(chunk: Array[Array[Long]], codedNo: Long,
      n: Int, sampleRate: Int, bps: Int, varBlocks: Boolean): Array[Byte] = {
    // pick channel assignment by exact coded subframe size (stereo);
    // mono and 3+ channels have exactly one form — independent coding
    // at code channels−1
    val candidates: Seq[(Int, Array[(Array[Long], Int)])] =
      if (chunk.length != 2)
        Seq((chunk.length - 1, chunk.map(c => (c, bps))))
      else Seq(1, 8, 9, 10).map { mode =>
        val (a, b) = decorrelate(chunk(0), chunk(1), mode)
        val bits: Array[(Array[Long], Int)] = mode match {
          case 1 => Array((a, bps), (b, bps))
          case 8 => Array((a, bps), (b, bps + 1))
          case 9 => Array((a, bps + 1), (b, bps))
          case 10 => Array((a, bps), (b, bps + 1))
        }
        (mode, bits)
      }
    val coded = candidates.map { case (mode, subs) =>
      val bw = new BitWriter
      subs.foreach { case (x, bps) => writeSubframe(bw, x, bps) }
      (mode, bw.toBytes, bw.bitCount)
    }
    val (mode, bodyBytes, _) = coded.minBy(_._3)
    // header: table codes when the value has one (what reference
    // encoders emit), self-describing explicit forms otherwise
    val bsCode = BlockSizeCodes.get(n)
    val srCode = SampleRateCodes.get(sampleRate)
    val hw = new BitWriter
    hw.put(0x3FFE, 14) // sync
    hw.put(0, 1) // reserved
    hw.put(if (varBlocks) 1 else 0, 1) // blocking strategy
    hw.put(bsCode.getOrElse(7).toLong, 4)
    hw.put(srCode.getOrElse(0).toLong, 4)
    hw.put(mode.toLong, 4) // channel assignment
    hw.put(SampleSizeCodes(bps).toLong, 3) // table-coded sample size
    hw.put(0, 1) // reserved
    writeUtf8Num(hw, codedNo) // frame no (fixed) / first sample (variable)
    if (bsCode.isEmpty) hw.put(n.toLong - 1, 16)
    val headBytes = hw.toBytes
    val frameOut = new java.io.ByteArrayOutputStream()
    frameOut.write(headBytes)
    frameOut.write(crc8(headBytes, 0, headBytes.length))
    // subframes were written CONTIGUOUSLY in bit space into one writer
    // per candidate mode (padding only at the very end), so the chosen
    // candidate's bytes ARE the frame body — no re-encode
    frameOut.write(bodyBytes)
    val body = frameOut.toByteArray
    val crc = crc16(body, 0, body.length)
    frameOut.write(crc >> 8); frameOut.write(crc & 0xFF)
    frameOut.toByteArray
  }

  /** FOREIGN-SHAPE fixture writer (r15): a single-frame mono stream
    * whose one subframe is LPC with CALLER-SUPPLIED quantized
    * coefficients and shift — including a NEGATIVE shift, coded in
    * the 5-bit two's-complement field the pre-RFC format spec
    * defines. The production encoder never emits a negative shift
    * (RFC 9639 forbids writing one); this writer exists so the
    * decoder's handling of such pre-RFC foreign files is pinned
    * against planted content, residuals computed with the SAME
    * negative-left-shift prediction the decoder restores with. */
  private[graft] def encodeFlacForeignLpc(x: Array[Int], sampleRate: Int,
      bps: Int, q: Array[Int], shift: Int,
      precision: Int = LpcPrecision): Array[Byte] = {
    val n = x.length
    require(n >= 16 && n <= 65535, "flac: bad foreign block size")
    require(shift >= -16 && shift <= 15,
      "flac: shift outside the signed 5-bit field")
    require(q.nonEmpty && q.length <= 32 && q.length < n,
      "flac: bad foreign LPC order")
    val order = q.length
    val xl = x.map(_.toLong)
    val us = new Array[Long](n - order)
    var i = order
    while (i < n) {
      us(i - order) = zigzag(xl(i) - lpcPredict(xl, i, q, shift)); i += 1
    }
    val plan = planRice(us, n, order)
    val bw = new BitWriter
    bw.put(0, 1); bw.put((0x20 | (order - 1)).toLong, 6); bw.put(0, 1)
    var w = 0
    while (w < order) { bw.put(xl(w) & ((1L << bps) - 1), bps); w += 1 }
    bw.put(precision.toLong - 1, 4)
    bw.put((shift & 0x1F).toLong, 5) // two's complement on the wire
    q.foreach(c => bw.put(c.toLong & ((1L << precision) - 1), precision))
    writeRice(bw, us, n, order, plan)
    val bodyBytes = bw.toBytes
    // frame header: fixed-blocksize, explicit end-of-header block
    // size, rate and sample size from the self-describing forms
    val hw = new BitWriter
    hw.put(0x3FFE, 14); hw.put(0, 1); hw.put(0, 1)
    hw.put(7, 4) // block size: 16-bit at end of header
    hw.put(0, 4) // rate: STREAMINFO
    hw.put(0, 4) // mono
    hw.put(SampleSizeCodes(bps).toLong, 3)
    hw.put(0, 1)
    writeUtf8Num(hw, 0L)
    hw.put(n.toLong - 1, 16)
    val headBytes = hw.toBytes
    val frameOut = new java.io.ByteArrayOutputStream()
    frameOut.write(headBytes)
    frameOut.write(crc8(headBytes, 0, headBytes.length))
    frameOut.write(bodyBytes)
    val body = frameOut.toByteArray
    val crc = crc16(body, 0, body.length)
    frameOut.write(crc >> 8); frameOut.write(crc & 0xFF)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'))
    val si = new BitWriter
    si.put(1, 1); si.put(0, 7); si.put(34, 24)
    si.put(n.toLong, 16); si.put(n.toLong, 16)
    si.put(0, 24); si.put(0, 24)
    si.put(sampleRate.toLong, 20)
    si.put(0, 3) // mono
    si.put(bps.toLong - 1, 5)
    si.put(n.toLong, 36)
    out.write(si.toBytes)
    out.write(audioMd5(Array(x), bps))
    frameOut.writeTo(out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Stream decode
  // ------------------------------------------------------------------

  case class FlacStreamInfo(blockSize: Int, minBlock: Int, sampleRate: Int,
      channels: Int, bitsPerSample: Int, totalSamples: Long,
      md5: Array[Byte], firstFrameOff: Int)

  def readStreamInfo(payload: Array[Byte], docId: Long): FlacStreamInfo = {
    require(payload.length > 42 && payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C', s"flac: no fLaC marker (doc $docId)")
    var off = 4
    var si: FlacStreamInfo = null
    var last = false
    while (!last) {
      val hdr = payload(off) & 0xFF
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7F
      val len = ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      if (tpe == 0) {
        require(len == 34, s"flac: bad STREAMINFO length $len (doc $docId)")
        val br = new BitReader(payload, off + 4)
        val minB = br.read(16).toInt; val maxB = br.read(16).toInt
        require(minB >= 16 && minB <= maxB,
          s"flac: invalid STREAMINFO block sizes $minB/$maxB (doc $docId)")
        br.read(24); br.read(24)
        val rate = br.read(20).toInt
        val nch = br.read(3).toInt + 1
        val bps = br.read(5).toInt + 1
        require(CarriedDepths(bps),
          s"flac: $bps-bit depth is not defined by RFC 9639 " +
            s"(8/12/16/20/24/32 carried; doc $docId)")
        val tot = br.read(36)
        val md5 = java.util.Arrays.copyOfRange(payload, off + 4 + 18,
          off + 4 + 34)
        si = FlacStreamInfo(maxB, minB, rate, nch, bps, tot, md5, -1)
      }
      off += 4 + len
    }
    require(si != null, s"flac: STREAMINFO block missing (doc $docId)")
    si.copy(firstFrameOff = off)
  }

  case class FlacFrameInfo(frame_id: Int, n_samples: Int, channel_mode: Int,
      byte_off: Long, frame_bytes: Int, subframe_types: Seq[Int],
      wasted_bits: Seq[Int], partition_orders: Seq[Int],
      rice_escaped: Seq[Boolean], rice_methods: Seq[Int])

  /** Decode a full stream: STREAMINFO + every frame (CRC-8 and CRC-16
    * verified, MD5 of the reconstructed audio checked against
    * STREAMINFO) → (per-frame census, channels). */
  def decodeFlac(docId: Long,
      payload: Array[Byte]): (Seq[FlacFrameInfo], Array[Array[Int]]) = {
    val si = readStreamInfo(payload, docId)
    val channels = Array.fill(si.channels)(new Array[Int](si.totalSamples.toInt))
    val infos = Seq.newBuilder[FlacFrameInfo]
    var off = si.firstFrameOff
    var outBase = 0
    var frame = 0
    var streamStrategy = -1 // pinned by the first frame; mixing is invalid
    while (outBase < si.totalSamples) {
      val br = new BitReader(payload, off)
      require(br.read(14) == 0x3FFE,
        s"flac: lost frame sync at byte $off (doc $docId)")
      require(br.read(1) == 0, s"flac: reserved bit set (doc $docId)")
      val strategy = br.read(1).toInt // 0 fixed / 1 variable blocksize
      if (streamStrategy < 0) streamStrategy = strategy
      else require(strategy == streamStrategy,
        s"flac: mixed blocking strategies in one stream (doc $docId)")
      val bsCode = br.read(4).toInt
      require(bsCode != 0, s"flac: reserved block-size code 0 (doc $docId)")
      val srCode = br.read(4).toInt
      require(srCode != 15, s"flac: invalid sample-rate code 15 (doc $docId)")
      val mode = br.read(4).toInt
      // 0-7 = mode+1 independent channels (mono through 7.1 surround);
      // 8/9/10 = the stereo decorrelations; 11-15 reserved by the spec
      require(mode <= 10,
        s"flac: reserved channel assignment $mode (doc $docId)")
      val nchFrame = if (mode <= 7) mode + 1 else 2
      require(nchFrame == si.channels,
        s"flac: frame/STREAMINFO channel mismatch (doc $docId)")
      val ssCode = br.read(3).toInt
      // table-coded sample sizes (0 = from STREAMINFO; 1/2/4/5/6/7 =
      // 8/12/16/20/24/32-bit — the whole §9.1.4 table since r15;
      // code 3 is the table's one reserved value)
      val frameBps = ssCode match {
        case 0 => si.bitsPerSample
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case c => throw new IllegalArgumentException(
          s"flac: reserved sample-size code $c (doc $docId)")
      }
      require(frameBps == si.bitsPerSample,
        s"flac: frame sample size $frameBps != STREAMINFO " +
          s"${si.bitsPerSample} (doc $docId)")
      require(br.read(1) == 0, s"flac: reserved bit set (doc $docId)")
      val fno = readUtf8Num(br, docId)
      if (strategy == 0)
        require(fno == frame, s"flac: frame number $fno != $frame (doc $docId)")
      else // variable blocksize codes the frame's FIRST SAMPLE number
        require(fno == outBase,
          s"flac: frame sample number $fno != $outBase (doc $docId)")
      // table-coded block sizes (round 12): the two dyadic ladders
      // reference encoders emit (flac's default 4096 block = code 12),
      // plus the self-describing 8/16-bit end-of-header forms
      val n = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.read(8).toInt + 1
        case 7 => br.read(16).toInt + 1
        case c => 256 << (c - 8)
      }
      // explicit sample-rate byte forms (codes 12-14) follow the block
      // size bytes; table codes 1-11 carry the rate in the code itself.
      // Every form must AGREE with STREAMINFO (fixed-rate streams).
      val frameRate = srCode match {
        case 0 => si.sampleRate
        case 12 => br.read(8).toInt * 1000
        case 13 => br.read(16).toInt
        case 14 => br.read(16).toInt * 10
        case c => Seq(88200, 176400, 192000, 8000, 16000, 22050, 24000,
          32000, 44100, 48000, 96000)(c - 1)
      }
      require(frameRate == si.sampleRate,
        s"flac: frame sample rate $frameRate != STREAMINFO " +
          s"${si.sampleRate} (doc $docId)")
      require(outBase + n <= si.totalSamples,
        s"flac: frame block size $n overruns the declared sample count " +
          s"(doc $docId)")
      val crc8At = br.bytePos
      val wantCrc8 = br.read(8).toInt
      require(crc8(payload, off, crc8At) == wantCrc8,
        f"flac: frame-header CRC-8 mismatch (doc $docId)")
      val bps = si.bitsPerSample
      val subsT: Array[(Array[Long], SubframeInfo)] = mode match {
        case m if m <= 7 =>
          Array.fill(m + 1)(readSubframe(br, n, bps, docId))
        case 8 => Array(readSubframe(br, n, bps, docId),
          readSubframe(br, n, bps + 1, docId))
        case 9 => Array(readSubframe(br, n, bps + 1, docId),
          readSubframe(br, n, bps, docId))
        case 10 => Array(readSubframe(br, n, bps, docId),
          readSubframe(br, n, bps + 1, docId))
      }
      val subs = subsT.map(_._1)
      br.alignToByte()
      val crcAt = br.bytePos
      // truncated-at-CRC stream must fail as a NAMED decode error, not
      // AIOOBE — the sniff/census paths classify on IAE (advisor r11)
      require(crcAt + 2 <= payload.length,
        s"flac: bit stream truncated (doc $docId)")
      val wantCrc16 = ((payload(crcAt) & 0xFF) << 8) | (payload(crcAt + 1) & 0xFF)
      require(crc16(payload, off, crcAt) == wantCrc16,
        f"flac: frame CRC-16 mismatch (doc $docId)")
      val frameBytes = crcAt + 2 - off
      val rec: Array[Array[Long]] =
        if (mode <= 7) subs
        else { val (l, r) = recorrelate(subs(0), subs(1), mode); Array(l, r) }
      val rlo = -(1L << (bps - 1)); val rhi = (1L << (bps - 1)) - 1
      var ch = 0
      while (ch < si.channels) {
        val rc = rec(ch)
        var k = 0
        while (k < n) {
          val v = rc(k)
          require(v >= rlo && v <= rhi,
            s"flac: decoded sample out of $bps-bit range (doc $docId)")
          channels(ch)(outBase + k) = v.toInt // ≤ 32 bits proven above
          k += 1
        }
        ch += 1
      }
      infos += FlacFrameInfo(frame, n, mode, off.toLong, frameBytes,
        subsT.map(_._2.tpe).toSeq, subsT.map(_._2.wasted).toSeq,
        subsT.map(_._2.partitionOrder).toSeq,
        subsT.map(_._2.escaped).toSeq,
        subsT.map(_._2.riceMethod).toSeq)
      outBase += n; off += frameBytes; frame += 1
    }
    require(java.util.Arrays.equals(audioMd5(channels, si.bitsPerSample), si.md5),
      s"flac: STREAMINFO MD5 mismatch — lossless contract violated (doc $docId)")
    (infos.result(), channels)
  }
}
