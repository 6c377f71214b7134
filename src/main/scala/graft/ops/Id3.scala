package graft.ops

/** ID3 tag intake (the id3.org informal standards: ID3v1/v1.1 and
  * ID3v2.3/v2.4) — the metadata wrappers around essentially every
  * real-crawl MP3. `walkFrames` deliberately requires audio frames to
  * tile the payload; this layer finds the AUDIO SPAN inside a tagged
  * file (ID3v2 prefix via the syncsafe tag size, ID3v1 128-byte "TAG"
  * suffix) and extracts the text metadata a corpus-intake pipeline
  * keeps (title/artist/album/...).
  *
  * Carried exactly per the public documents:
  *   - ID3v2 header: "ID3", major (2, 3 or 4), revision, flags (v2.4
  *     footer bit 0x10 honored: +10 trailing bytes; unsynchronisation
  *     bit 0x80 honored in BOTH schemes: v2.2/v2.3 reverse the whole
  *     body's 0xFF 0x00 escapes before the frame walk, v2.4 §6.1
  *     restores each frame individually — per-frame format flag 0x02,
  *     STORED frame sizes, optional §4.1.2 data length indicator
  *     verified against the restored length), 28-bit SYNCSAFE size
  *     (4 bytes, high bit of each clear) counting everything after
  *     the 10-byte header (excluding the footer).
  *   - Text frames: v2.2 = 3-char id ("TT2") + 3-byte size, no flags;
  *     v2.3/v2.4 = 4-char id ("TIT2") + size (v2.3: plain 32-bit
  *     big-endian; v2.4: syncsafe) + 2 flag bytes. Body = encoding
  *     byte + text. Encodings carried: 0 = ISO-8859-1, 1 = UTF-16 with
  *     BOM (both endiannesses), 2 = UTF-16BE without BOM (v2.4-only),
  *     3 = UTF-8 (v2.4). Trailing NUL terminators are stripped.
  *     Non-text frames are skipped by size.
  *   - Extended headers (flag 0x40, r14): both layouts parsed and
  *     validated — v2.3 §3.2 (size excluding its 4 size bytes, 2-byte
  *     flags, padding size, CRC-32 over frames-sans-padding VERIFIED)
  *     and v2.4 §3.2 (syncsafe size including itself, length-prefixed
  *     flag data, 35-bit syncsafe CRC over frames+padding VERIFIED;
  *     update/restrictions flags validated and consumed). v2.2
  *     compression stays the named boundary (never fully specified).
  *   - ID3v1: final 128 bytes, "TAG" + 30 title + 30 artist +
  *     30 album + 4 year + 30 comment (v1.1: comment[28] == 0 makes
  *     comment[29] the track) + genre. Fields are NUL/space-trimmed
  *     ISO-8859-1.
  *
  * Scale shape: pure per-payload kernels — like the rest of the codec
  * layer, 100 TB intake throughput is cores × payloads/s, no shuffle.
  */
object Id3 {

  // ------------------------------------------------------------------
  // Syncsafe integers (7 bits per byte, high bit clear)
  // ------------------------------------------------------------------

  private[graft] def syncsafe(v: Int): Array[Byte] = {
    require(v >= 0 && v < (1 << 28), "id3: syncsafe size out of range")
    Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)
  }

  private def readSyncsafe(p: Array[Byte], off: Int, docId: Long): Int = {
    var v = 0
    var i = 0
    while (i < 4) {
      val b = p(off + i) & 0xFF
      require((b & 0x80) == 0, s"id3: non-syncsafe size byte (doc $docId)")
      v = (v << 7) | b
      i += 1
    }
    v
  }

  private def readBe32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  // ------------------------------------------------------------------
  // ID3v2 encode (fixture/metadata writer)
  // ------------------------------------------------------------------

  /** Encode an ID3v2 tag holding text frames. `major` 2, 3 or 4 (2.2
    * uses 3-char frame ids and 3-byte sizes); text encoding is
    * UTF-16-with-BOM when `utf16` (legal in all versions), ISO-8859-1
    * otherwise (non-latin1 chars require utf16). `padding` appends NUL
    * bytes inside the tag (players rewrite tags in place through
    * padding — intake must skip it). `unsync` applies the version's
    * own unsynchronisation scheme (keeping false MPEG syncwords out of
    * the tag): v2.2/v2.3 escape 0xFF → 0xFF 0x00 over the WHOLE body
    * behind header flag 0x80; v2.4 (§6.1) escapes each frame body
    * individually behind its per-frame format flag 0x02, with the
    * frame size counting the STORED (post-unsync) bytes — header flag
    * 0x80 is set too since every frame here is unsynchronised.
    * `withDli` (v2.4-unsync only) prefixes each frame body with the
    * §4.1.2 data length indicator (syncsafe original length, flag
    * 0x01), the way writers record the restored size. */
  def encodeId3v2(textFrames: Seq[(String, String)], major: Int = 3,
      utf16: Boolean = false, padding: Int = 0,
      withFooter: Boolean = false,
      binaryFrames: Seq[(String, Array[Byte])] = Nil,
      unsync: Boolean = false, withDli: Boolean = false,
      utf16be: Boolean = false,
      withExtHeader: Boolean = false): Array[Byte] = {
    require(major >= 2 && major <= 4, "id3: v2.2/v2.3/v2.4 only")
    require(!withFooter || major == 4, "id3: footer is v2.4-only")
    require(padding >= 0, "id3: negative padding")
    require(!withFooter || padding == 0,
      "id3: a footered tag must not have padding (v2.4 §3.4)")
    require(!withDli || (unsync && major == 4),
      "id3: the data length indicator fixture is the v2.4 unsync form")
    require(!utf16be || major == 4,
      "id3: encoding 2 (UTF-16BE without BOM) is v2.4-only")
    require(!(utf16 && utf16be), "id3: pick one UTF-16 form")
    require(!withExtHeader || major >= 3,
      "id3: the extended header is v2.3/v2.4-only")
    val perFrameUnsync = unsync && major == 4
    val idLen = if (major == 2) 3 else 4
    val body = new java.io.ByteArrayOutputStream()
    def writeFrame(id: String, raw: Array[Byte]): Unit = {
      val stored =
        if (perFrameUnsync && withDli) syncsafe(raw.length) ++ applyUnsync(raw)
        else if (perFrameUnsync) applyUnsync(raw)
        else raw
      val size = stored.length
      body.write(id.getBytes("ISO-8859-1"))
      if (major == 2) body.write(Array(((size >> 16) & 0xFF).toByte,
        ((size >> 8) & 0xFF).toByte, (size & 0xFF).toByte))
      else if (major == 4) body.write(syncsafe(size))
      else body.write(Array(((size >> 24) & 0xFF).toByte,
        ((size >> 16) & 0xFF).toByte, ((size >> 8) & 0xFF).toByte,
        (size & 0xFF).toByte))
      if (major != 2) { // frame status + format flags
        body.write(0)
        body.write(if (perFrameUnsync) 0x02 | (if (withDli) 1 else 0)
          else 0)
      }
      body.write(stored, 0, stored.length)
    }
    // non-text frames (APIC/PIC pictures, GEOB blobs, ...) — intake
    // skips them by size; fixtures use them to exercise that skip
    binaryFrames.foreach { case (id, bytes) =>
      require(id.length == idLen && id.head != 'T' &&
        id.forall(c => c.isUpper || c.isDigit),
        s"id3: binary frame id must be non-text $idLen-char, got $id")
      writeFrame(id, bytes)
    }
    textFrames.foreach { case (id, text) =>
      require(id.length == idLen && id.head == 'T' &&
        id.forall(c => c.isUpper || c.isDigit),
        s"id3: text frame id must be T-prefixed $idLen-char, got $id")
      if (!utf16 && !utf16be) require(text.forall(_ < 256),
        "id3: non-latin1 text needs utf16 = true")
      val enc: Array[Byte] =
        if (utf16) Array(0xFF.toByte, 0xFE.toByte) ++ // BOM, little-endian
          text.flatMap(c => Seq((c & 0xFF).toByte, ((c >> 8) & 0xFF).toByte))
        else if (utf16be) // encoding 2: big-endian code units, NO BOM
          text.flatMap(c =>
            Seq(((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)).toArray
        else text.map(_.toByte).toArray
      val encByte = if (utf16) 1 else if (utf16be) 2 else 0
      writeFrame(id, encByte.toByte +: enc)
    }
    (0 until padding).foreach(_ => body.write(0))
    def be32b(v: Long): Array[Byte] = Array(((v >>> 24) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
      (v & 0xFF).toByte)
    val framesRaw = body.toByteArray // frames + padding, pre tag-unsync
    // extended header, written with its CRC so the parse-side
    // verification is exercised: v2.3 sizes it excluding the 4 size
    // bytes (10 with CRC) and its CRC covers frames WITHOUT padding;
    // v2.4 sizes it syncsafe including itself (12 with CRC), the CRC
    // is a 35-bit syncsafe value covering frames AND padding
    val withExt: Array[Byte] =
      if (!withExtHeader) framesRaw
      else if (major == 3) {
        val crc = new java.util.zip.CRC32
        crc.update(framesRaw, 0, framesRaw.length - padding)
        be32b(10L) ++ Array(0x80.toByte, 0.toByte) ++
          be32b(padding.toLong) ++ be32b(crc.getValue) ++ framesRaw
      } else {
        val crc = new java.util.zip.CRC32
        crc.update(framesRaw)
        val v = crc.getValue
        val crc35 = Array.tabulate(5)(i =>
          ((v >>> (7 * (4 - i))) & 0x7F).toByte)
        syncsafe(12) ++ Array(1.toByte, 0x20.toByte, 5.toByte) ++
          crc35 ++ framesRaw
      }
    val frames = if (unsync && major < 4) applyUnsync(withExt)
      else withExt
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("ISO-8859-1"))
    out.write(major); out.write(0)
    out.write((if (withFooter) 0x10 else 0) | (if (unsync) 0x80 else 0) |
      (if (withExtHeader) 0x40 else 0))
    out.write(syncsafe(frames.length))
    out.write(frames)
    if (withFooter) {
      out.write("3DI".getBytes("ISO-8859-1"))
      out.write(major); out.write(0) // footer flags mirror the header's
      out.write(0x10 | (if (unsync) 0x80 else 0) |
        (if (withExtHeader) 0x40 else 0))
      out.write(syncsafe(frames.length))
    }
    out.toByteArray
  }

  /** Encode an ID3v1.1 tag (the fixed 128-byte trailer). */
  def encodeId3v1(title: String, artist: String, album: String,
      year: String, comment: String, track: Int, genre: Int): Array[Byte] = {
    require(track >= 0 && track < 256 && genre >= 0 && genre < 256,
      "id3: v1 track/genre are bytes")
    require(year.length <= 4 && comment.length <= 28 &&
      Seq(title, artist, album).forall(_.length <= 30),
      "id3: v1 field overflow")
    val out = new Array[Byte](128)
    def put(s: String, off: Int, len: Int): Unit =
      s.getBytes("ISO-8859-1").take(len).copyToArray(out, off)
    put("TAG", 0, 3)
    put(title, 3, 30); put(artist, 33, 30); put(album, 63, 30)
    put(year, 93, 4); put(comment, 97, 28)
    out(125) = 0 // v1.1 marker: comment[28] == 0 → track follows
    out(126) = track.toByte
    out(127) = genre.toByte
    out
  }

  // ------------------------------------------------------------------
  // Parse
  // ------------------------------------------------------------------

  case class Id3v2Info(major: Int, tagBytes: Int, hasFooter: Boolean,
      unsync: Boolean, textFrames: Seq[(String, String)],
      nSkippedFrames: Int, hasExtHeader: Boolean = false)

  case class Id3v1Info(title: String, artist: String, album: String,
      year: String, track: Int, genre: Int)

  /** Reverse the unsynchronisation scheme: every 0xFF 0x00 pair in the
    * tag body collapses back to 0xFF (the 0x00 was inserted at write
    * time so no false MPEG syncword appears inside the tag). */
  private def deUnsync(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (i < body.length) {
      out.write(body(i))
      if ((body(i) & 0xFF) == 0xFF && i + 1 < body.length &&
        body(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  private[graft] def applyUnsync(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 16)
    body.foreach { b =>
      out.write(b)
      if ((b & 0xFF) == 0xFF) out.write(0)
    }
    out.toByteArray
  }

  /** Parse an ID3v2 tag at offset 0, or None when no "ID3" magic.
    * Versions 2.2 (3-char ids, 3-byte sizes), 2.3 and 2.4 are carried,
    * as are BOTH unsynchronisation schemes: tag-level flag 0x80 on
    * v2.2/v2.3 (whole-body reversal before the frame walk) and the
    * v2.4 per-frame form (format flag 0x02 with stored sizes, the
    * header flag read as "all frames unsynchronised", and the data
    * length indicator restored and VERIFIED when flag 0x01 is set).
    * `tagBytes` is the FULL prefix length to skip (header + body +
    * footer when present). */
  def parseId3v2(payload: Array[Byte], docId: Long): Option[Id3v2Info] = {
    if (payload.length < 10 || payload(0) != 'I' || payload(1) != 'D' ||
      payload(2) != '3') return None
    val major = payload(3) & 0xFF
    require(major >= 2 && major <= 4,
      s"id3: v2.$major is a named boundary (v2.2/v2.3/v2.4 carried; doc $docId)")
    val flags = payload(5) & 0xFF
    if (major == 2) require((flags & 0x40) == 0,
      s"id3: v2.2 compression is a named boundary (doc $docId)")
    val hasExt = major >= 3 && (flags & 0x40) != 0
    val unsync = (flags & 0x80) != 0
    val hasFooter = major == 4 && (flags & 0x10) != 0
    val size = readSyncsafe(payload, 6, docId)
    val tagBytes = 10 + size + (if (hasFooter) 10 else 0)
    require(tagBytes <= payload.length,
      s"id3: tag size $size overruns payload (doc $docId)")
    val rawBody = java.util.Arrays.copyOfRange(payload, 10, 10 + size)
    // tag-level (v2.2/v2.3) unsynchronisation: whole-body reversal
    // before the frame walk. v2.4 moved the scheme per-frame (§6.1:
    // frame sizes count the STORED bytes, each frame carries format
    // flag 0x02; the header flag there only asserts that ALL frames
    // are unsynchronised), so for v2.4 the body walks as stored and
    // each frame's data is restored individually below.
    val body = if (unsync && major < 4) deUnsync(rawBody) else rawBody
    val idLen = if (major == 2) 3 else 4
    val headLen = if (major == 2) 6 else 10
    // extended header (header flag 0x40): parsed, validated, and its
    // CRC-32 — when carried — VERIFIED, not skipped blind. The two
    // specs differ: v2.3 §3.2 sizes it EXCLUDING the 4 size bytes
    // (6 or 10), carries a 2-byte flag word (bit15 = CRC) + a 4-byte
    // padding size, and its CRC covers frames only (padding excluded);
    // v2.4 §3.2 sizes it syncsafe INCLUDING itself, carries
    // one flag byte (0x40 update / 0x20 CRC / 0x10 restrictions) with
    // per-flag length-prefixed data, a 35-bit syncsafe CRC, and covers
    // frames AND padding (everything between ext header and footer).
    var extSkip = 0
    if (hasExt && major == 3) {
      require(body.length >= 10,
        s"id3: extended header overruns tag (doc $docId)")
      val extSize = readBe32(body, 0).toInt
      require(extSize == 6 || extSize == 10,
        s"id3: v2.3 extended header size must be 6 or 10, got $extSize (doc $docId)")
      val extFlags = ((body(4) & 0xFF) << 8) | (body(5) & 0xFF)
      require((extFlags & 0x7FFF) == 0,
        s"id3: v2.3 extended flags 0x${extFlags.toHexString} are a named boundary (doc $docId)")
      val hasCrc = (extFlags & 0x8000) != 0
      require(hasCrc == (extSize == 10),
        s"id3: v2.3 extended header CRC flag/size mismatch (doc $docId)")
      val padSize = readBe32(body, 6).toInt
      extSkip = 4 + extSize
      require(padSize >= 0 && extSkip + padSize <= body.length,
        s"id3: v2.3 extended-header padding size overruns tag (doc $docId)")
      if (hasCrc) {
        val crc = new java.util.zip.CRC32
        crc.update(body, extSkip, body.length - extSkip - padSize)
        require(crc.getValue == readBe32(body, 10),
          s"id3: v2.3 extended-header CRC mismatch (doc $docId)")
      }
    } else if (hasExt) { // v2.4
      require(body.length >= 6,
        s"id3: extended header overruns tag (doc $docId)")
      val extSize = readSyncsafe(body, 0, docId)
      require(extSize >= 6 && extSize <= body.length,
        s"id3: v2.4 extended header size $extSize overruns tag (doc $docId)")
      require((body(4) & 0xFF) == 1,
        s"id3: v2.4 extended header must carry one flag byte (doc $docId)")
      val ef = body(5) & 0xFF
      require((ef & 0x8F) == 0,
        s"id3: v2.4 extended flags 0x${ef.toHexString} are a named boundary (doc $docId)")
      var at = 6
      def flagData(expectLen: Int, what: String): Int = {
        require(at < extSize && (body(at) & 0xFF) == expectLen,
          s"id3: v2.4 extended $what data length must be $expectLen (doc $docId)")
        val v = at + 1; at += 1 + expectLen
        require(at <= extSize,
          s"id3: v2.4 extended $what data overruns header (doc $docId)")
        v
      }
      if ((ef & 0x40) != 0) flagData(0, "tag-is-update"): Unit
      if ((ef & 0x20) != 0) {
        val c = flagData(5, "CRC")
        var crcVal = 0L
        (0 until 5).foreach { i =>
          val b = body(c + i) & 0xFF
          require((b & 0x80) == 0,
            s"id3: non-syncsafe CRC byte (doc $docId)")
          crcVal = (crcVal << 7) | b
        }
        val crc = new java.util.zip.CRC32
        crc.update(body, extSize, body.length - extSize)
        require(crc.getValue == crcVal,
          s"id3: v2.4 extended-header CRC mismatch (doc $docId)")
      }
      if ((ef & 0x10) != 0) flagData(1, "restrictions"): Unit
      require(at == extSize,
        s"id3: v2.4 extended header has trailing bytes (doc $docId)")
      extSkip = extSize
    }
    val texts = Seq.newBuilder[(String, String)]
    var skipped = 0
    var off = extSkip
    val end = body.length
    var inPadding = false
    while (off + headLen <= end && !inPadding) {
      if (body(off) == 0) inPadding = true // NUL id byte = padding
      else {
        val id = new String(body, off, idLen, "ISO-8859-1")
        require(id.forall(c => c.isUpper || c.isDigit),
          s"id3: malformed frame id at $off (doc $docId)")
        val fsize = major match {
          case 2 => ((body(off + 3) & 0xFF) << 16) |
            ((body(off + 4) & 0xFF) << 8) | (body(off + 5) & 0xFF)
          case 3 => readBe32(body, off + 4).toInt
          case _ => readSyncsafe(body, off + 4, docId)
        }
        require(fsize >= 0 && off + headLen + fsize <= end,
          s"id3: frame $id overruns tag (doc $docId)")
        // format flags that change the body layout beyond what this
        // intake restores (compression, encryption, grouping) are
        // named boundaries — parsing through them silently would
        // yield garbage text. v2.4 per-frame unsynchronisation (0x02)
        // and the data length indicator (0x01) ARE restored (§6.1,
        // §4.1.2); v2.3 has no per-frame unsync bit.
        if (major == 3) require((body(off + 9) & 0xE0) == 0,
          s"id3: v2.3 frame format flags are a named boundary (doc $docId)")
        if (major == 4) require((body(off + 9) & 0x4C) == 0,
          s"id3: v2.4 frame format flags are a named boundary (doc $docId)")
        // v2.4: de-unsync is governed SOLELY by the per-frame 0x02 flag
        // (§4.1.2) — the tag header's 0x80 is only the aggregate
        // assertion "all frames are unsynchronised" (§6.1), never a
        // command to de-unsync a frame whose own flag is clear. Trusting
        // the header flag would silently corrupt a non-unsync frame that
        // legitimately contains FF 00 (e.g. UTF-16LE 'ÿ') (r15).
        val frameUnsync = major == 4 && (body(off + 9) & 0x02) != 0
        val hasDli = major == 4 && (body(off + 9) & 0x01) != 0
        if (id.head == 'T' && fsize >= 1) {
          var data = java.util.Arrays.copyOfRange(body, off + headLen,
            off + headLen + fsize)
          if (hasDli) {
            require(data.length >= 4,
              s"id3: frame $id too short for its data length indicator (doc $docId)")
            val orig = readSyncsafe(data, 0, docId)
            data = java.util.Arrays.copyOfRange(data, 4, data.length)
            if (frameUnsync) data = deUnsync(data)
            require(data.length == orig,
              s"id3: frame $id data length indicator mismatch: " +
                s"$orig declared, ${data.length} restored (doc $docId)")
          } else if (frameUnsync) data = deUnsync(data)
          require(data.length >= 1,
            s"id3: frame $id has no encoding byte (doc $docId)")
          val enc = data(0) & 0xFF
          val raw = java.util.Arrays.copyOfRange(data, 1, data.length)
          val text = enc match {
            case 0 => new String(raw, "ISO-8859-1")
            case 1 =>
              require(raw.length >= 2 && (raw(0) & 0xFF) + (raw(1) & 0xFF)
                == 0xFF + 0xFE, s"id3: UTF-16 text without BOM (doc $docId)")
              new String(raw, "UTF-16") // BOM-aware
            case 2 =>
              require(major == 4,
                s"id3: UTF-16BE text (encoding 2) is v2.4-only (doc $docId)")
              require(raw.length % 2 == 0,
                s"id3: odd UTF-16BE byte count (doc $docId)")
              new String(raw, "UTF-16BE") // the BOM-less v2.4 form
            case 3 =>
              require(major == 4,
                s"id3: UTF-8 text is v2.4-only (doc $docId)")
              new String(raw, "UTF-8")
            case e => throw new IllegalArgumentException(
              s"id3: text encoding $e is a named boundary (doc $docId)")
          }
          texts += ((id, text.takeWhile(_ != 0.toChar)))
        } else skipped += 1
        off += headLen + fsize
      }
    }
    Some(Id3v2Info(major, tagBytes, hasFooter, unsync, texts.result(),
      skipped, hasExt))
  }

  /** Parse a trailing ID3v1 tag, or None when the last 128 bytes carry
    * no "TAG" magic. */
  def parseId3v1(payload: Array[Byte]): Option[Id3v1Info] = {
    if (payload.length < 128) return None
    val off = payload.length - 128
    if (payload(off) != 'T' || payload(off + 1) != 'A' ||
      payload(off + 2) != 'G') return None
    def str(o: Int, len: Int): String =
      new String(payload, off + o, len, "ISO-8859-1")
        .takeWhile(_ != 0.toChar).trim
    val v11 = payload(off + 125) == 0 && payload(off + 126) != 0
    Some(Id3v1Info(str(3, 30), str(33, 30), str(63, 30), str(93, 4),
      if (v11) payload(off + 126) & 0xFF else 0, payload(off + 127) & 0xFF))
  }

  /** The audio span of a possibly-tagged payload: (start, end) byte
    * offsets bracketing the MPEG audio stream, plus the parsed tags. */
  def audioSpan(payload: Array[Byte],
      docId: Long): (Int, Int, Option[Id3v2Info], Option[Id3v1Info]) = {
    val v2 = parseId3v2(payload, docId)
    val start = v2.map(_.tagBytes).getOrElse(0)
    val v1 = parseId3v1(payload)
    val end = payload.length - (if (v1.isDefined) 128 else 0)
    require(start < end, s"id3: no audio between the tags (doc $docId)")
    (start, end, v2, v1)
  }
}
