package graft

import org.scalatest.funsuite.AnyFunSuite

/** ID3v1/ID3v2 tag intake + the Xing/Info VBR header — the wrappers
  * around essentially every real-crawl MP3. */
class Id3Spec extends AnyFunSuite {
  import graft.ops.{Id3, MpegAudio}

  test("ID3v2.3 latin1 and ID3v2.4 utf16+footer tags round-trip: " +
      "majors, full prefix length, text frames, binary-frame skips, " +
      "padding walked") {
    val texts = Seq("TIT2" -> "A Title", "TPE1" -> "Some Artist",
      "TALB" -> "An Album")
    val v23 = Id3.encodeId3v2(texts, major = 3, padding = 17,
      binaryFrames = Seq("APIC" -> Array[Byte](1, 2, 3, 4, 5)))
    val p23 = Id3.parseId3v2(v23, 1L).get
    assert(p23.major == 3 && !p23.hasFooter)
    assert(p23.tagBytes == v23.length)
    assert(p23.textFrames == texts)
    assert(p23.nSkippedFrames == 1)
    // v2.4: syncsafe frame sizes, utf16 text (non-latin1 chars), footer
    val texts24 = Seq("TIT2" -> "Tïtle — ünïcode", "TPE1" -> "Ärtist")
    val v24 = Id3.encodeId3v2(texts24, major = 4, utf16 = true,
      withFooter = true)
    val p24 = Id3.parseId3v2(v24, 2L).get
    assert(p24.major == 4 && p24.hasFooter)
    assert(p24.tagBytes == v24.length)
    assert(p24.textFrames == texts24)
    // no magic → None
    assert(Id3.parseId3v2("nota tag at all".getBytes, 3L).isEmpty)
  }

  test("ID3v1.1 trailer round-trips title/artist/album/year/track/" +
      "genre; absent trailer is None") {
    val tag = Id3.encodeId3v1("My Title", "My Artist", "My Album",
      "1987", "a comment", track = 7, genre = 52)
    assert(tag.length == 128)
    val audio = Array.fill[Byte](500)(0x5A)
    val p = Id3.parseId3v1(audio ++ tag).get
    assert(p.title == "My Title" && p.artist == "My Artist" &&
      p.album == "My Album" && p.year == "1987" && p.track == 7 &&
      p.genre == 52)
    assert(Id3.parseId3v1(audio).isEmpty)
  }

  test("Xing/Info first frame: written form parses back (vbr flag, " +
      "frame/byte counts), a normal audio frame yields None, and the " +
      "info frame is a VALID frame (walkFrames accepts it)") {
    val xf = MpegAudio.makeMp3InfoFrame(128, mono = true, nFrames = 42,
      nBytes = 12345, vbr = true)
    val xi = MpegAudio.mp3XingInfo(10L, xf).get
    assert(xi.vbr && xi.nFrames == 42 && xi.nBytes == 12345)
    val inf = MpegAudio.makeMp3InfoFrame(192, mono = false, nFrames = 9,
      nBytes = 999, vbr = false)
    val ii = MpegAudio.mp3XingInfo(11L, inf).get
    assert(!ii.vbr && ii.nFrames == 9)
    assert(MpegAudio.walkFrames(12L, xf).length == 1)
    // a real audio frame has no Xing magic
    val lines = new Array[Int](576); lines(40) = 1
    val audio = MpegAudio.encodeMp3(Seq(lines, lines), Seq(210, 210), 128)
    assert(MpegAudio.mp3XingInfo(13L, audio).isEmpty)
  }

  test("mp3IntakeCensus composes the full tagged-crawl shape: ID3v2 + " +
      "Xing + audio + ID3v1 — spans exact, counts exact, and the " +
      "stripped audio decodes identically to the untagged stream") {
    val lines = new Array[Int](576); lines(40) = 1
    val audio = MpegAudio.encodeMp3(
      Seq(lines, lines, lines, lines), Seq(210, 212, 214, 216), 128)
    val nAudioFrames = 2
    val v2 = Id3.encodeId3v2(Seq("TIT2" -> "T", "TPE1" -> "P"), major = 3)
    val xing = MpegAudio.makeMp3InfoFrame(128, mono = true,
      nFrames = nAudioFrames, nBytes = audio.length, vbr = true)
    val v1 = Id3.encodeId3v1("t", "p", "a", "2001", "", 1, 0)
    val tagged = v2 ++ xing ++ audio ++ v1
    val c = MpegAudio.mp3IntakeCensus(20L, tagged)
    assert(c.audioStart == v2.length)
    assert(c.audioEnd == tagged.length - 128)
    assert(c.id3v2.get.textFrames.map(_._1) == Seq("TIT2", "TPE1"))
    assert(c.id3v1.get.title == "t")
    assert(c.xing.get.vbr && c.xing.get.nFrames == nAudioFrames)
    assert(c.nAudioFrames == nAudioFrames && c.nSamples == 2304L)
    val strippedPcm = MpegAudio.decodeMpegAudio(21L, audio)
    val spanPcm = MpegAudio.decodeMpegAudio(22L,
      java.util.Arrays.copyOfRange(tagged,
        c.audioStart + xing.length, c.audioEnd))
    assert(strippedPcm.sameElements(spanPcm))
    // untagged stream: census passes through with no tags, no xing
    val c2 = MpegAudio.mp3IntakeCensus(23L, audio)
    assert(c2.audioStart == 0 && c2.id3v2.isEmpty && c2.id3v1.isEmpty &&
      c2.xing.isEmpty && c2.nAudioFrames == nAudioFrames)
  }

  test("named boundaries and malformations fail loudly: ID3v2.2, the " +
      "unsynchronisation flag, UTF-16 without BOM, overrunning sizes") {
    val good = Id3.encodeId3v2(Seq("TIT2" -> "x"), major = 3)
    val v22 = good.clone(); v22(3) = 2
    val e1 = intercept[IllegalArgumentException](Id3.parseId3v2(v22, 30L))
    assert(e1.getMessage.contains("v2.2"))
    val unsync = good.clone(); unsync(5) = 0x80.toByte
    val e2 = intercept[IllegalArgumentException](Id3.parseId3v2(unsync, 31L))
    assert(e2.getMessage.contains("unsynchronised"))
    // UTF-16 text frame without a BOM
    val u16 = Id3.encodeId3v2(Seq("TIT2" -> "ab"), major = 3, utf16 = true)
    val noBom = u16.clone()
    // encoding byte sits right after the 10B frame header inside the
    // 10B tag header; BOM is the next two bytes — corrupt them
    noBom(21) = 0; noBom(22) = 'a'.toByte
    val e3 = intercept[IllegalArgumentException](Id3.parseId3v2(noBom, 32L))
    assert(e3.getMessage.contains("BOM"))
    // tag size overrunning the payload
    val cut = java.util.Arrays.copyOf(good, good.length - 2)
    val e4 = intercept[IllegalArgumentException](Id3.parseId3v2(cut, 33L))
    assert(e4.getMessage.contains("overruns"))
  }
}
