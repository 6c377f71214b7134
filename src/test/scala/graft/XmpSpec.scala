package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Exif, Multimodal, Xmp}
import graft.ops.Xmp.XmpMeta

class XmpSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int): Array[Byte] =
    Multimodal.encodeJpeg(w, h, i => (i * 7) % 256)

  private def parse(xml: String, docId: Long = 1L): XmpMeta =
    Xmp.parseXmpPacket(docId, xml.getBytes("UTF-8"))

  test("element-form round-trip through a JPEG APP1: LangAlt title, " +
      "rdf:Seq creators in order, CreateDate, other props counted; " +
      "XMP and EXIF coexist in one stream and strip removes both") {
    val pkt = Xmp.encodeXmpPacket(title = Some("A Crawl Image"),
      creators = Seq("First Author", "Second Author"),
      createDate = Some("2013-05-02T12:00:00Z"),
      other = Seq("CreatorTool" -> "graft 1.0", "Rating" -> "5"))
    val exif = Exif.encodeExifApp1(Exif.ExifMeta(bigEndian = false,
      make = Some("graftcam")))
    val base = gray(16, 8)
    val tagged = Exif.insertJpegSegments(base,
      Seq(exif, Xmp.encodeXmpApp1(pkt)))
    val c = Exif.readJpegMeta(1L, tagged)
    assert(c.xmp.contains(XmpMeta(Some("A Crawl Image"),
      Seq("First Author", "Second Author"),
      Some("2013-05-02T12:00:00Z"), nOtherProps = 2)))
    assert(c.exif.exists(_.make.contains("graftcam")),
      "the EXIF APP1 must still parse next to the XMP APP1")
    assert(c.nUnknownApps == 0,
      "neither APP1 system may fall into the unknown-APP census")
    // strip removes both APP1s; the bare stream decodes identically
    val stripped = Exif.stripJpegMeta(1L, tagged)
    assert(stripped.sameElements(base))
    val rerun = Exif.readJpegMeta(1L, stripped)
    assert(rerun.xmp.isEmpty && rerun.exif.isEmpty && rerun.metaBytes == 0)
  }

  test("attribute-form simple properties parse identically to element " +
      "form; XML escaping survives both directions in both forms") {
    val title = Some("""Fish & <Chips> "quoted"""")
    val date = Some("2020-01-02T03:04:05Z")
    val el = Xmp.parseXmpPacket(2L, Xmp.encodeXmpPacket(
      title = title, createDate = date, attrForm = false,
      other = Seq("CreatorTool" -> """a&b<c>"d"""")))
    val at = Xmp.parseXmpPacket(3L, Xmp.encodeXmpPacket(
      title = title, createDate = date, attrForm = true,
      other = Seq("CreatorTool" -> """a&b<c>"d"""")))
    assert(el == at, s"$el vs $at")
    assert(el.title == title && el.createDate == date &&
      el.nOtherProps == 1)
  }

  test("foreign serializations: bare rdf:RDF root, properties split " +
      "across multiple Descriptions (later wins on a dup), rdf:Bag " +
      "creators, simple-text title, x-default preferred among langs") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val dc = "http://purl.org/dc/elements/1.1/"
    val xb = "http://ns.adobe.com/xap/1.0/"
    val foreign =
      s"""<rdf:RDF xmlns:rdf="$rdfNs" xmlns:dc="$dc" xmlns:xmp="$xb">
         | <rdf:Description rdf:about="">
         |  <dc:title>plain text title</dc:title>
         |  <xmp:CreateDate>1999-01-01</xmp:CreateDate>
         | </rdf:Description>
         | <rdf:Description rdf:about="">
         |  <dc:creator><rdf:Bag><rdf:li>bag author</rdf:li></rdf:Bag>
         |  </dc:creator>
         |  <xmp:CreateDate>2001-02-03</xmp:CreateDate>
         | </rdf:Description>
         |</rdf:RDF>""".stripMargin
    assert(parse(foreign) == XmpMeta(Some("plain text title"),
      Seq("bag author"), Some("2001-02-03"), 0))
    val langs =
      s"""<x:xmpmeta xmlns:x="adobe:ns:meta/">
         |<rdf:RDF xmlns:rdf="$rdfNs"><rdf:Description rdf:about=""
         |  xmlns:dc="$dc">
         |  <dc:title><rdf:Alt>
         |   <rdf:li xml:lang="fr">titre</rdf:li>
         |   <rdf:li xml:lang="x-default">the default</rdf:li>
         |  </rdf:Alt></dc:title>
         |</rdf:Description></rdf:RDF></x:xmpmeta>""".stripMargin
    assert(parse(langs).title.contains("the default"))
    // no x-default: first li wins (deterministic, never arbitrary)
    assert(parse(langs.replace("x-default", "de")).title.contains("titre"))
  }

  test("property census: unknown-namespace elements and attributes and " +
      "unqualified attributes are counted, carried properties are not") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val xml =
      s"""<rdf:RDF xmlns:rdf="$rdfNs">
         | <rdf:Description rdf:about="" bare="junk"
         |   xmlns:tiff="http://ns.adobe.com/tiff/1.0/" tiff:Make="cam"
         |   xmlns:dc="http://purl.org/dc/elements/1.1/">
         |  <dc:title>t</dc:title>
         |  <tiff:Model>m</tiff:Model>
         |  <dc:subject><rdf:Bag><rdf:li>topic</rdf:li></rdf:Bag>
         |  </dc:subject>
         | </rdf:Description>
         |</rdf:RDF>""".stripMargin
    val m = parse(xml)
    assert(m.title.contains("t"))
    assert(m.nOtherProps == 4, m) // bare, tiff:Make, tiff:Model, dc:subject
  }

  test("corruption and boundaries fail loudly by name: malformed XML, " +
      "DOCTYPE (XXE) refused, packet without rdf:RDF, UTF-16 BOM, " +
      "control chars at encode, over-segment packet (ExtendedXMP)") {
    val e1 = intercept[IllegalArgumentException](
      parse("<x:xmpmeta xmlns:x='adobe:ns:meta/'><unclosed>"))
    assert(e1.getMessage.contains("not well-formed XML"))
    val e2 = intercept[IllegalArgumentException](parse(
      """<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<x:xmpmeta xmlns:x="adobe:ns:meta/">&xxe;</x:xmpmeta>"""
        .stripMargin))
    assert(e2.getMessage.contains("not well-formed XML"))
    val e3 = intercept[IllegalArgumentException](
      parse("""<x:xmpmeta xmlns:x="adobe:ns:meta/"/>"""))
    assert(e3.getMessage.contains("no rdf:RDF"))
    val e4 = intercept[IllegalArgumentException](Xmp.parseXmpPacket(4L,
      Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 60)))
    assert(e4.getMessage.contains("only UTF-8"))
    intercept[IllegalArgumentException](
      Xmp.encodeXmpPacket(title = Some("a\u0001b")))
    val e5 = intercept[IllegalArgumentException](Xmp.encodeXmpApp1(
      Array.fill(70000)('x'.toByte)))
    assert(e5.getMessage.contains("split it with encodeExtendedXmp"))
    // a truncated XMP APP1 inside a JPEG is loud through the walk too
    val seg = Xmp.encodeXmpApp1(Xmp.encodeXmpPacket(title = Some("t")))
    val cut = Exif.insertJpegSegments(gray(8, 8), Seq(seg))
      .take(2 + seg.length - 5)
    val e6 = intercept[IllegalArgumentException](
      Exif.readJpegMeta(5L, cut))
    assert(e6.getMessage.contains("truncated"))
  }

  test("ExtendedXMP (XMP Part 3, r14): an oversized packet splits into " +
      "GUID-framed APP1 chunks, reassembles with MD5/coverage checks, " +
      "and merges under the main packet; GUID mismatch, gaps, overlap, " +
      "orphan chunks, and a lying MD5 are loud") {
    // a packet too big for one APP1: a long dc:title plus creators
    val bigTitle = "T" * 70000
    val full = Xmp.encodeXmpPacket(title = Some(bigTitle),
      creators = Seq("Ext Author"))
    assert(full.length > 65535)
    intercept[IllegalArgumentException](Xmp.encodeXmpApp1(full))
    val (guid, segs) = Xmp.encodeExtendedXmp(full, chunkSize = 20000)
    assert(segs.length == (full.length + 19999) / 20000)
    val main = Xmp.encodeXmpApp1(Xmp.encodeXmpPacket(
      createDate = Some("2021-03-04"), hasExtendedXmp = Some(guid)))
    val base = Multimodal.encodeJpeg(8, 8, i => (i * 3) % 256)
    val tagged = Exif.insertJpegSegments(base, main +: segs)
    val c = Exif.readJpegMeta(70L, tagged)
    val x = c.xmp.get
    assert(x.title.contains(bigTitle), "extended title must merge in")
    assert(x.creators == Seq("Ext Author"))
    assert(x.createDate.contains("2021-03-04"), "main packet wins/stays")
    assert(x.hasExtendedXmp.contains(guid))
    assert(c.nUnknownApps == 0,
      "extension chunks must not land in the unknown-APP census")
    // chunk order must not matter (spec orders by offset; readers
    // cannot rely on segment order in the wild)
    val shuffled = Exif.insertJpegSegments(base, main +: segs.reverse)
    assert(Exif.readJpegMeta(71L, shuffled).xmp.get.title
      .contains(bigTitle))
    // strip removes main + all chunks
    assert(Exif.stripJpegMeta(72L, tagged).sameElements(base))
    // orphan chunks (no HasExtendedXMP in main) are loud
    val orphan = Exif.insertJpegSegments(base,
      Xmp.encodeXmpApp1(Xmp.encodeXmpPacket(title = Some("t"))) +: segs)
    val e1 = intercept[IllegalArgumentException](
      Exif.readJpegMeta(73L, orphan))
    assert(e1.getMessage.contains("no HasExtendedXMP"))
    // main naming a GUID with zero chunks present is loud
    val noChunks = Exif.insertJpegSegments(base, Seq(main))
    val e2 = intercept[IllegalArgumentException](
      Exif.readJpegMeta(74L, noChunks))
    assert(e2.getMessage.contains("no ExtendedXMP chunks"))
    // a missing middle chunk = coverage gap, loud
    val gap = Exif.insertJpegSegments(base,
      main +: (segs.take(1) ++ segs.drop(2)))
    val e3 = intercept[IllegalArgumentException](
      Exif.readJpegMeta(75L, gap))
    assert(e3.getMessage.contains("gaps"))
    // a duplicated chunk = overlap, loud
    val dup = Exif.insertJpegSegments(base, main +: (segs :+ segs.head))
    val e4 = intercept[IllegalArgumentException](
      Exif.readJpegMeta(76L, dup))
    assert(e4.getMessage.contains("overlap"))
    // GUID disagreement between main and chunks is loud
    val wrongGuid = Xmp.encodeXmpApp1(Xmp.encodeXmpPacket(
      hasExtendedXmp = Some("0" * 32)))
    val e5 = intercept[IllegalArgumentException](Exif.readJpegMeta(77L,
      Exif.insertJpegSegments(base, wrongGuid +: segs)))
    assert(e5.getMessage.contains("GUID mismatch"))
    // a corrupted payload byte flips the MD5 -> loud
    val corrupt = segs.map(_.clone())
    corrupt.head(corrupt.head.length - 1) =
      (corrupt.head(corrupt.head.length - 1) ^ 1).toByte
    val e6 = intercept[IllegalArgumentException](Exif.readJpegMeta(78L,
      Exif.insertJpegSegments(base, main +: corrupt)))
    assert(e6.getMessage.contains("MD5 does not match"))
    // bad GUID shape refused at encode
    intercept[IllegalArgumentException](
      Xmp.encodeXmpPacket(hasExtendedXmp = Some("nothex")))
  }
}
