package graft.tools

/** Dev probe: dump the marker/scan structure of an ImageIO-written
  * progressive JPEG and diff graft's decode against ImageIO's. */
object JpegProbe {
  def run(name: String, w: Int, h: Int, pix: (Int, Int) => Int): Unit = {
    import javax.imageio._
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.getRaster.setSample(x, y, 0, pix(x, y))
    })
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val b = bos.toByteArray
    val (dw, _, px, _) = graft.ops.Multimodal.decodeJpegRaster(b)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(b))
    var nBad = 0; var worst = 0
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val d = math.abs(px(y * dw + x) - ref.getRaster.getSample(x, y, 0))
      if (d > 1) nBad += 1
      worst = math.max(worst, d)
    })
    println(s"[probe] $name: bad=$nBad/${w * h} worst=$worst")
  }

  def main(args: Array[String]): Unit = {
    import javax.imageio._
    run("flat128", 37, 29, (_, _) => 128)
    run("flat77", 37, 29, (_, _) => 77)
    run("xramp", 37, 29, (x, _) => x * 6)
    run("yramp", 37, 29, (_, y) => y * 8)
    run("blocky", 37, 29, (x, y) => (x / 8 * 97 + y / 8 * 41) % 256)
    run("full", 37, 29, (x, y) => (x * x * 7 + y * 13 + x * y) % 256)
    val (w, h) = (37, 29)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.getRaster.setSample(x, y, 0, (x * x * 7 + y * 13 + x * y) % 256)
    })
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val b = bos.toByteArray
    def u8(p: Int) = b(p) & 0xFF
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)
    var pos = 2
    var done = false
    while (!done && pos + 1 < b.length) {
      if (u8(pos) != 0xFF) { pos += 1 }
      else {
        val m = u8(pos + 1)
        if (m == 0xD9) { println(f"[probe] $pos%5d EOI"); done = true }
        else if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) pos += 2
        else {
          val len = u16(pos + 2)
          m match {
            case 0xDA =>
              val body = pos + 4
              val ns = u8(body)
              val comps = (0 until ns).map(i =>
                f"${u8(body + 1 + 2 * i)}%d:dc${u8(body + 2 + 2 * i) >> 4}ac${u8(body + 2 + 2 * i) & 15}")
              println(f"[probe] $pos%5d SOS ns=$ns ${comps.mkString(",")} " +
                f"Ss=${u8(body + 1 + 2 * ns)} Se=${u8(body + 2 + 2 * ns)} " +
                f"Ah=${u8(body + 3 + 2 * ns) >> 4} Al=${u8(body + 3 + 2 * ns) & 15}")
            case 0xC2 =>
              println(f"[probe] $pos%5d SOF2 ${u16(pos + 7)}x${u16(pos + 5)} " +
                s"ncomp=${u8(pos + 9)}")
            case 0xC4 => println(f"[probe] $pos%5d DHT len=$len")
            case 0xDB => println(f"[probe] $pos%5d DQT len=$len")
            case 0xDD => println(f"[probe] $pos%5d DRI=${u16(pos + 4)}")
            case other => println(f"[probe] $pos%5d FF$other%02X len=$len")
          }
          pos += 2 + len
        }
      }
    }
    val (dw, dh, px, _) = graft.ops.Multimodal.decodeJpegRaster(b)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(b))
    var worst = (0, 0, 0)
    var nBad = 0
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val d = math.abs(px(y * dw + x) - ref.getRaster.getSample(x, y, 0))
      if (d > 1) nBad += 1
      if (d > worst._3) worst = (x, y, d)
    })
    println(s"[probe] decoded ${dw}x$dh, pixels off by >1: $nBad / ${w * h}, " +
      s"worst at (${worst._1},${worst._2}) diff ${worst._3}")
    // per-8x8-block bad-pixel census to localize the failure
    (0 until (h + 7) / 8).foreach { by =>
      val row = (0 until (w + 7) / 8).map { bx =>
        var bad = 0
        (0 until 8).foreach(dy => (0 until 8).foreach { dx =>
          val x = bx * 8 + dx; val y = by * 8 + dy
          if (x < w && y < h &&
              math.abs(px(y * dw + x) - ref.getRaster.getSample(x, y, 0)) > 1)
            bad += 1
        })
        f"$bad%2d"
      }
      println(s"[probe] block row $by: ${row.mkString(" ")}")
    }
  }
}
