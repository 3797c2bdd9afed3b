package graft
object ReproSweep2 {
  def main(args: Array[String]): Unit = {
    import graft.formats.{Jpeg, Gif}
    val rnd = new scala.util.Random(777)
    // PROGRESSIVE stream via ImageIO (the multi-scan decode path)
    val img = new java.awt.image.BufferedImage(48, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 40; x <- 0 until 48)
      img.setRGB(x, y, ((x * 53 + y * 17) % 255 << 16) | ((x * 7 + y * 31) % 255 << 8) | ((x + y * 3) % 255))
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    val prog = bos.toByteArray
    println(s"progressive stream ${prog.length} bytes")
    var bad = 0
    def sweep(label: String, good: Array[Byte], n: Int,
        decode: Array[Byte] => graft.formats.Media.Image): Unit = {
      var i = 0
      while (i < n) {
        val at = rnd.nextInt(good.length)
        val xor = 1 + rnd.nextInt(255)
        val mut = good.clone
        mut(at) = (mut(at) ^ xor).toByte
        try {
          val im = decode(mut)
          if (!(im.width > 0 && im.height > 0 && im.pixels.length == im.width * im.height * 3)) {
            println(s"$label UNBOUNDED at=($at,$xor)"); bad += 1
          }
        } catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            println(s"$label UNDECLARED at=($at,$xor): ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(120)}")
            bad += 1
        }
        i += 1
      }
    }
    sweep("jpeg-progressive", prog, 40000, Jpeg.decode)
    val goodGif = Gif.encodeGray(40, 24, Array.tabulate(40 * 24)(i => (i % 251).toByte))
    sweep("gif", goodGif, 40000, Gif.decode)
    println(s"sweep2 done, bad=$bad")
  }
}
