package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The direct PNG encoder must round-trip BIT-identical pixels through
  * the same javax.imageio read path every decode-side operator uses —
  * the r10 fixture-encode optimization's correctness contract (all
  * decode-derived results — dHash, mean-RGB, scene cuts — depend only on
  * pixels, never container bytes).
  */
class PngSpec extends AnyFlatSpec with Matchers {

  private def decode(bytes: Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img should not be null
    img
  }

  "Png.encodeRgb" should "round-trip exact pixels through ImageIO for varied sizes" in {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val img = decode(Png.encodeRgb(w, h, (x, y) => px(y)(x)))
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      for (y <- 0 until h; x <- 0 until w)
        (img.getRGB(x, y) & 0xffffff) shouldBe px(y)(x)
    }
  }

  it should "decode identically to the old BufferedImage + ImageIO.write path" in {
    val id = 12345L
    def pix(x: Int, y: Int): Int = {
      val v = ((id * 31 + x.toLong * x * 7 + y.toLong * y * 13) % 251).toInt
      (v << 16) | (v << 8) | v
    }
    // old path, verbatim
    val img = new java.awt.image.BufferedImage(9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) img.setRGB(x, y, pix(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val oldImg = decode(out.toByteArray)
    val newImg = decode(Png.encodeRgb(9, 8, pix))
    for (y <- 0 until 8; x <- 0 until 9)
      newImg.getRGB(x, y) shouldBe oldImg.getRGB(x, y)
  }

  it should "produce a single-IDAT stream large encodes included (stored-block split)" in {
    // > 65535 bytes of scanline data forces multiple stored deflate blocks
    val w = 300; val h = 100
    val img = decode(Png.encodeRgb(w, h, (x, y) => ((x * 31 + y * 17) % 251) * 0x010101))
    img.getWidth shouldBe w
    img.getHeight shouldBe h
    (img.getRGB(299, 99) & 0xffffff) shouldBe (((299 * 31 + 99 * 17) % 251) * 0x010101)
  }

  it should "write the IHDR facts the m12 oracle replays (8-bit, type 2, no interlace)" in {
    val bytes = Png.encodeRgb(5, 4, (_, _) => 0xabcdef)
    // IHDR data starts at offset 16: width(4) height(4) depth(1) color(1)
    bytes(16 + 8) shouldBe 8.toByte
    bytes(16 + 9) shouldBe 2.toByte
    bytes(16 + 12) shouldBe 0.toByte
  }
}
