package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec

/** Golden-pixel pinning of the real image codec (r10 verdict item 1):
  * the committed PNG fixtures under src/test/resources/graft/ were
  * written once by [[ImageFixtureGen]]; their BYTES never change, so
  * these assertions pin (a) the JDK decoder returning bit-exact pixels
  * for committed bytes on every JVM this library ever runs on, and
  * (b) the derived perceptual hashes / bilinear resize producing the
  * exact golden values recorded at generation time. */
class ImageCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val goldens = Seq(
    // (file, seed, w, h, aHash, dHash, resized 4x3 row-major RGB)
    ("img_seed3_8x6.png", 3L, 8, 6, 0xa5e1a5a5abe49090L, 0x5aca4a4a568a6262L,
      Seq(0x714c89, 0xb34187, 0x7178a8, 0x88a3a3, 0x798c6f, 0x7a8471,
        0x5d858c, 0x775e7b, 0x8c7a58, 0x934f89, 0xad6c7e, 0x57ad8d)),
    ("img_seed4_10x7.png", 4L, 10, 7, 0x346200527423bebeL, 0x74ca12a6c5db4646L,
      Seq(0x9f7b86, 0x807585, 0xa69db6, 0x4c65be, 0xbd9283, 0x64319b,
        0x98890c, 0x8b4dc2, 0x607dac, 0x88658a, 0x82b781, 0x947446)))

  test("committed fixtures decode to the exact per-pixel formula") {
    for ((name, seed, w, h, _, _, _) <- goldens) {
      val img = ImageCodec.decode(fixture(name))
      assert(img.getWidth == w && img.getHeight == h, name)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == ImageCodec.pixel(seed, x, y),
          s"$name pixel ($x,$y)")
    }
  }

  test("perceptual hashes match the golden constants byte-exactly") {
    for ((name, _, _, _, aH, dH, _) <- goldens) {
      val img = ImageCodec.decode(fixture(name))
      assert(ImageCodec.aHash64(img) == aH, s"$name aHash")
      assert(ImageCodec.dHash64(img) == dH, s"$name dHash")
    }
  }

  test("bilinear resize reproduces the golden 4x3 pixels exactly") {
    for ((name, _, _, _, _, _, px) <- goldens) {
      val rs = ImageCodec.bilinearResize(ImageCodec.decode(fixture(name)), 4, 3)
      val got = for (y <- 0 until 3; x <- 0 until 4)
        yield rs.getRGB(x, y) & 0xffffff
      assert(got == px, s"$name resized")
    }
  }

  test("encode/decode roundtrip is pixel-faithful at corpus dims") {
    for (seed <- Seq(0L, 6L, 41L, 499L)) {
      val w = graft.operators.Multimodal.imgW(seed)
      val h = graft.operators.Multimodal.imgH(seed)
      val img = ImageCodec.decode(ImageCodec.encodePng(seed, w, h))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == ImageCodec.pixel(seed, x, y))
    }
  }

  test("grayGrid clamps to nearest-pixel when the image is smaller than the grid") {
    // a 2x2 image pooled on a 4x4 grid: each quadrant repeats its pixel
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0x808080); img.setRGB(1, 1, 0x404040)
    val g = ImageCodec.grayGrid(img, 4, 4)
    def lum(rgb: Int) = ImageCodec.gray(rgb).toDouble
    assert(g.toSeq == Seq(
      lum(0x000000), lum(0x000000), lum(0xffffff), lum(0xffffff),
      lum(0x000000), lum(0x000000), lum(0xffffff), lum(0xffffff),
      lum(0x808080), lum(0x808080), lum(0x404040), lum(0x404040),
      lum(0x808080), lum(0x808080), lum(0x404040), lum(0x404040)))
    // and the exact floor partition when the image is larger
    val big = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) big.setRGB(x, y, x * 0x111111)
    val g2 = ImageCodec.grayGrid(big, 2, 2)
    assert(g2(0) == (lum(0x000000) + lum(0x111111)) / 2)
    assert(g2(1) == (lum(0x222222) + lum(0x333333)) / 2)
  }

  test("dHash survives a PNG re-encode but separates different content") {
    val a = ImageCodec.decode(ImageCodec.encodePng(77L, 20, 18))
    val re = ImageCodec.decode(ImageCodec.toPng(a))
    assert(ImageCodec.dHash64(a) == ImageCodec.dHash64(re))
    val b = ImageCodec.decode(ImageCodec.encodePng(78L, 20, 18))
    assert(ImageCodec.dHash64(a) != ImageCodec.dHash64(b))
  }
}
