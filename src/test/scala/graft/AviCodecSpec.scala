package graft

import graft.operators.AviCodec

/** MJPEG-AVI container codec (r11 verdict item 4): the writer/demuxer
  * implement the PUBLISHED classic RIFF/AVI layout, and these tests
  * pin OUR reading of that spec — exact chunk offsets/sizes on a
  * golden fixture (fixed fake payloads, so the bytes are eternal),
  * WORD-alignment padding, round-trips, skip rules, and loud
  * rejection of malformed payloads. */
class AviCodecSpec extends SparkSpec {

  // two fixed payloads, odd + even length, to pin the padding rule
  private val f0 = Array[Byte](1, 2, 3)
  private val f1 = Array[Byte](4, 5, 6, 7, 8)
  private def golden: Array[Byte] = AviCodec.encodeAvi(Seq(f0, f1), 12, 10)

  private def le32(b: Array[Byte], off: Int): Long =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getInt(off).toLong & 0xffffffffL
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  test("golden fixture: the classic RIFF/AVI chunk layout, byte-exact") {
    val b = golden
    // hand-computed layout: hdrl 192, movi 4+(8+3+1)+(8+5+1)=30,
    // idx1 2·16=32, riff 4+200+38+40=282, file 290
    assert(b.length == 290, s"total ${b.length}")
    assert(tag(b, 0) == "RIFF" && le32(b, 4) == 282 && tag(b, 8) == "AVI ")
    assert(tag(b, 12) == "LIST" && le32(b, 16) == 192 && tag(b, 20) == "hdrl")
    assert(tag(b, 24) == "avih" && le32(b, 28) == 56)
    assert(le32(b, 32) == 100000L)      // dwMicroSecPerFrame (10 fps)
    assert(le32(b, 44) == 0x10)         // AVIF_HASINDEX
    assert(le32(b, 48) == 2)            // dwTotalFrames
    assert(le32(b, 56) == 1)            // dwStreams
    assert(le32(b, 64) == 12 && le32(b, 68) == 10) // dwWidth/dwHeight
    assert(tag(b, 88) == "LIST" && le32(b, 92) == 116 && tag(b, 96) == "strl")
    assert(tag(b, 100) == "strh" && le32(b, 104) == 56)
    assert(tag(b, 108) == "vids" && tag(b, 112) == "MJPG")
    assert(le32(b, 128) == 1 && le32(b, 132) == 10) // dwScale/dwRate
    assert(le32(b, 140) == 2)           // dwLength (frames)
    assert(tag(b, 164) == "strf" && le32(b, 168) == 40)
    assert(le32(b, 172) == 40)          // biSize
    assert(le32(b, 176) == 12 && le32(b, 180) == 10)
    assert(tag(b, 188) == "MJPG")       // biCompression
    assert(le32(b, 192) == 360)         // biSizeImage = 12·10·3
    assert(tag(b, 212) == "LIST" && le32(b, 216) == 30 && tag(b, 220) == "movi")
    assert(tag(b, 224) == "00dc" && le32(b, 228) == 3)
    assert(b.slice(232, 235).toSeq == f0.toSeq && b(235) == 0) // WORD pad
    assert(tag(b, 236) == "00dc" && le32(b, 240) == 5)
    assert(b.slice(244, 249).toSeq == f1.toSeq && b(249) == 0)
    assert(tag(b, 250) == "idx1" && le32(b, 254) == 32)
    // index entries: fourcc, AVIIF_KEYFRAME, offset from 'movi', size
    assert(tag(b, 258) == "00dc" && le32(b, 262) == 0x10 &&
      le32(b, 266) == 4 && le32(b, 270) == 3)
    assert(tag(b, 274) == "00dc" && le32(b, 282) == 16 && le32(b, 286) == 5)
  }

  test("demux round-trips frames verbatim with the header facts") {
    val avi = AviCodec.demuxAvi(golden)
    assert(avi.width == 12 && avi.height == 10 && avi.fps == 10 &&
      avi.declaredFrames == 2)
    val frames = avi.frames.toSeq
    assert(frames.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
    // many frames, odd/even mixed lengths — alignment never drifts
    val many = (1 to 37).map(i => Array.fill(i)((i % 127).toByte))
    val back = AviCodec.demuxAvi(
      AviCodec.encodeAvi(many, 8, 8, fps = 25)).frames.toSeq
    assert(back.map(_.toSeq) == many.map(_.toSeq))
  }

  test("demux skips foreign chunks and streams; the frame iterator is lazy") {
    val b = golden
    // splice a JUNK top-level chunk between movi and idx1 and a
    // second-stream chunk ('01wb' audio) inside movi: both skipped
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(b, 0, 224) // through 'movi' fourcc
    // foreign in-movi chunk first: 01wb, 2 bytes + pad... keep WORD len
    bos.write("01wb".getBytes("US-ASCII"))
    bos.write(Array[Byte](4, 0, 0, 0)); bos.write(Array[Byte](9, 9, 9, 9))
    bos.write(b, 224, b.length - 224)
    val spliced = bos.toByteArray
    // fix the sizes: movi list grew by 12, riff by 12
    val buf = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, (le32(b, 4) + 12).toInt)
    buf.putInt(216, (le32(b, 216) + 12).toInt)
    val frames = AviCodec.demuxAvi(spliced).frames.toSeq
    assert(frames.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
    // laziness: a demux handle on a HUGE frame count costs nothing
    // until pulled (take(1) returns without walking the rest)
    val big = AviCodec.encodeAvi(
      (1 to 500).map(_ => Array.fill(64)(7.toByte)), 8, 8)
    assert(AviCodec.demuxAvi(big).frames.take(1).toSeq.head.length == 64)
  }

  test("malformed payloads are rejected loudly") {
    val e1 = intercept[IllegalArgumentException] {
      AviCodec.demuxAvi("not a movie".getBytes("US-ASCII")) }
    assert(e1.getMessage.contains("RIFF/AVI"))
    // RIFF/WAVE is RIFF but not AVI
    val wav = graft.operators.AudioCodec.encodeWav(1L, 8000, 100, 1)
    val e2 = intercept[IllegalArgumentException] { AviCodec.demuxAvi(wav) }
    assert(e2.getMessage.contains("RIFF/AVI"))
    // truncated mid-frame: loud, names the chunk
    val cut = golden.take(230)
    val e3 = intercept[IllegalArgumentException] {
      AviCodec.demuxAvi(cut).frames.toSeq }
    assert(e3.getMessage.toLowerCase.contains("trunc"), e3.getMessage)
    // hostile ~2 GiB chunk length: long-arithmetic guard, loud
    val hostile = golden.clone()
    java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(228, Int.MaxValue - 4)
    val e4 = intercept[IllegalArgumentException] {
      AviCodec.demuxAvi(hostile).frames.toSeq }
    assert(e4.getMessage.toLowerCase.contains("trunc"), e4.getMessage)
    // a non-video stream 0 is a loud error, not silent empty frames
    val badStrh = golden.clone()
    System.arraycopy("auds".getBytes("US-ASCII"), 0, badStrh, 108, 4)
    val e5 = intercept[IllegalArgumentException] {
      AviCodec.demuxAvi(badStrh) }
    assert(e5.getMessage.contains("vids"), e5.getMessage)
    // hostile hdrl whose strl's strh chunk header fits but whose
    // fccType bytes would read past the list end: the documented loud
    // require, not StringIndexOutOfBoundsException (r12 ADVICE)
    val bos = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = bos.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    tag("RIFF"); u32(36); tag("AVI ")
    tag("LIST"); u32(24); tag("hdrl")          // hdrl ends at byte 44
    tag("LIST"); u32(12); tag("strl")
    tag("strh"); u32(0)                        // header fits; body doesn't
    val e6 = intercept[IllegalArgumentException] {
      AviCodec.demuxAvi(bos.toByteArray) }
    assert(e6.getMessage.contains("truncated strh"), e6.getMessage)
  }

  test("the corpus video table is real MJPEG-AVI: JPEG frames, JDK-decodable") {
    val vids = graft.operators.Multimodal.videoTable(spark, sfDir).limit(20)
    vids.collect().foreach { r =>
      val avi = AviCodec.demuxAvi(r.getAs[Array[Byte]]("payload"))
      val frames = avi.frames.toSeq
      assert(frames.size == avi.declaredFrames && frames.nonEmpty)
      frames.foreach { f =>
        // JPEG magic: the SOI marker FF D8
        assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
          "frame payload is not JPEG")
        val img = graft.operators.ImageCodec.decode(f)
        assert(img.getWidth >= 8 && img.getHeight >= 8)
      }
    }
  }
}
