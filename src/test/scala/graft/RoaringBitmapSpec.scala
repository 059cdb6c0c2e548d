package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{RoaringBitmapArray, Z85}

/** The RoaringBitmapArray portable codec + Z85 — the two binary
  * formats Delta deletion vectors ride (PROTOCOL.md "Deletion Vector
  * Format"). Round-trips pin the encoder to the decoder; the run-
  * container and format-guard tests pin the decoder to the PUBLISHED
  * spec bytes, hand-written, so a real writer's vectors parse. */
class RoaringBitmapSpec extends AnyFunSuite {

  test("encode/decode round-trips: empty, arrays, a dense bitset " +
      "container, multiple keys and multiple 32-bit bitmaps") {
    val cases = Seq[Array[Long]](
      Array.empty,
      Array(0L),
      Array(5L, 6L, 8L, 1000L),
      // > 4096 values under one 16-bit key -> a bitset container
      (0L until 5000L).map(_ * 2).toArray.map(v => v % 65536 + 65536L * 0),
      // several keys within one bitmap
      Array(1L, 70000L, 131071L, 131072L, 900000L),
      // beyond 2^32: a second bitmap in the array
      Array(3L, (1L << 32) + 7L, (1L << 32) + 8L, (3L << 32) + 1L))
    cases.foreach { c =>
      val want = c.distinct.sorted
      val got = RoaringBitmapArray.decode(RoaringBitmapArray.encode(c))
      assert(got.toSeq == want.toSeq, s"case ${c.take(5).mkString(",")}…")
    }
    // unsorted + duplicate input canonicalizes
    assert(RoaringBitmapArray.decode(RoaringBitmapArray.encode(
      Array(9L, 2L, 9L, 4L))).toSeq == Seq(2L, 4L, 9L))
  }

  test("decodes the spec's RUN-container form (hand-written bytes)") {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >>> (8 * i)) & 0xff))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    le32(1681511377) // magic
    le32(1); le32(0) // one bitmap (8B LE long)
    // cookie 12347 with (containers-1)=0 in the high 16 bits
    le32(12347)
    bos.write(0x01) // run flag for container 0
    le16(0); le16(5) // key 0, cardinality-1 = 5 (6 values)
    // < 4 containers with the run cookie: NO offset header
    le16(2) // two runs
    le16(10); le16(2) // 10,11,12
    le16(100); le16(2) // 100,101,102
    assert(RoaringBitmapArray.decode(bos.toByteArray).toSeq ==
      Seq(10L, 11L, 12L, 100L, 101L, 102L))
  }

  test("bad magic / torn bytes are loud, never 'fewer deleted rows'") {
    val good = RoaringBitmapArray.encode(Array(1L, 2L, 3L))
    val badMagic = good.clone(); badMagic(0) = 0x42
    val e1 = intercept[IllegalArgumentException] {
      RoaringBitmapArray.decode(badMagic) }
    assert(e1.getMessage.contains("magic"))
    intercept[Exception] { // truncated mid-container
      RoaringBitmapArray.decode(good.take(good.length - 2)) }
    intercept[IllegalArgumentException] {
      RoaringBitmapArray.decode(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] {
      RoaringBitmapArray.encode(Array(-1L)) }
  }

  test("Z85 round-trips, truncates to the declared length, and " +
      "rejects non-alphabet input") {
    val uuid = java.util.UUID.randomUUID()
    val ub = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    val enc = Z85.encode(ub)
    assert(enc.length == 20) // 16 bytes -> exactly 20 chars
    assert(Z85.decode(enc, 16).toSeq == ub.toSeq)
    // non-multiple-of-4 payload: zero-padded on encode, truncated by
    // the declared size on decode (the descriptor's sizeInBytes)
    val odd = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    assert(Z85.decode(Z85.encode(odd), 7).toSeq == odd.toSeq)
    // the reference vector from the Z85 RFC: "HelloWorld"
    assert(Z85.encode(Array(0x86, 0x4F, 0xD2, 0x6F,
      0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)) == "HelloWorld")
    intercept[IllegalArgumentException] { Z85.decode("abc") }
    intercept[IllegalArgumentException] { Z85.decode("ab\"de") }
  }
}
