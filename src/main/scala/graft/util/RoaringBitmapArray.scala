package graft.util

import scala.collection.mutable

/** Pure-Scala codec for the 64-bit "RoaringBitmapArray" serialization
  * Delta Lake's deletion vectors carry (delta-io PROTOCOL.md, "Deletion
  * Vector Format" — the `RoaringBitmapArray` portable format): a
  * 4-byte little-endian magic `1681511377`, an 8-byte LE count of
  * 32-bit bitmaps, then each bitmap in the STANDARD 32-bit Roaring
  * portable layout (the published RoaringFormatSpec):
  *
  *   - cookie (4B LE): `12346` (no run containers; container count in
  *     the next 4B LE) or `12347` (run containers; count-1 in the
  *     cookie's high 16 bits, followed by a run-flag bitset)
  *   - descriptive header: per container, 2B LE key (value high 16
  *     bits) + 2B LE (cardinality - 1)
  *   - offset header (when the cookie is 12346, or 12347 with ≥ 4
  *     containers): 4B LE per container — consumed but unused here
  *     (containers are read sequentially)
  *   - containers in key order: run (2B run count + 2B start / 2B
  *     length-1 pairs), array (cardinality × 2B LE values), or bitset
  *     (1024 LE longs)
  *
  * Bitmap `i` of the array covers row indexes `[i·2³², (i+1)·2³²)`;
  * a row index decodes as `(i << 32) | (key << 16) | value`.
  *
  * Zero new dependencies — ~100 lines of bit arithmetic beat shading
  * the RoaringBitmap jar, and the ENCODER (fixtures + the MoR delete
  * writer) emits the no-run subset the decoder round-trips bit-exactly.
  * The decoder accepts everything the spec allows, run containers
  * included (real writers emit them for dense deletes).
  */
object RoaringBitmapArray {

  private val Magic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Decode the portable bytes into SORTED row indexes. Loud on a bad
    * magic / cookie / truncation — a torn DV must never read as "fewer
    * deleted rows". */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining >= 12, s"truncated RoaringBitmapArray (${bytes.length} bytes)")
    val magic = buf.getInt()
    require(magic == Magic,
      s"bad RoaringBitmapArray magic $magic (want $Magic)")
    val nBitmaps = buf.getLong()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"bad bitmap count $nBitmaps")
    val out = mutable.ArrayBuilder.make[Long]
    var b = 0L
    while (b < nBitmaps) {
      val high = b << 32
      val cookie = buf.getInt()
      val (nContainers, runFlags): (Int, Array[Byte]) =
        if ((cookie & 0xffff) == SerialCookie) {
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          buf.get(flags)
          (n, flags)
        } else {
          require(cookie == SerialCookieNoRun,
            s"bad Roaring cookie $cookie in bitmap $b")
          (buf.getInt(), null)
        }
      def hasRun(i: Int): Boolean =
        runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var i = 0
      while (i < nContainers) {
        keys(i) = buf.getShort() & 0xffff
        cards(i) = (buf.getShort() & 0xffff) + 1
        i += 1
      }
      if (runFlags == null || nContainers >= NoOffsetThreshold)
        buf.position(buf.position() + 4 * nContainers) // offsets: skip
      i = 0
      while (i < nContainers) {
        val base = high | (keys(i).toLong << 16)
        if (hasRun(i)) {
          val nRuns = buf.getShort() & 0xffff
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort() & 0xffff
            val len = buf.getShort() & 0xffff // stored as length - 1
            var v = start
            while (v <= start + len) { out += (base | v); v += 1 }
            r += 1
          }
        } else if (cards(i) <= 4096) {
          var c = 0
          while (c < cards(i)) {
            out += (base | (buf.getShort() & 0xffff)); c += 1
          }
        } else {
          var w = 0
          while (w < 1024) {
            var word = buf.getLong()
            val wordBase = base | (w.toLong << 6)
            while (word != 0L) {
              out += (wordBase | java.lang.Long.numberOfTrailingZeros(word))
              word &= word - 1
            }
            w += 1
          }
        }
        i += 1
      }
      b += 1
    }
    out.result()
  }

  /** Encode SORTED-or-not non-negative row indexes as the portable
    * format (no-run containers: array below 4097 per-key values,
    * bitset at or above — exactly what the spec's 12346 cookie form
    * allows, and what real readers accept). */
  def encode(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.isEmpty || sorted.head >= 0,
      s"negative row index ${sorted.headOption.getOrElse(0L)}")
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
    le32(Magic); le64(nBitmaps)
    var b = 0L
    while (b < nBitmaps) {
      val inBitmap = sorted.filter(p => (p >>> 32) == b)
      // containers grouped by the 16-bit key, in key order
      val byKey = inBitmap.groupBy(p => ((p >>> 16) & 0xffff).toInt)
        .toSeq.sortBy(_._1)
      le32(SerialCookieNoRun); le32(byKey.size)
      byKey.foreach { case (k, vs) =>
        le16(k); le16(vs.length - 1)
      }
      // offset header: byte offsets from the bitmap's cookie to each
      // container (the spec's container index for random access)
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) 2 * vs.length else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(p => le16((p & 0xffff).toInt))
        else {
          val words = new Array[Long](1024)
          vs.foreach { p =>
            val v = (p & 0xffff).toInt
            words(v >>> 6) |= (1L << (v & 63))
          }
          words.foreach(le64)
        }
      }
      b += 1
    }
    bos.toByteArray
  }
}

/** The Z85 binary-to-text codec (the published ZeroMQ RFC 32 alphabet)
  * Delta's deletion-vector descriptors use: `pathOrInlineDv` carries a
  * z85 UUID for on-disk vectors and the z85 DV bytes for inline ones.
  * 4 input bytes ↔ 5 output chars, big-endian base 85; inputs are
  * zero-padded to a 4-byte multiple on encode and the true length is
  * restored from the descriptor's `sizeInBytes` on decode. */
object Z85 {
  private val Alphabet =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Lookup: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte]((4 - bytes.length % 4) % 4)
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xffL) << 24) | ((padded(i + 1) & 0xffL) << 16) |
        ((padded(i + 2) & 0xffL) << 8) | (padded(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(chunk)
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `outLen` bytes (the descriptor's sizeInBytes);
    * pass -1 to keep every decoded byte. */
  def decode(s: String, outLen: Int = -1): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Lookup(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xff).toByte; out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
      i += 5; o += 4
    }
    if (outLen < 0 || outLen == out.length) out
    else {
      require(outLen <= out.length,
        s"z85 payload decodes to ${out.length} bytes, need $outLen")
      java.util.Arrays.copyOfRange(out, 0, outLen)
    }
  }
}
