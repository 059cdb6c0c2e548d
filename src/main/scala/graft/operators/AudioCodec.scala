package graft.operators

/** Real audio codec math for the multimodal column stack — the audio
  * sibling of [[ImageCodec]], zero dependencies: RIFF/WAVE PCM-16 is
  * a fully published container (the format every audio tool reads),
  * encoded and parsed here byte-for-byte, and the derived perceptual
  * fingerprint (sign-of-delta over per-window RMS energy — the dHash
  * construction transplanted to the time axis) is pure integer/double
  * arithmetic: deterministic across partitions, machines, JDKs, and
  * GAIN-INVARIANT (uniform volume change preserves every energy
  * comparison), so a re-leveled re-upload keeps its fingerprint while
  * a byte hash would break — the perceptual property that makes audio
  * near-dup detection real.
  *
  * All per-row work runs executor-side inside `mapPartitions`; raw
  * samples never shuffle — only (id, 64-bit fingerprint) longs.
  */
object AudioCodec {

  /** Deterministic EVEN-valued PCM-16 sample for the synthetic
    * corpus: even values make an exact half-gain copy representable
    * (sample/2 loses no information), which the gain-invariance spec
    * uses to prove the fingerprint perceptual, not byte-level. */
  def sample(seed: Long, i: Long): Short =
    (((ImageCodec.mix64(seed * 9176L + i) & 0x7ffe) - 16384)).toShort

  /** Encode a RIFF/WAVE file: PCM 16-bit little-endian, the published
    * canonical header (fmt + data chunks). */
  def encodeWav(seed: Long, sampleRate: Int, nFrames: Int,
      channels: Int): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0L
    while (i < nFrames.toLong * channels) {
      buf.putShort(sample(seed, i))
      i += 1
    }
    buf.array()
  }

  final case class Wav(sampleRate: Int, channels: Int, nFrames: Int,
      samples: Array[Short])

  /** REAL decode: walk the RIFF chunk list (fmt may be preceded or
    * followed by LIST/fact/other chunks — the walk is the published
    * container contract, not a fixed offset), require PCM 16-bit,
    * return header facts + raw samples. Throws on anything else. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    var pos = 12
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      // long arithmetic: a hostile length near Int.MaxValue would wrap
      // `pos + 8 + len` negative and sail past an int-typed guard,
      // failing later as a negative allocation instead of loudly here
      require(len >= 0 && pos.toLong + 8L + len <= bytes.length,
        s"truncated $id chunk in WAV")
      id match {
        case "fmt " =>
          val fmt = buf.getShort(pos + 8)
          require(fmt == 1, s"unsupported WAV format code $fmt (PCM only)")
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
          require(bits == 16, s"unsupported bit depth $bits (16 only)")
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => () // skip LIST/fact/etc — the walk IS the contract
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(channels > 0 && dataOff >= 0, "missing fmt or data chunk")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(dataOff + i * 2); i += 1 }
    Wav(sampleRate, channels, n / channels, out)
  }

  /** Per-window RMS energies (sum of squares over fixed windows —
    * exact integer accumulation, one double division per window). */
  def windowEnergies(samples: Array[Short], window: Int): Array[Double] = {
    val n = samples.length / window
    val out = new Array[Double](math.max(n, 0))
    var w = 0
    while (w < n) {
      var sum = 0L; var i = w * window
      val end = i + window
      while (i < end) { val s = samples(i).toLong; sum += s * s; i += 1 }
      out(w) = sum.toDouble / window
      w += 1
    }
    out
  }

  /** 64-bit PERCEPTUAL audio fingerprint: bit i = energy(window i) >
    * energy(window i+1) over 65 equal windows — the dHash
    * construction on the time axis. Gain-invariant: a uniform volume
    * change scales every window energy by the same factor, preserving
    * every comparison. Windows derive from the CONTENT length (65
    * equal slices), so trims change it — re-levels don't. */
  def fingerprint64(samples: Array[Short]): Long = {
    val window = math.max(1, samples.length / 65)
    val e = windowEnergies(samples, window)
    var h = 0L; var i = 0
    while (i < 64 && i + 1 < e.length) {
      if (e(i) > e(i + 1)) h |= (1L << i)
      i += 1
    }
    h
  }
}
