package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioCodec, Multimodal}

/** Golden-sample pinning of the real audio codec (the audio sibling
  * of ImageCodecSpec): the committed WAV fixture's bytes never
  * change, so these assertions pin the RIFF chunk-walk decoder
  * returning bit-exact samples on every JVM, plus the perceptual
  * fingerprint's defining properties — gain invariance (a re-leveled
  * re-upload keeps its fingerprint; a byte hash would break) and
  * content sensitivity. */
class AudioCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("committed WAV fixture decodes to the exact per-sample formula") {
    val w = AudioCodec.decodeWav(fixture("wav_seed5_9000x1305x1.wav"))
    assert(w.sampleRate == 9000 && w.channels == 1 && w.nFrames == 1305)
    for (i <- w.samples.indices)
      assert(w.samples(i) == AudioCodec.sample(5L, i), s"sample $i")
    assert(AudioCodec.fingerprint64(w.samples) == 0x2aaaeca266514eaeL)
  }

  test("encode/decode roundtrip is sample-faithful at corpus params") {
    for (seed <- Seq(0L, 6L, 41L, 499L)) {
      val (sr, nf, ch) = (Multimodal.audioRate(seed),
        Multimodal.audioFrames(seed), Multimodal.audioChannels(seed))
      val w = AudioCodec.decodeWav(AudioCodec.encodeWav(seed, sr, nf, ch))
      assert(w.sampleRate == sr && w.nFrames == nf && w.channels == ch)
      for (i <- 0 until math.min(w.samples.length, 200))
        assert(w.samples(i) == AudioCodec.sample(seed, i))
    }
  }

  test("the chunk walk survives extra RIFF chunks before fmt/data") {
    // splice a LIST chunk between WAVE and fmt — real encoders do this
    val base = AudioCodec.encodeWav(9L, 8000, 200, 1)
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")).array()
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val w = AudioCodec.decodeWav(spliced)
    assert(w.sampleRate == 8000 && w.nFrames == 200)
    assert(w.samples(0) == AudioCodec.sample(9L, 0))
  }

  test("fingerprint is gain-invariant but content-sensitive") {
    val w = AudioCodec.decodeWav(AudioCodec.encodeWav(77L, 8000, 1500, 1))
    val fp = AudioCodec.fingerprint64(w.samples)
    // samples are even by construction, so half gain is EXACT — every
    // window energy scales by exactly 1/4, preserving each comparison
    val half = w.samples.map(s => (s / 2).toShort)
    assert(AudioCodec.fingerprint64(half) == fp, "gain invariance")
    val other = AudioCodec.decodeWav(AudioCodec.encodeWav(78L, 8000, 1500, 1))
    assert(AudioCodec.fingerprint64(other.samples) != fp)
  }

  test("non-PCM and truncated payloads are rejected loudly") {
    val good = AudioCodec.encodeWav(1L, 8000, 100, 1)
    val mulaw = good.clone()
    java.nio.ByteBuffer.wrap(mulaw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 7) // format 7
    val e1 = intercept[IllegalArgumentException] { AudioCodec.decodeWav(mulaw) }
    assert(e1.getMessage.contains("format code"))
    val e2 = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(good.take(30)) }
    assert(e2.getMessage.toLowerCase.contains("trunc"))
    val e3 = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("not audio at all".getBytes("US-ASCII")) }
    assert(e3.getMessage.contains("RIFF"))
    // hostile chunk length near Int.MaxValue: int arithmetic would
    // wrap `pos + 8 + len` negative, pass the guard, and die later as
    // a negative-size allocation — must be the loud truncation error
    val hostile = good.clone()
    java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 4) // fmt chunk claims ~2 GiB
    val e4 = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(hostile) }
    assert(e4.getMessage.toLowerCase.contains("trunc"))
  }
}
