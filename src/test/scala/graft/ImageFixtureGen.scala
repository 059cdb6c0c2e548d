package graft

import java.nio.file.{Files, Paths}

import graft.operators.ImageCodec

/** Writes the committed golden-pixel fixtures under
  * `src/test/resources/graft/` and prints the golden constants the
  * ImageCodecSpec pins (dHash/aHash/resized pixels). Re-run after any
  * deliberate codec-math change; the committed PNG BYTES never change
  * (they pin cross-JDK decode stability), only the printed constants
  * would.
  *
  *   sbt "Test/runMain graft.ImageFixtureGen"
  */
object ImageFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/graft")
    Files.createDirectories(dir)
    for ((seed, w, h) <- Seq((3L, 8, 6), (4L, 10, 7))) {
      val png = ImageCodec.encodePng(seed, w, h)
      val f = dir.resolve(s"img_seed${seed}_${w}x$h.png")
      Files.write(f, png)
      val img = ImageCodec.decode(png)
      println(s"$f bytes=${png.length} dims=${img.getWidth}x${img.getHeight}")
      println(f"  aHash=0x${ImageCodec.aHash64(img)}%016x")
      println(f"  dHash=0x${ImageCodec.dHash64(img)}%016x")
      val rs = ImageCodec.bilinearResize(img, 4, 3)
      val px = for (y <- 0 until 3; x <- 0 until 4)
        yield rs.getRGB(x, y) & 0xffffff
      println(s"  resized4x3=${px.map(p => f"0x$p%06x").mkString(", ")}")
    }
    // audio fixture: seed 5, 9000 Hz, 1305 frames, mono
    val wav = graft.operators.AudioCodec.encodeWav(5L, 9000, 1305, 1)
    val wf = dir.resolve("wav_seed5_9000x1305x1.wav")
    Files.write(wf, wav)
    val dec = graft.operators.AudioCodec.decodeWav(wav)
    println(s"$wf bytes=${wav.length} rate=${dec.sampleRate} " +
      s"ch=${dec.channels} frames=${dec.nFrames}")
    println(f"  afp=0x${graft.operators.AudioCodec.fingerprint64(dec.samples)}%016x")
  }
}
