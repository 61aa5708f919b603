package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Real-audio decode through the JDK's `javax.sound.sampled`: rate,
  * frame count, channels, and the loudness envelope must come from the
  * actual PCM samples, and re-containering / re-quantizing the SAME
  * signal must land within aHash Hamming ≤ 3 (identical for lossless
  * re-containering) — the audio leg of the perceptual-dedup channel.
  */
class MultimodalAudioSpec extends SparkSpec {
  import spark.implicits._

  private val Rate = 8000
  private val Frames = 8000

  /** Deterministic test signal: an alternating-sign carrier under a
    * linear amplitude ramp, so each envelope cell's mean |amplitude|
    * is (piecewise) the ramp itself — monotone over time, which keeps
    * at most one aHash segment near the global mean (the image spec's
    * gradient argument, transposed to audio). */
  private def sample(i: Int): Int = {
    val amp = math.min(i * 3, 24000)
    if (i % 2 == 0) amp else -amp
  }

  private def pcm16(bigEndian: Boolean): Array[Byte] = {
    val b = new Array[Byte](Frames * 2)
    for (i <- 0 until Frames) {
      val v = sample(i)
      val (lo, hi) = (v & 0xff, (v >> 8) & 0xff)
      if (bigEndian) { b(2 * i) = hi.toByte; b(2 * i + 1) = lo.toByte }
      else { b(2 * i) = lo.toByte; b(2 * i + 1) = hi.toByte }
    }
    b
  }

  private def encode(pcm: Array[Byte], bits: Int, bigEndian: Boolean,
      container: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      Rate.toFloat, bits, 1, true, bigEndian)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, Frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, container, baos)
    baos.toByteArray
  }

  private val WAVE = javax.sound.sampled.AudioFileFormat.Type.WAVE
  private val AIFF = javax.sound.sampled.AudioFileFormat.Type.AIFF

  test("AudioSystem decode emits true rate, frames, channels, and envelope") {
    val wav = encode(pcm16(bigEndian = false), 16, bigEndian = false, WAVE)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav),
      // audio MIME but unparseable payload -> stub arm
      Multimodal.MediaRecord(2L, "audio/wav", Array.fill(100)(7.toByte))
    ).toDS()
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).width == Rate && feats(1L).height == Frames)
    assert(feats(1L).channels == 1)
    val f = feats(1L).feature
    assert(f.length == 8)
    // ramped amplitude: every earlier segment quieter than every later
    assert((0 until 7).forall(i => f(i) < f(i + 1)),
      s"envelope must follow the amplitude ramp: ${f.toSeq}")
    // stub arm: byte-length-derived dimensions
    assert(feats(2L).width == 16 + (100 % 64) && feats(2L).channels == 3)
  }

  test("re-containering identical, re-quantizing within aHash Hamming <= 3") {
    val wav16 = encode(pcm16(bigEndian = false), 16, bigEndian = false, WAVE)
    // same samples, big-endian PCM in an AIFF container
    val aiff16 = encode(pcm16(bigEndian = true), 16, bigEndian = true, AIFF)
    // 8-bit re-quantization of the same signal (signed PCM)
    val pcm8 = Array.tabulate(Frames)(i => (sample(i) >> 8).toByte)
    val wav8 = encode(pcm8, 8, bigEndian = false, WAVE)
    val sWav = Multimodal.AudioCodec.envelopeString(wav16).get
    val sAiff = Multimodal.AudioCodec.envelopeString(aiff16).get
    assert(sWav == sAiff,
      "lossless re-containering must decode to the identical envelope")
    val media = Seq((1L, sWav), (3L, Multimodal.AudioCodec.envelopeString(wav8).get))
      .toDF("media_id", "env")
    val h = Multimodal.aHashed(media, col("env"), col("media_id"))
      .as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(hamming <= 3,
      s"8-bit re-quantization drifted $hamming aHash bits (> 3)")
  }

  test("envelope cells are deterministic and cap at 4096") {
    val wav = encode(pcm16(bigEndian = false), 16, bigEndian = false, WAVE)
    val a = Multimodal.AudioCodec.envelopeString(wav).get
    val b = Multimodal.AudioCodec.envelopeString(wav).get
    assert(a == b && a.length == 4096)
    val tiny = encode(pcm16(bigEndian = false).take(200), 16,
      bigEndian = false, WAVE) // 100 frames < 4096 cells
    assert(Multimodal.AudioCodec.envelopeString(tiny).get.length == 100)
  }
}
