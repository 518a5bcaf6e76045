package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioCodec, MediaRow}

/** PCM goldens for the REAL audio half of Multimodal: programmatic
  * 16-bit sample arrays round-tripped through WAV (lossless, so decode
  * must reproduce the authored samples exactly), driven directly and
  * through the Spark pipeline. */
class MultimodalAudioSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark

  /** Author a PCM16 little-endian WAV from raw samples. */
  private def wav(samples: Array[Short], rate: Float, channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Reference stats, same definitions as the codec. */
  private def refRms(samples: Array[Short]): Double = {
    var sumSq = 0.0
    samples.foreach { s => val v = s / 32768.0; sumSq += v * v }
    math.sqrt(sumSq / samples.length)
  }

  test("WAV decode reproduces format params and exact RMS (square wave)") {
    // a=16384 square wave: |s|/32768 = 0.5 for every sample -> rms 0.5
    val sq = Array.tabulate[Short](800)(i => if (i % 2 == 0) 16384 else -16384)
    val a = AudioCodec.decode(wav(sq, 8000f, 1)).get
    a.sampleRate shouldBe 8000
    a.channels shouldBe 1
    a.nFrames shouldBe 800L
    a.rms shouldBe 0.5
    // all samples fall in the |0.5| bin (bin 4 = [0.5, 0.625))
    a.hist(4) shouldBe 1.0f
  }

  test("sine wave RMS matches the sample-exact reference; stereo channels seen") {
    val sine = Array.tabulate[Short](2000)(i =>
      (math.sin(2 * math.Pi * i / 50.0) * 12000).toShort)
    val mono = AudioCodec.decode(wav(sine, 16000f, 1)).get
    mono.rms shouldBe refRms(sine)           // PCM lossless: bit-exact
    mono.hist.map(_.toDouble).sum shouldBe 1.0 +- 1e-6
    val stereo = AudioCodec.decode(wav(sine, 16000f, 2)).get
    stereo.channels shouldBe 2
    stereo.nFrames shouldBe 1000L            // 2000 samples / 2 channels
    stereo.rms shouldBe refRms(sine)         // same sample stream
  }

  test("sniff and corrupt payloads: text and truncated WAV degrade to None") {
    AudioCodec.isAudio("plain text".getBytes) shouldBe false
    AudioCodec.decode("plain text".getBytes) shouldBe None
    val w = wav(Array.tabulate[Short](100)(_.toShort), 8000f, 1)
    AudioCodec.isAudio(w) shouldBe true
    AudioCodec.decode(w.take(16)) shouldBe None   // RIFF magic, truncated body
  }

  test("Spark audio pipeline: decodable rows kept with exact stats, text dropped") {
    import spark.implicits._
    val sq = Array.tabulate[Short](400)(i => if (i % 2 == 0) 8192 else -8192)
    val rows = Seq(
      MediaRow(1L, "wav", wav(sq, 44100f, 1)),
      MediaRow(2L, "txt", "not audio at all".getBytes("UTF-8")))
    val out = Multimodal.audioRows(spark.createDataset(rows).repartition(2)).collect()
    out.length shouldBe 1
    out.head.doc_id shouldBe 1L
    out.head.sample_rate shouldBe 44100
    out.head.rms shouldBe 0.25              // 8192/32768 exactly
    out.head.feat(2) shouldBe 1.0f          // |0.25| bin
  }
}
