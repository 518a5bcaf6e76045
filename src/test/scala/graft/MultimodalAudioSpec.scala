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

  // ---- constellation fingerprints (Multimodal.AudioFingerprint) ----

  import Multimodal.AudioFingerprint
  private val N = AudioFingerprint.WindowSize

  /** One window of a pure sine at Goertzel bin `b` (freq (b+1)/N cycles
    * per sample — window-aligned, so the bin power dominates). */
  private def toneWindow(b: Int, amp: Double = 0.5): Array[Short] =
    Array.tabulate[Short](N)(i =>
      (math.sin(2 * math.Pi * (b + 1) * i / N) * amp * 32767).toShort)

  /** Concatenate per-window bin assignments into one sample stream. */
  private def toneTrack(bins: Seq[Int]): Array[Short] =
    bins.toArray.flatMap(toneWindow(_))

  test("Goertzel peak picking identifies the authored bin per window") {
    val bins = Seq(4, 11, 4, 30, 63, 0)
    val samples = AudioFingerprint.monoSamples(wav(toneTrack(bins), 16000f, 1)).get
    AudioFingerprint.peakBins(samples).toSeq shouldBe bins
  }

  test("landmarks: shifted copy matches at a consistent time offset") {
    val bins = Seq(5, 12, 7, 21, 3, 18, 9, 44)
    val a = wav(toneTrack(bins), 16000f, 1)
    // two windows of silence prepended: same landmarks, anchors + 2
    val b = wav(new Array[Short](2 * N) ++ toneTrack(bins), 16000f, 1)
    val fpA = AudioFingerprint.fingerprints(a).get.toSet
    val fpB = AudioFingerprint.fingerprints(b).get.toSet
    fpA.map { case (fp, t) => (fp, t + 2) }.subsetOf(fpB) shouldBe true
    // a different tone sequence shares (nearly) nothing
    val c = wav(toneTrack(bins.map(x => (x + 17) % 64)), 16000f, 1)
    val fpC = AudioFingerprint.fingerprints(c).get.map(_._1).toSet
    (fpA.map(_._1) intersect fpC) shouldBe Set.empty
  }

  test("stub fingerprints: deterministic, fixed count, 18-bit range") {
    val p = "definitely not audio".getBytes("UTF-8")
    val s1 = AudioFingerprint.stub(p)
    s1 shouldBe AudioFingerprint.stub(p)
    s1.length shouldBe AudioFingerprint.StubFpPerDoc
    all(s1.map(_._1)) should (be >= 0L and be < (1L << 18))
    s1.map(_._2) shouldBe (0 until AudioFingerprint.StubFpPerDoc)
    AudioFingerprint.stub("other bytes".getBytes).map(_._1) should not be s1.map(_._1)
  }

  test("Spark fingerprint pipeline: real WAV and stub rows side by side") {
    import spark.implicits._
    val bins = Seq(2, 9, 2, 40)
    val rows = Seq(
      MediaRow(1L, "wav", wav(toneTrack(bins), 8000f, 1)),
      MediaRow(2L, "txt", "text payload".getBytes("UTF-8")))
    val out = Multimodal.audioFpRows(spark.createDataset(rows).repartition(2))
      .collect().groupBy(_.doc_id)
    // real path: 3 + 2 + 1 landmarks over 4 windows (dt 1..3)
    out(1L).length shouldBe 6
    out(1L).map(r => (r.fp, r.t)).toSet shouldBe
      AudioFingerprint.fingerprints(wav(toneTrack(bins), 8000f, 1)).get.toSet
    out(2L).length shouldBe AudioFingerprint.StubFpPerDoc
  }
}
