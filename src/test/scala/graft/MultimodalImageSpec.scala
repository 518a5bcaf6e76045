package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageCodec, MediaRow}

/** Pixel goldens for the REAL image half of Multimodal: programmatic
  * rasters round-tripped through PNG (lossless, so decode must
  * reproduce the source pixels exactly), driven both directly and
  * through the Spark mapPartitions pipelines. The frame stage gets the
  * same treatment through animated GIF: grayscale palettes round-trip
  * losslessly, so per-frame mean luma is pinned exactly. */
class MultimodalImageSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark

  /** Deterministic RGB test raster. */
  private def raster(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 101) % 256 << 16) |
        ((x * 59 + y * 13) % 256 << 8) | ((x * 7 + y * 211) % 256))
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Reference luma: integer BT.601, same definition as the codec. */
  private def luma(img: BufferedImage, x: Int, y: Int): Double = {
    val v = img.getRGB(x, y)
    (299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) + 114 * (v & 0xff)) / 1000.0
  }

  test("PNG decode reproduces source dims, mean luma, and histogram exactly") {
    val img = raster(7, 5)
    val d = ImageCodec.decode(png(img)).get
    d.width shouldBe 7
    d.height shouldBe 5
    // PNG is lossless: decoded pixels == source pixels, bit-exactly
    val lums = for (y <- 0 until 5; x <- 0 until 7) yield luma(img, x, y)
    d.meanLuma shouldBe lums.sum / 35.0
    val expectHist = new Array[Float](8)
    lums.foreach(l => expectHist(math.min(7, l.toInt >> 5)) += 1f / 35f)
    d.hist.toSeq shouldBe expectHist.toSeq
    d.hist.map(_.toDouble).sum shouldBe 1.0 +- 1e-6
  }

  test("nearest-neighbor resize: identity == full mean; 2x2 golden by hand") {
    val img = raster(4, 4)
    val p = png(img)
    val full = (for (y <- 0 until 4; x <- 0 until 4) yield luma(img, x, y)).sum / 16.0
    ImageCodec.resizeMean(p, 4, 4).get shouldBe ((4, 4, full))
    // 2x2 NN samples source indices {0,2} x {0,2}
    val nn = (luma(img, 0, 0) + luma(img, 2, 0) + luma(img, 0, 2) + luma(img, 2, 2)) / 4.0
    ImageCodec.resizeMean(p, 2, 2).get shouldBe ((4, 4, nn))
  }

  test("JPEG decodes via the same path (dims exact, luma in range)") {
    val img = raster(16, 9)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val d = ImageCodec.decode(bos.toByteArray).get
    (d.width, d.height) shouldBe ((16, 9))
    d.meanLuma should (be >= 0.0 and be <= 255.0)
  }

  test("BMP decodes losslessly; GIF decodes with exact dims") {
    val img = raster(5, 7)
    val bmp = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bmp)
    val d = ImageCodec.decode(bmp.toByteArray).get
    (d.width, d.height) shouldBe ((5, 7))
    // BMP is uncompressed RGB: decode must reproduce source luma exactly
    val expect = (for (y <- 0 until 7; x <- 0 until 5) yield luma(img, x, y)).sum / 35.0
    d.meanLuma shouldBe expect
    val gif = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", gif)
    val g = ImageCodec.decode(gif.toByteArray).get
    (g.width, g.height) shouldBe ((5, 7))  // GIF palettizes: dims only
    g.meanLuma should (be >= 0.0 and be <= 255.0)
  }

  /** Grayscale frame over an EXPLICIT 256-gray IndexColorModel: the GIF
    * writer keeps an indexed image's own palette verbatim (an RGB input
    * would be quantized to the writer's fixed palette), so the
    * round-trip is lossless and luma(v,v,v) = v by the integer BT.601
    * weights (299+587+114=1000). Frames are SINGLE-ROW (h=1): the JDK
    * writer's default metadata claims interlacing it does not perform,
    * so readers de-interlace rows that were stored progressively —
    * scrambling and even zero-dropping rows of taller rasters. One row
    * has exactly one interlace position, so the authored bytes decode
    * exactly while still exercising 16 distinct levels per frame. */
  private def grayFrame(w: Int, seed: Int): BufferedImage = {
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(w, 1, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (x <- 0 until w) {
      val v = ((x * 5 + seed * 7) % 16) * 16 // 16 gray levels
      img.setRGB(x, 0, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  // ----------------------------------------------------------------
  // Minimal SPEC-COMPLETE Motion-JPEG AVI builder (Microsoft RIFF/AVI
  // grammar): RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){strh,strf} },
  // LIST(movi){ '00dc' jpeg ... } }. Sizes little-endian u32, chunks
  // padded to even — a file any AVI parser accepts, not just ours.
  // ----------------------------------------------------------------
  private def mjpegAvi(jpegs: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def u32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      cc(id) ++ u32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ body)
    val n = jpegs.length
    val avih = u32(40000) ++ u32(0) ++ u32(0) ++ u32(0x10) ++ u32(n) ++
      u32(0) ++ u32(1) ++ u32(0) ++ u32(w) ++ u32(h) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val strh = cc("vids") ++ cc("MJPG") ++ u32(0) ++ u16(0) ++ u16(0) ++
      u32(0) ++ u32(1) ++ u32(25) ++ u32(0) ++ u32(n) ++ u32(0) ++
      u32(0xffffffff) ++ u32(0) ++ u16(0) ++ u16(0) ++ u16(w) ++ u16(h)
    val strf = u32(40) ++ u32(w) ++ u32(h) ++ u16(1) ++ u16(24) ++
      cc("MJPG") ++ u32(w * h * 3) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val payload = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ u32(payload.length) ++ payload
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG AVI frames decode exactly like their JPEG payloads") {
    val srcs = (0 until 4).map(_ => raster(16, 12))
    val js = srcs.map(jpeg)
    val avi = mjpegAvi(js, 16, 12)
    val fs = Multimodal.FrameCodec.aviFrames(avi).get
    fs.length shouldBe 4
    js.zip(fs).foreach { case (j, f) =>
      (f.width, f.height) shouldBe ((16, 12))
      // same ImageIO JPEG decode + lumaGrid both ways: exact equality
      val ref = Multimodal.ImageCodec.decode(j).get
      f.meanLuma shouldBe ref.meanLuma
    }
    // anyFrames routes AVI through the same surface as GIF
    Multimodal.FrameCodec.anyFrames(avi).get.length shouldBe 4
  }

  test("AVI sniff and degrade: non-AVI and truncated payloads fall back") {
    Multimodal.FrameCodec.aviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")) shouldBe None
    Multimodal.FrameCodec.aviFrames(jpeg(raster(8, 8))) shouldBe None
    val avi = mjpegAvi((0 until 3).map(_ => jpeg(raster(8, 8))), 8, 8)
    // truncation mid-movi: parser must degrade to None, never throw
    Multimodal.FrameCodec.aviFrames(avi.take(avi.length / 2)) match {
      case None => ()
      case Some(fs) => assert(fs.nonEmpty) // partial decode is also acceptable
    }
  }

  test("frame pipeline treats AVI as a real video container, not a stub") {
    import spark.implicits._
    val js = (0 until 6).map(_ => jpeg(raster(10, 10)))
    val rows = Seq(Multimodal.MediaRow(9L, "avi", mjpegAvi(js, 10, 10)))
    val out = Multimodal.frameRows(spark.createDataset(rows), everyN = 2)
      .collect().sortBy(_.frame_idx)
    out.map(_.frame_idx).toSeq shouldBe Seq(0, 2, 4)
    out.foreach(_.n_frames shouldBe 6)
    val ref = Multimodal.ImageCodec.decode(js.head).get
    out.head.frame_feat shouldBe ref.meanLuma / 256.0
  }

  test("animated GIF frames: exact count and per-frame mean luma goldens") {
    val srcs = (0 until 5).map(i => grayFrame(6, i))
    val gif = animatedGif(srcs)
    val fs = Multimodal.FrameCodec.frames(gif).get
    fs.length shouldBe 5
    srcs.zip(fs).foreach { case (src, f) =>
      (f.width, f.height) shouldBe ((6, 1))
      val expect = (0 until 6).map(x => luma(src, x, 0)).sum / 6.0
      f.meanLuma shouldBe expect // lossless gray palette: exact
    }
    // a single-frame GIF is a 1-frame sequence, not a fallback
    Multimodal.FrameCodec.frames(animatedGif(srcs.take(1))).get.length shouldBe 1
  }

  test("frame pipeline: every-Nth sampling over real GIF frames, stub for text") {
    import spark.implicits._
    val srcs = (0 until 7).map(i => grayFrame(4, i))
    val rows = Seq(
      Multimodal.MediaRow(1L, "gif", animatedGif(srcs)),
      Multimodal.MediaRow(2L, "txt", "not a video".getBytes("UTF-8")))
    val out = Multimodal.frameRows(spark.createDataset(rows), everyN = 3)
      .collect().sortBy(r => (r.doc_id, r.frame_idx))
    // GIF: frames 0,3,6 of 7, feat = exact meanLuma/256
    val gifRows = out.filter(_.doc_id == 1L)
    gifRows.map(_.frame_idx).toSeq shouldBe Seq(0, 3, 6)
    gifRows.foreach { r =>
      r.n_frames shouldBe 7
      val src = srcs(r.frame_idx)
      val expect = (0 until 4).map(x => luma(src, x, 0)).sum / 4.0 / 256.0
      r.frame_feat shouldBe expect
    }
    // text: documented deterministic stub path
    val txtRows = out.filter(_.doc_id == 2L)
    val n = Multimodal.FakeCodec.frameCount(rows(1).payload)
    txtRows.map(_.frame_idx).toSeq shouldBe (0 until n by 3)
    txtRows.foreach(r =>
      r.frame_feat shouldBe Multimodal.FakeCodec.frameFeature(rows(1).payload, r.frame_idx))
  }

  test("corrupt GIF payloads degrade to the stub frame path, not a task failure") {
    val truncated = animatedGif((0 until 3).map(i => grayFrame(8, i))).take(30)
    Multimodal.FrameCodec.isGif(truncated) shouldBe true
    Multimodal.FrameCodec.frames(truncated) shouldBe None
    Multimodal.FrameCodec.frames("plain text".getBytes) shouldBe None
  }

  test("magic sniff: text payloads never reach ImageIO") {
    ImageCodec.isImage("just some document text".getBytes) shouldBe false
    ImageCodec.decode("just some document text".getBytes) shouldBe None
    ImageCodec.isImage(png(raster(2, 2))) shouldBe true
  }

  test("corrupt image payloads degrade to the non-image path, not a task failure") {
    // valid PNG magic, truncated/garbage body — the 100 TB crawl reality
    val truncated = png(raster(8, 8)).take(20)
    ImageCodec.isImage(truncated) shouldBe true
    ImageCodec.decode(truncated) shouldBe None
    ImageCodec.resizeMean(truncated, 2, 2) shouldBe None
    val garbage = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](64)(0x5a)
    ImageCodec.decode(garbage) shouldBe None
    // and through the Spark pipeline: stub fallback, no exception
    import spark.implicits._
    val out = Multimodal.decodeRows(
      spark.createDataset(Seq(MediaRow(9L, "png", truncated)))).collect()
    out.length shouldBe 1
    val (sw, sh, smean) = Multimodal.FakeCodec.decode(truncated)
    (out(0).width, out(0).height, out(0).mean_byte) shouldBe ((sw, sh, smean))
  }

  test("Spark decode pipeline: real codec for images, stub fallback for text") {
    import spark.implicits._
    val img = raster(6, 4)
    val rows = Seq(
      MediaRow(1L, "png", png(img)),
      MediaRow(2L, "txt", "plain text payload".getBytes("UTF-8")))
    val out = Multimodal.decodeRows(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.doc_id)
    // image row: true dims + exact mean luma
    out(0).width shouldBe 6
    out(0).height shouldBe 4
    val expect = (for (y <- 0 until 4; x <- 0 until 6) yield luma(img, x, y)).sum / 24.0
    out(0).mean_byte shouldBe expect
    out(0).feat.map(_.toDouble).sum shouldBe 1.0 +- 1e-6
    // text row: falls back to the documented stub
    val (sw, sh, smean) = Multimodal.FakeCodec.decode(rows(1).payload)
    (out(1).width, out(1).height, out(1).mean_byte) shouldBe ((sw, sh, smean))
  }

  test("Spark resize pipeline: real NN resample for images") {
    import spark.implicits._
    val img = raster(8, 8)
    val rows = Seq(MediaRow(1L, "png", png(img)))
    val out = Multimodal.resizeRows(spark.createDataset(rows), 4, 4).collect().head
    (out.src_width, out.src_height, out.width, out.height) shouldBe ((8, 8, 4, 4))
    val nn = (for (j <- 0 until 4; i <- 0 until 4)
      yield luma(img, i * 8 / 4, j * 8 / 4)).sum / 16.0
    out.mean_resized shouldBe nn
  }

  /** Reference dHash recomputed from source pixels: 9×8 NN grid, bit
    * (r·8+c) set iff grid[r][c+1] > grid[r][c]. */
  private def refDHash(img: BufferedImage): Long = {
    val w0 = img.getWidth; val h0 = img.getHeight
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val sj = r * h0 / 8
      val a = luma(img, c * w0 / 9, sj)
      val b = luma(img, (c + 1) * w0 / 9, sj)
      if (b > a) h |= 1L << (r * 8 + c)
    }
    h
  }

  test("dHash golden: exact bits from source pixels; scale-invariant on NN-upscaled copy") {
    val img = raster(18, 16)
    ImageCodec.dHash(png(img)).get shouldBe refDHash(img)
    // dHash's point: a clean 2x nearest-neighbor upscale preserves the
    // 9x8 comparison grid exactly, so the hash is IDENTICAL
    val up = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36)
      up.setRGB(x, y, img.getRGB(x / 2, y / 2))
    ImageCodec.dHash(png(up)).get shouldBe ImageCodec.dHash(png(img)).get
  }

  test("dHash near-dup: small local edit stays within Hamming 10; different raster is far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val img = raster(18, 16)
    val h0 = ImageCodec.dHash(png(img)).get
    // flip one 2x2 block to white — at most a couple of comparison
    // cells change
    val edited = raster(18, 16)
    for (y <- 0 until 2; x <- 0 until 2) edited.setRGB(x, y, 0xffffff)
    val h1 = ImageCodec.dHash(png(edited)).get
    assert(hamming(h0, h1) <= 10, s"local edit moved ${hamming(h0, h1)} bits")
    // an unrelated raster lands far away
    val other = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18)
      other.setRGB(x, y, ((x * 211 + y * 17) % 256 << 16) |
        ((x * 3 + y * 97) % 256 << 8) | ((x * 131 + y * 41) % 256))
    val h2 = ImageCodec.dHash(png(other)).get
    assert(hamming(h0, h2) > 10, s"unrelated raster too close: ${hamming(h0, h2)}")
  }

  test("Spark phash pipeline: real dHash for images, replicable stub for text") {
    import spark.implicits._
    val img = raster(18, 16)
    val txt = "plain text payload".getBytes("UTF-8")
    val rows = Seq(MediaRow(1L, "png", png(img)), MediaRow(2L, "txt", txt))
    val out = Multimodal.phashRows(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.doc_id)
    out(0).dhash shouldBe refDHash(img)
    out(1).dhash shouldBe Multimodal.FakeCodec.dHash(txt)
  }
}
