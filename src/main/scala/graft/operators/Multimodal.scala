package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `FakeCodec.decode` is a
  * clearly-marked DETERMINISTIC STUB (derives "pixels" from payload
  * bytes); everything around it — binary column handling, the typed
  * Dataset schema, mapPartitions batching, partition-parallel execution,
  * bounded per-row state — is the real Spark plumbing a production
  * decode (JNI codec / Pandas UDF over Arrow batches) would use
  * unchanged. At 100 TB this is a narrow map stage: no shuffle, codecs
  * amortized per partition, output columnar.
  */
object Multimodal {

  /** Input: media row with opaque payload. */
  case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])
  /** Output: decoded metadata + an 8-dim feature vector. */
  case class DecodedRow(doc_id: Long, fmt: String, width: Int, height: Int,
                        mean_byte: Double, feat: Array[Float])

  /** STUB: stands in for an image/audio codec (none in this container).
    * Deterministic in the payload bytes so results are testable. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val w = 16 + (math.abs(payload.length * 31) % 64)
      // floorMod keeps the Long in [0,64) BEFORE the Int narrowing —
      // abs(hash).toInt is negative whenever bit 31 is set
      val h = 16 + java.lang.Math.floorMod(Hashing.hash64(payload, 0, payload.length, 7L), 64L).toInt
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
      (w, h, mean)
    }
    /** "Feature extractor": 8 seeded-hash projections of the payload. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var s = 0
      while (s < 8) {
        val h = Hashing.hash64(payload, 0, payload.length, 100L + s)
        out(s) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        s += 1
      }
      out
    }
  }

  /** The decode pipeline: binary column in, typed decoded Dataset out.
    * mapPartitions so a real codec would init once per partition. */
  def decodePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.register(spark, sfDir)
    import spark.implicits._
    val media = spark.table("documents")
      .select(col("doc_id"), col("lang").as("fmt"),
        col("text").cast("binary").as("payload"))
      .repartition(32) // small file scans as 1 partition; decode is per-row CPU
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val (w, h, mean) = FakeCodec.decode(r.payload)
        DecodedRow(r.doc_id, r.fmt, w, h, mean, FakeCodec.features(r.payload))
      }
    }.toDF()
  }

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Deterministic stub output — no SQL oracle (custom hashing);
    // MultimodalSpec asserts schema, determinism, and batch behavior.
    "multimodal_decode" -> ((spark, sfDir) => {
      decodePipeline(spark, sfDir)
        .select(col("doc_id"), col("fmt"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(aggregate(col("feat"), lit(0.0d), (acc, x) => acc + x * x), 6).as("feat_sq_norm"))
        .orderBy(col("doc_id"))
    }),

    // The metadata side IS oracle-checkable: byte lengths + digests of
    // the binary payload.
    "multimodal_meta" -> Tables.sql("""
      SELECT doc_id,
             OCTET_LENGTH(CAST(text AS BINARY)) AS n_bytes,
             MD5(CAST(text AS BINARY)) AS digest,
             lang AS fmt
      FROM documents
      ORDER BY doc_id""")
  )

  val oracle: Map[String, String] = Map(
    "multimodal_meta" -> """
      SELECT doc_id,
             OCTET_LENGTH(ENCODE(text)) AS n_bytes,
             MD5(text) AS digest,
             lang AS fmt
      FROM documents
      ORDER BY doc_id"""
  )
}
