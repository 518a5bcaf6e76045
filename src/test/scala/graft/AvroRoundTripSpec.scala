package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvroIO

/** Round-trips for the hand-built Avro source (SURVEY §2.2 — the
  * spark-avro module is absent from this distro, so AvroIO sits directly
  * on avro-core/avro-mapred). */
class AvroRoundTripSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro").toString + "/out"

  test("supplier table round-trips exactly (strings/longs/doubles)") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("supplier")
    val path = tmp()
    AvroIO.write(src, path)
    val back = AvroIO.read(spark, path)
    assert(back.schema == src.schema.copy(fields =
      src.schema.fields.map(_.copy(nullable = true))))
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
  }

  test("logical types, binary, arrays, and nulls round-trip") {
    val df = Seq(
      (1L, Some("a"), Some(java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")),
        Some(java.sql.Date.valueOf("2024-03-01")), Some(Array[Byte](1, 2, 3)), Seq("x", "y")),
      (2L, None, None, None, None, Seq.empty[String])
    ).toDF("id", "s", "ts", "d", "bin", "arr")
    val path = tmp()
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path).orderBy("id").collect()
    val r1 = back(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "a")
    assert(r1.getTimestamp(2) == java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456"),
      s"micros precision must survive, got ${r1.getTimestamp(2)}")
    assert(r1.getDate(3) == java.sql.Date.valueOf("2024-03-01"))
    assert(r1.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getSeq[String](5) == Seq("x", "y"))
    val r2 = back(1)
    assert(r2.getLong(0) == 2L)
    (1 to 4).foreach(i => assert(r2.isNullAt(i), s"col $i should be null"))
    assert(r2.getSeq[String](5).isEmpty)
  }

  test("java8 datetime API: Instant/LocalDate rows round-trip") {
    val prev = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    try {
      spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
      val ts = java.time.Instant.parse("2024-03-01T10:20:30.123456Z")
      val d = java.time.LocalDate.parse("2024-03-01")
      val df = Seq((1L, ts, d)).toDF("id", "ts", "d")
      val path = tmp()
      AvroIO.write(df, path)
      val r = AvroIO.read(spark, path).collect()(0)
      assert(r.getAs[java.time.Instant](1) == ts)
      assert(r.getAs[java.time.LocalDate](2) == d)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
      case None => spark.conf.unset("spark.sql.datetime.java8API.enabled")
    }
  }

  test("multi-partition write produces one container per task, read merges them") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      .repartition(4)
    val path = tmp()
    AvroIO.write(src, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, s"expected 4 containers, got ${files.length}")
    val back = AvroIO.read(spark, path)
    assert(back.count() == src.count())
    assert(back.agg(org.apache.spark.sql.functions.sum($"o_orderkey")).collect()(0).getLong(0) ==
      src.agg(org.apache.spark.sql.functions.sum($"o_orderkey")).collect()(0).getLong(0))
  }
}
