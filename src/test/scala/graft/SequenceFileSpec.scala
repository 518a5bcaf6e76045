package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.SequenceFileIO

/** Round-trips for the SequenceFile source (SURVEY §2.2 — Hive's
  * `STORED AS SEQUENCEFILE` + LazySimpleSerDe on-disk shape: empty
  * BytesWritable key, ctrl-A-delimited Text value, `\N` nulls). */
class SequenceFileSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-seq").toString + "/out"

  test("supplier table round-trips exactly (strings/longs/doubles)") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("supplier")
    val path = tmp()
    SequenceFileIO.write(src, path)
    val back = SequenceFileIO.read(spark, path,
      src.schema.copy(fields = src.schema.fields.map(_.copy(nullable = true))))
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
  }

  test("orders timestamps survive at microsecond precision") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("orders")
    val path = tmp()
    SequenceFileIO.write(src, path)
    val back = SequenceFileIO.read(spark, path, src.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      src.orderBy("o_orderkey").collect().toSeq)
  }

  test("nulls, decimals, dates, booleans round-trip; \\N token distinguishes null from 'N'") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("dec", DecimalType(10, 2)), StructField("d", DateType),
      StructField("b", BooleanType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "N", new java.math.BigDecimal("12.34"),
        java.sql.Date.valueOf("2024-03-01"), true),
      org.apache.spark.sql.Row(2L, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    SequenceFileIO.write(df, path)
    val back = SequenceFileIO.read(spark, path, schema).orderBy("id").collect()
    assert(back(0).getString(1) == "N", "literal string N is not null")
    assert(back(0).getDecimal(2) == new java.math.BigDecimal("12.34"))
    assert(back(0).getDate(3) == java.sql.Date.valueOf("2024-03-01"))
    assert(back(0).getBoolean(4))
    (1 to 4).foreach(i => assert(back(1).isNullAt(i), s"col $i null"))
  }

  test("Hive-written variable-width timestamp fractions parse on read") {
    // Hive's TimestampWritable trims trailing zeros and writes no
    // fraction for whole seconds; read must accept all of these even
    // though our own writer always emits 6 digits
    val cases = Seq(
      "2024-03-01 10:20:30" -> "2024-03-01T10:20:30Z",
      "2024-03-01 10:20:30.5" -> "2024-03-01T10:20:30.500Z",
      "2024-03-01 10:20:30.123" -> "2024-03-01T10:20:30.123Z",
      "2024-03-01 10:20:30.123456" -> "2024-03-01T10:20:30.123456Z",
      "2024-03-01 10:20:30.123456789" -> "2024-03-01T10:20:30.123456789Z")
    for ((txt, iso) <- cases) {
      val got = SequenceFileIO.fromText(txt, TimestampType, java8 = true)
      assert(got == java.time.Instant.parse(iso), s"parsing '$txt'")
    }
  }

  test("embedded newlines round-trip (records are length-prefixed, not line-split)") {
    val df = Seq((1L, "line1\nline2"), (2L, "\n"), (3L, "tail\n")).toDF("id", "s")
    val path = tmp()
    SequenceFileIO.write(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val back = SequenceFileIO.read(spark, path, schema).orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "line1\nline2")
    assert(back(1).getString(1) == "\n")
    assert(back(2).getString(1) == "tail\n")
  }

  test("a value containing the delimiter fails loudly instead of corrupting") {
    val df = Seq((1L, "a\u0001b")).toDF("id", "s")
    val ex = intercept[org.apache.spark.SparkException] {
      SequenceFileIO.write(df, tmp())
    }
    assert(ex.getMessage.contains("delimiter") ||
      Option(ex.getCause).exists(_.getMessage.contains("delimiter")))
  }

  test("a string equal to the null token fails loudly instead of reading back as NULL") {
    val df = Seq((1L, "\\N")).toDF("id", "s")
    val ex = intercept[org.apache.spark.SparkException] {
      SequenceFileIO.write(df, tmp())
    }
    assert(ex.getMessage.contains("null token") ||
      Option(ex.getCause).exists(_.getMessage.contains("null token")))
  }

  test("unsupported column types fail at the driver before any file is written") {
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "arr")
    val ex = intercept[IllegalArgumentException] {
      SequenceFileIO.write(df, tmp())
    }
    assert(ex.getMessage.contains("unsupported fields: arr"))
  }

  test("field serde is its own inverse on edge values (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sep = '\u0001'
    def rt(v: Any, dt: DataType): Any =
      SequenceFileIO.fromText(SequenceFileIO.toText(v, dt, sep), dt, java8 = false)
    val stringGen = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.filterNot(c => c == sep || c == '\n')),
      Gen.oneOf("\\N ", "N", "\\n", "null", "", "  spaced  ", "日本語", "\\\\N"))
    val doubleGen = Gen.oneOf(Gen.double,
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        -0.0, Double.MinPositiveValue, 1.7976931348623157e308))
    val longGen = Gen.oneOf(Gen.long, Gen.oneOf(Long.MinValue, Long.MaxValue, 0L))
    val props = Prop.all(
      Prop.forAll(stringGen) { s =>
        // the \N token itself cannot be carried — write() rejects it
        // loudly (separate test) rather than letting it read back null
        s == SequenceFileIO.NullToken || rt(s, StringType) == s
      },
      Prop.forAll(doubleGen) { d =>
        val back = rt(d, DoubleType).asInstanceOf[Double]
        java.lang.Double.compare(back, d) == 0 // NaN == NaN, -0.0 != 0.0
      },
      Prop.forAll(longGen)(l => rt(l, LongType) == l),
      Prop.forAll(Gen.choose(-719162L, 2932896L)) { epochDay =>
        val d = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay))
        rt(d, DateType) == d
      },
      Prop.forAll(Gen.choose(0L, 253402300799L), Gen.choose(0L, 999999L)) {
        (sec, micro) =>
          val t = java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(sec, micro * 1000L))
          rt(t, TimestampType) == t
      })
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), props)
    assert(res.passed, res.status.toString)
  }

  test("java8 datetime API: Instant/LocalDate rows round-trip") {
    val prev = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    try {
      spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
      val ts = java.time.Instant.parse("2024-03-01T10:20:30.123456Z")
      val d = java.time.LocalDate.parse("2024-03-01")
      val df = Seq((1L, ts, d)).toDF("id", "ts", "d")
      val path = tmp()
      SequenceFileIO.write(df, path)
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("ts", TimestampType), StructField("d", DateType)))
      val r = SequenceFileIO.read(spark, path, schema).collect()(0)
      assert(r.getAs[java.time.Instant](1) == ts)
      assert(r.getAs[java.time.LocalDate](2) == d)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
        case None => spark.conf.unset("spark.sql.datetime.java8API.enabled")
      }
    }
  }
}
