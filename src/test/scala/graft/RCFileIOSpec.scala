package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.RCFileIO

/** RCFile source (SURVEY §2.2 — Hive `QL/io/RCFile.java` via Hive's own
  * input/output formats on the classpath): round-trips, null tokens,
  * format-level column pruning, and the compressed-column-group path. */
class RCFileIOSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-rcfile").toString + "/out"

  test("supplier table round-trips exactly through Hive's RCFile classes") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("supplier")
    val path = tmp()
    RCFileIO.write(src, path)
    val back = RCFileIO.read(spark, path, src.schema)
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
  }

  test("column-pruned read returns exactly the projected values") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("nation")
    val path = tmp()
    RCFileIO.write(src, path)
    val pruned = RCFileIO.read(spark, path, src.schema,
      columns = Some(Seq("n_name", "n_nationkey")))
    // projection order is the caller's, not the file's
    assert(pruned.schema.fieldNames.toSeq == Seq("n_name", "n_nationkey"))
    val want = src.select("n_name", "n_nationkey").orderBy("n_nationkey")
      .collect().toSeq
    assert(pruned.orderBy("n_nationkey").collect().toSeq == want)
  }

  test("nulls, decimals, dates round-trip; compressed groups read back") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("dec", DecimalType(10, 2)), StructField("d", DateType),
      StructField("b", BooleanType)))
    val rows = Seq(
      Row(1L, "N", new java.math.BigDecimal("12.34"),
        java.sql.Date.valueOf("2024-03-01"), true),
      Row(2L, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    for (compress <- Seq(false, true)) {
      val path = tmp()
      RCFileIO.write(df, path, compress = compress)
      val back = RCFileIO.read(spark, path, schema).orderBy("id").collect()
      assert(back(0).getString(1) == "N", "literal string N is not null")
      assert(back(0).getDecimal(2) == new java.math.BigDecimal("12.34"))
      assert(back(0).getDate(3) == java.sql.Date.valueOf("2024-03-01"))
      assert(back(0).getBoolean(4))
      (1 to 4).foreach(i => assert(back(1).isNullAt(i), s"col $i null (compress=$compress)"))
    }
  }

  test("driver query: pruned RCFile aggregate equals the parquet source") {
    val got = SparkEntry.queries("source_rcfile_scan")(spark, LocalSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    Tables.register(spark, LocalSpark.sf)
    val want = spark.sql("""
      SELECT s_nationkey, CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
