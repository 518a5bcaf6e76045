package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SymlinkTextIO

/** SymlinkTextInputFormat analog (SymlinkTextIO.scala header). */
class SymlinkTextIOSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(p: Path, content: String): Unit = {
    val fs = fsFor(p)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(content.getBytes("UTF-8")); out.close()
  }

  test("resolve: explicit file, glob, directory, duplicate-line dedup") {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"), "symlink_spec1")
    val fs = fsFor(base)
    fs.delete(base, true)
    writeFile(new Path(base, "data/a.txt"), "a1\na2")
    writeFile(new Path(base, "data/b.txt"), "b1")
    writeFile(new Path(base, "more/c.txt"), "c1\nc2\nc3")
    val manifest = new Path(base, "table")
    writeFile(new Path(manifest, "link_0"),
      s"""$base/data/a.txt
         |$base/data/b*.txt
         |$base/more
         |$base/data/a.txt
         |""".stripMargin)
    // a hidden manifest sibling must be ignored (Hive skips _ and .)
    writeFile(new Path(manifest, "_meta"), s"$base/data/b.txt")
    val targets = SymlinkTextIO.resolve(spark, manifest.toString)
    assert(targets.size == 3, targets) // a once, b via glob, c via dir
    assert(SymlinkTextIO.readText(spark, manifest.toString).count() == 6)
  }

  test("resolve: missing literal target fails loudly, missing glob is empty") {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"), "symlink_spec2")
    val fs = fsFor(base)
    fs.delete(base, true)
    writeFile(new Path(base, "data/a.txt"), "x")
    val okGlob = new Path(base, "t1")
    writeFile(new Path(okGlob, "link_0"),
      s"$base/data/a.txt\n$base/nowhere/*.txt")
    assert(SymlinkTextIO.resolve(spark, okGlob.toString).size == 1)
    val badLiteral = new Path(base, "t2")
    writeFile(new Path(badLiteral, "link_0"), s"$base/nowhere/missing.txt")
    val e = intercept[IllegalArgumentException] {
      SymlinkTextIO.resolve(spark, badLiteral.toString)
    }
    assert(e.getMessage.contains("missing target"))
  }

  test("nullRows: typed all-NULL rows without storage") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("d", DoubleType)))
    val df = SymlinkTextIO.nullRows(spark, schema, n = 3)
    assert(df.schema == schema)
    val rows = df.collect()
    assert(rows.length == 3 && rows.forall(r => (0 to 2).forall(r.isNullAt)))
    // the metadata-query use: constant projection needs no scan
    assert(SymlinkTextIO.nullRows(spark, schema)
      .select(lit(42).as("c")).first().getInt(0) == 42)
  }

  test("driver query matches a direct read of the source table") {
    val out = SymlinkTextIO.queries("source_symlink_scan")(spark, LocalSpark.sf)
      .collect().map(_.toSeq).toSeq
    Tables.register(spark, LocalSpark.sf)
    val direct = spark.table("documents")
      .where(col("source").isin("src3", "src7", "src11"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"),
        min(col("doc_id")).cast("bigint").as("min_doc"))
      .orderBy(col("source"))
      .collect().map(_.toSeq).toSeq
    assert(out == direct)
  }
}
