package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.operators.Relational.UniqueJoinLeg

/** Semantics pins for the two round-13 §2 closers:
  *
  *  - UNIQUE JOIN (Hive `TOK_UNIQUEJOIN` / JoinDesc.UNIQUE_JOIN):
  *    hand-computed truth on a fixture that exercises every branch —
  *    preserved-only keys null-fill, non-preserved-only keys drop,
  *    duplicate keys cross-product (CommonJoinOperator's emit loop);
  *  - BLOCK__OFFSET__INSIDE__FILE analog (`_metadata.row_index` +
  *    input_file_name): per-FILE offset semantics on a multi-file
  *    table. (Since r14 the driver oracle reads per-file metadata via
  *    DuckDB file_row_number, so no fixture-layout premise remains;
  *    the doc_id-order check below is a fixture sanity property only.)
  */
class UniqueJoinAndVirtualColumnSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark
  val sf = LocalSpark.sf

  private def legs(): (UniqueJoinLeg, UniqueJoinLeg, UniqueJoinLeg) = {
    import spark.implicits._
    // duplicate key 2 in A exercises the cross-product path; key 4 is
    // non-preserved-only (must drop); keys 1/6 are preserved-only.
    val a = Seq((1L, "a1"), (2L, "a2x"), (2L, "a2y"), (5L, "a5"))
      .toDF("ka", "va")
    val b = Seq((2L, "b2"), (3L, "b3"), (4L, "b4")).toDF("kb", "vb")
    val c = Seq((3L, "c3"), (5L, "c5"), (6L, "c6")).toDF("kc", "vc")
    (UniqueJoinLeg(a, "ka", preserve = true),
     UniqueJoinLeg(b, "kb", preserve = false),
     UniqueJoinLeg(c, "kc", preserve = true))
  }

  test("uniqueJoin: preserved keys emit null-filled, non-preserved-only keys drop, dup keys cross-product") {
    val (a, b, c) = legs()
    val rows = Relational.uniqueJoin(Seq(a, b, c))
      .select(col("ka"), col("kb"), col("kc"), col("va"), col("vb"), col("vc"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
                 Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toSet
    def s(v: Any) = Option(v)
    val n = None
    rows shouldBe Set(
      (s(1L), n, n, s("a1"), n, n),                 // preserved-only in A
      (s(2L), s(2L), n, s("a2x"), s("b2"), n),       // dup key: 2 combos
      (s(2L), s(2L), n, s("a2y"), s("b2"), n),
      (n, s(3L), s(3L), n, s("b3"), s("c3")),        // preserved via C
      (s(5L), n, s(5L), s("a5"), n, s("c5")),        // in both preserved legs
      (n, n, s(6L), n, n, s("c6")))                  // preserved-only in C
    // key 4 (non-preserved-only) must NOT appear anywhere
  }

  test("uniqueJoin: NULL-key rows — preserved legs emit them null-padded, non-preserved legs drop them") {
    import spark.implicits._
    // Hive's reduce-side outer machinery (CommonJoinOperator) still
    // emits a PRESERVE leg's null-keyed rows null-padded (null keys
    // match nothing, but the preserved leg "has" the row). Presence is
    // therefore tagged with a literal marker, NOT key-nullness — this
    // pin is what distinguishes the two designs.
    val a = Seq((Some(1L), "a1"), (None, "aN")).toDF("ka", "va")
    val b = Seq((Some(1L), "b1"), (None, "bN")).toDF("kb", "vb")
    val rows = Relational.uniqueJoin(Seq(
        UniqueJoinLeg(a, "ka", preserve = true),
        UniqueJoinLeg(b, "kb", preserve = false)))
      .select(col("ka"), col("kb"), col("va"), col("vb"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)),
                 Option(r.get(2)), Option(r.get(3))))
      .toSet
    rows shouldBe Set(
      (Some(1L), Some(1L), Some("a1"), Some("b1")), // matched key
      (None, None, Some("aN"), None))               // preserved NULL key row
    // b's null-key row (non-preserved) must not appear
  }

  test("uniqueJoin: all-PRESERVE degenerates to the full outer join; guards fire") {
    val (a, b, c) = legs()
    val allPres = Relational.uniqueJoin(Seq(
      a, b.copy(preserve = true), c)).collect()
    allPres.length shouldBe 7                        // + the key-4 row
    an[IllegalArgumentException] should be thrownBy
      Relational.uniqueJoin(Seq(a))
    an[IllegalArgumentException] should be thrownBy
      Relational.uniqueJoin(Seq(
        a.copy(preserve = false), b, c.copy(preserve = false)))
  }

  test("uniqueJoin plan: one join key partitioning chain, no cartesian") {
    val (a, b, c) = legs()
    val p = Relational.uniqueJoin(Seq(a, b, c))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("_metadata.row_index resets per file and (file, offset) addresses rows uniquely") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vc").toString
    spark.range(0, 300).select(col("id"))
      .repartition(3)                                 // 3 part files
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(
      col("id"),
      regexp_extract(input_file_name(), "[^/]+$", 0).as("fname"),
      col("_metadata.row_index").as("off"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.length shouldBe 300
    rows.map(_._2).distinct.length shouldBe 3         // genuinely multi-file
    // per-file: offsets are exactly 0..n-1 (the Hive virtual column's
    // stable within-file address contract)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      rs.map(_._3).sorted.toSeq shouldBe (0L until rs.length).toSeq
    }
    // (file, offset) is a unique address
    rows.map(r => (r._2, r._3)).distinct.length shouldBe 300
    // and it is STABLE: a re-read maps the same id to the same address
    val again = spark.read.parquet(dir).select(
        col("id"), regexp_extract(input_file_name(), "[^/]+$", 0).as("f"),
        col("_metadata.row_index").as("o"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { case (id, f, o) => again(id) shouldBe ((f, o)) }
  }

  // No longer the oracle's premise (r14: the oracle reads per-file
  // metadata via DuckDB file_row_number, fixture-layout-independent) —
  // kept as a driver-fixture sanity property.
  test("fixture pin: single-file documents.parquet is written in doc_id order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("_metadata.row_index").as("off"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    docs.map(_._2).toSeq shouldBe docs.indices.map(_.toLong)  // single file
    docs.map(_._1).toSeq shouldBe docs.map(_._1).sorted.toSeq // doc_id order
  }
}
