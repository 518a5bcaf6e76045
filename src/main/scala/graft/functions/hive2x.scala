package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Hive 2.x function tail (SURVEY.md §2.7 [2.x] markers) implemented as
  * COMPOSITE catalyst expressions over Spark built-ins — no new eval
  * kernels, so everything stays inside whole-stage codegen:
  *
  *  - `mask_*` family (Hive `GenericUDFMaskFirstN/LastN/ShowFirstN/
  *    ShowLastN/Hash`): Spark ships the base `mask` semantics (upper →
  *    'X', lower → 'x', digit → 'n', other unchanged — Hive's
  *    defaults); the positional variants are concat/substring algebra
  *    around it with Hive's clamping (n beyond the string length masks/
  *    shows the whole string). `mask_hash` is Hive 2.x's md5 hex.
  *  - `sort_array_by(arr, 'field'[, 'ASC'|'DESC'])` (Hive
  *    `GenericUDFSortArrayByField`): lowered onto `array_sort` with a
  *    generated comparator lambda on the named struct field.
  *  - `replicate_rows(n, cols...)` (Hive `GenericUDTFReplicateRows`):
  *    lowered onto `inline(array_repeat(struct(cols), n))` — a
  *    generator, usable in LATERAL VIEW exactly like Hive's UDTF.
  */
object Hive2x {

  private def ch(c: Char): Expression = Literal(c.toString)
  private val KeepOther = Literal(null, StringType)

  /** Hive-default masking of a whole string. */
  def maskAll(e: Expression): Expression =
    Mask(e, ch('X'), ch('x'), ch('n'), KeepOther)

  private val Big = Literal(Int.MaxValue)
  private def nOrDefault(es: Seq[Expression]): Expression =
    es.lift(1).getOrElse(Literal(4)) // Hive's default n = 4

  def maskFirstN(es: Seq[Expression]): Expression = {
    val (s, n) = (es.head, nOrDefault(es))
    Concat(Seq(
      maskAll(Substring(s, Literal(1), n)),
      Substring(s, Add(n, Literal(1)), Big)))
  }

  def maskLastN(es: Seq[Expression]): Expression = {
    val (s, n) = (es.head, nOrDefault(es))
    val head = Greatest(Seq(Subtract(Length(s), n), Literal(0)))
    Concat(Seq(
      Substring(s, Literal(1), head),
      maskAll(Substring(s, Add(head, Literal(1)), Big))))
  }

  def maskShowFirstN(es: Seq[Expression]): Expression = {
    val (s, n) = (es.head, nOrDefault(es))
    Concat(Seq(
      Substring(s, Literal(1), n),
      maskAll(Substring(s, Add(n, Literal(1)), Big))))
  }

  def maskShowLastN(es: Seq[Expression]): Expression = {
    val (s, n) = (es.head, nOrDefault(es))
    val head = Greatest(Seq(Subtract(Length(s), n), Literal(0)))
    Concat(Seq(
      maskAll(Substring(s, Literal(1), head)),
      Substring(s, Add(head, Literal(1)), Big)))
  }

  def maskHash(es: Seq[Expression]): Expression =
    Md5(Cast(es.head, BinaryType))

  def sortArrayBy(es: Seq[Expression]): Expression = {
    require(es.length >= 2, "sort_array_by(arr, 'field'[, 'ASC'|'DESC'])")
    val (arr, fieldLit) = (es(0), es(1))
    val desc = es.lift(2).exists {
      case Literal(v, StringType) if v != null =>
        v.toString.equalsIgnoreCase("DESC")
      case other =>
        throw new IllegalArgumentException(
          s"sort_array_by order must be the literal 'ASC' or 'DESC', got $other")
    }
    val x = UnresolvedNamedLambdaVariable(Seq("graft_sab_x"))
    val y = UnresolvedNamedLambdaVariable(Seq("graft_sab_y"))
    def fld(v: Expression) = UnresolvedExtractValue(v, fieldLit)
    val (lo, hi) = if (desc) (Literal(1), Literal(-1))
                   else (Literal(-1), Literal(1))
    val cmp = If(LessThan(fld(x), fld(y)), lo,
      If(GreaterThan(fld(x), fld(y)), hi, Literal(0)))
    ArraySort(arr, LambdaFunction(cmp, Seq(x, y)))
  }

  def replicateRows(es: Seq[Expression]): Expression = {
    require(es.length >= 2, "replicate_rows(n, cols...)")
    Inline(ArrayRepeat(CreateStruct(es.tail.toIndexedSeq),
      Cast(es.head, IntegerType)))
  }

  // ------------------------------------------------------------------
  // uniontype (Hive SERDE/typeinfo/UnionTypeInfo; `create_union` in the
  // 1.2 registry, `extract_union` 2.x): Spark has no union type, so the
  // SURVEY §1.3 decision encodes uniontype<t0,t1,...> as the struct
  // (tag INT, field0 t0, field1 t1, ...) with exactly the active
  // alternative non-null. DuckDB's NATIVE union type oracles the
  // encoding (union_value/union_tag/union_extract), so the parity is
  // value-checked against a real union implementation, not a mirror of
  // this one.
  // ------------------------------------------------------------------

  /** create_union(tag, v0, v1, ...) → tagged struct; only the selected
    * alternative is evaluated into its field, the rest are NULL. */
  def createUnion(es: Seq[Expression]): Expression = {
    require(es.length >= 2, "create_union(tag, alt0[, alt1, ...])")
    val tag = Cast(es.head, IntegerType)
    val fields = es.tail.zipWithIndex.flatMap { case (v, i) =>
      Seq(Literal(s"field$i"): Expression,
        If(EqualTo(tag, Literal(i)), v, Literal(null)): Expression)
    }
    CreateNamedStruct(Seq(Literal("tag"), tag) ++ fields)
  }

  /** union_tag(u) → the active alternative's index. */
  def unionTag(es: Seq[Expression]): Expression =
    UnresolvedExtractValue(es.head, Literal("tag"))

  /** extract_union(u, i) → alternative i (NULL when inactive);
    * extract_union(u) → the full tagged struct (Hive's all-fields
    * form — this encoding already IS that struct). */
  def extractUnion(es: Seq[Expression]): Expression = es match {
    case Seq(u) => u
    case Seq(u, Literal(i: Int, IntegerType)) =>
      UnresolvedExtractValue(u, Literal(s"field$i"))
    case other => throw new IllegalArgumentException(
      s"extract_union(u[, literal tag index]), got $other")
  }

  /** Hive ≤2.2 `GROUPING__ID` compatibility (SURVEY §7.3#1; the
    * semantics changed in Hive 2.3 via HIVE-16102): the legacy number
    * sets bit i (i = 0 for the FIRST GROUP BY column = LEAST
    * significant) to 1 when that column IS part of the row's grouping
    * set — both the bit ORDER and the bit MEANING are inverted
    * relative to the SQL-standard `grouping_id()` that Spark, Hive
    * ≥2.3, and DuckDB implement (first column MOST significant, 1 =
    * aggregated away). `hive_grouping_id(grouping_id(), n)` re-derives
    * the legacy integer so a migrating query that compares against or
    * stores Hive-1.2 GROUPING__ID values keeps reading the same
    * numbers. Pure shift/and/add algebra over built-ins — stays in
    * whole-stage codegen, no new eval kernel. */
  def hiveGroupingId(es: Seq[Expression]): Expression = {
    require(es.length == 2, "hive_grouping_id(grouping_id(), n_group_cols)")
    val g = Cast(es(0), LongType)
    val n = es(1) match {
      case Literal(v, _) => v.asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"n_group_cols must be an integer literal, got $other")
    }
    require(n >= 1 && n <= 62, s"n_group_cols must be in [1, 62], got $n")
    (0 until n).map { i =>
      // standard bit (n-1-i) of g, inverted, re-placed at legacy bit i
      Multiply(
        Subtract(Literal(1L),
          BitwiseAnd(ShiftRight(g, Literal(n - 1 - i)), Literal(1L))),
        Literal(1L << i)): Expression
    }.reduce(Add(_, _))
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "hive_grouping_id"  -> hiveGroupingId,
    "create_union"      -> createUnion,
    "union_tag"         -> unionTag,
    "extract_union"     -> extractUnion,
    "mask_first_n"      -> maskFirstN,
    "mask_last_n"       -> maskLastN,
    "mask_show_first_n" -> maskShowFirstN,
    "mask_show_last_n"  -> maskShowLastN,
    "mask_hash"         -> maskHash,
    "sort_array_by"     -> sortArrayBy,
    "replicate_rows"    -> replicateRows
  )
}
