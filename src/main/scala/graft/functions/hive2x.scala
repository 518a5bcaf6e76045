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

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "mask_first_n"      -> maskFirstN,
    "mask_last_n"       -> maskLastN,
    "mask_show_first_n" -> maskShowFirstN,
    "mask_show_last_n"  -> maskShowLastN,
    "mask_hash"         -> maskHash,
    "sort_array_by"     -> sortArrayBy,
    "replicate_rows"    -> replicateRows
  )
}
