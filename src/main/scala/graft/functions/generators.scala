package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** parse_url_tuple(url, part1, part2, ...) — Hive's
  * GenericUDTFParseUrlTuple as a true one-pass generator: one output row
  * per input row with a string column per requested part. Parts are the
  * ParseUrl keywords (HOST, PATH, QUERY, REF, PROTOCOL, FILE, AUTHORITY,
  * USERINFO) plus Hive's `QUERY:<key>` form for a single query
  * parameter. Part arguments must be literals (same restriction as
  * Hive, which resolves them at initialize() time).
  *
  * The per-part extraction delegates to Spark's own ParseUrl expression
  * (one instance per part, built once) so URL semantics match the
  * scalar parse_url exactly — the UDTF form just avoids re-parsing the
  * URL string n times in the projection. */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {
  require(children.length >= 2,
    "parse_url_tuple(url, part1 [, part2 ...]) needs at least one part")

  @transient private lazy val partNames: Seq[String] = children.tail.map { p =>
    require(p.foldable, "parse_url_tuple: part arguments must be literals")
    String.valueOf(p.eval(null))
  }

  // ParseUrl is RuntimeReplaceable in Spark 4 (its own eval asserts), so
  // each extractor is the expression ParseUrl rewrites to
  @transient private lazy val extractors: Seq[Expression] = partNames.map { s =>
    def lit(v: String) = Literal(UTF8String.fromString(v), StringType)
    val pu =
      if (s.startsWith("QUERY:"))
        ParseUrl(Seq(children.head, lit("QUERY"), lit(s.substring(6))))
      else ParseUrl(Seq(children.head, lit(s)))
    pu.replacement
  }

  override def elementSchema: StructType = StructType(
    partNames.zipWithIndex.map { case (_, i) =>
      StructField(s"c$i", StringType, nullable = true)
    })

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    Seq(InternalRow.fromSeq(extractors.map(_.eval(input))))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseUrlTuple =
    copy(children = newChildren)
}
