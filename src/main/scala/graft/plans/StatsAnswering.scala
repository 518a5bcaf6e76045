package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Hive StatsOptimizer analog (QL/optimizer/StatsOptimizer.java, gated
  * there by hive.compute.query.using.stats): answer a bare
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` over a catalog
  * table straight from ANALYZE TABLE statistics — a LocalRelation
  * replaces the whole scan+aggregate, so the query does zero I/O. At
  * 100 TB this turns the most common exploratory query ("how big is this
  * table?") from a full scan into a metadata lookup.
  *
  * Safety: fires only when (a) the aggregate has no grouping and no
  * filter between it and the relation, (b) the relation is a catalog
  * table whose stats carry a rowCount (column stats for COUNT(col)/
  * MIN/MAX), and (c) `spark.graft.answerFromStats` is "true" — OPT-IN,
  * matching Hive's hive.compute.query.using.stats default: Spark clears
  * catalog stats on catalog-routed writes (CommandUtils.updateTableStats)
  * so stats present ⇒ stats current for catalog traffic, but files
  * added/dropped OUT OF BAND (direct FS writes into the table location)
  * leave stale stats the rule cannot detect, so the user must opt into
  * that contract explicitly.
  */
object AnswerFromStats extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.answerFromStats", "false")
          .trim.equalsIgnoreCase("true")) return plan
    plan.transform {
      case agg: Aggregate
          if agg.groupingExpressions.isEmpty && agg.child.maxRows != Some(0L) =>
        tableOf(agg.child) match {
          case Some(table) if table.stats.flatMap(_.rowCount).isDefined =>
            val rowCount = table.stats.get.rowCount.get
            val answers = agg.aggregateExpressions.map(answer(_, table, rowCount))
            if (answers.forall(_.isDefined))
              LocalRelation(agg.output, Seq(InternalRow.fromSeq(answers.map(_.get))))
            else agg
          case _ => agg
        }
    }
  }

  /** The catalog table under the aggregate, provided nothing on the way
    * can change row counts or values (attribute-only projections). */
  private def tableOf(p: LogicalPlan): Option[CatalogTable] = p match {
    case l: LogicalRelation => l.catalogTable
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      tableOf(child)
    case SubqueryAlias(_, child) => tableOf(child)
    case _ => None
  }

  /** The stats answer for one output column, or None if not answerable. */
  private def answer(e: NamedExpression, table: CatalogTable,
                     rowCount: BigInt): Option[Any] = e match {
    case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
      val colStats = table.stats.get.colStats
      fn match {
        case Count(Seq(Literal(v, _))) if v != null => Some(rowCount.toLong)
        case Count(Seq(a: AttributeReference)) =>
          colStats.get(a.name).flatMap(_.nullCount)
            .map(nulls => (rowCount - nulls).toLong)
        case Min(a: AttributeReference) =>
          statVal(table, a, min = true)
        case Max(a: AttributeReference) =>
          statVal(table, a, min = false)
        case _ => None
      }
    case _ => None
  }

  private def statVal(table: CatalogTable, a: AttributeReference,
                      min: Boolean): Option[Any] =
    table.stats.get.colStats.get(a.name)
      .map(_.toPlanStat(a.name, a.dataType))
      .flatMap(ps => if (min) ps.min else ps.max)
      // a stats-less but present column (e.g. only nullCount) is not
      // answerable; Option covers it. min/max of an EMPTY table (rowCount
      // 0) never reaches here — colStats would have no min/max either.
}
