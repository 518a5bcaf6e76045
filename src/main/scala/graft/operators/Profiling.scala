package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Data-quality profiling and constraint validation — the pre-training
  * gate every production pipeline runs before a corpus or fact table is
  * allowed downstream (the Deequ/expectations pattern re-expressed as
  * plain aggregates; Hive users run exactly these as hand-written SQL).
  *
  * Both operators are single-scan shapes at 100 TB: every metric is a
  * hash/sort-free aggregate with bounded state (counts, min/max,
  * distincts expand to the standard two-phase distinct aggregate), and
  * the UNION ALL of rule rows evaluates each branch over its own scan —
  * Catalyst shares the cached relation when the table is hot, and a
  * production deployment would fuse the branches into one pass with
  * conditional aggregates (the spelling used inside each branch here).
  * One SQL text serves both engines.
  */
object Profiling {

  private type Q = (SparkSession, String) => DataFrame

  // typed profile: numeric min/max stay DOUBLE (casting doubles to
  // strings formats differently across engines), string min/max ride
  // in their own columns
  private val ProfileSql = """
      SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
             COUNT(o_custkey) AS n_nonnull,
             COUNT(DISTINCT o_custkey) AS n_distinct,
             CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
             CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
             CAST(NULL AS STRING) AS min_str, CAST(NULL AS STRING) AS max_str
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
             COUNT(DISTINCT o_totalprice),
             MIN(o_totalprice), MAX(o_totalprice),
             CAST(NULL AS STRING), CAST(NULL AS STRING)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             MIN(o_orderpriority), MAX(o_orderpriority)
      FROM orders
      ORDER BY col"""

  // each rule emits (rule, violations) — 0 everywhere on clean data,
  // and the rules are real (key uniqueness, referential integrity,
  // value range, enum domain, cross-field ordering)
  private val ValidateSql = """
      SELECT 'orderkey_unique' AS rule,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations
      FROM orders
      UNION ALL
      SELECT 'custkey_fk', COUNT(*)
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'price_positive', COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END)
      FROM orders
      UNION ALL
      SELECT 'priority_domain', COUNT(CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 END)
      FROM orders
      UNION ALL
      SELECT 'lineitem_fk', COUNT(*)
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'ship_after_order', COUNT(*)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate < o.o_orderdate
      ORDER BY rule"""

  /** Benford first-digit screening — the classic fabricated-data probe
    * over a value column. Digit extraction is exact string arithmetic
    * on the cents-integer; expected frequencies log10(1+1/d) and the
    * deviations are per-digit double formulas on exact counts. Single
    * aggregate to 9 rows. Dialect split on the string type name only. */
  private def benfordSql(spark: Boolean): String = {
    val str = if (spark) "STRING" else "VARCHAR"
    s"""
      WITH d AS (
        SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                   AS $str), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice > 0
      ),
      c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
      SELECT digit, n, ROUND(n / tot, 6) AS observed,
             ROUND(LOG10(1 + 1.0E0 / digit), 6) AS benford_expected,
             ROUND(n / tot - LOG10(1 + 1.0E0 / digit), 6) AS deviation
      FROM c CROSS JOIN t ORDER BY digit"""
  }

  /** Functional-dependency discovery over a fixed candidate set — the
    * profiling pass that infers key/hierarchy structure (det → dep holds
    * iff no determinant value maps to two dependent values). Each
    * candidate is one groupBy on its determinant with a distinct-count
    * of the dependent — at 100 TB each branch is a single two-phase
    * distinct aggregate on the det key, never a pair join; the verdict
    * and violation counts are exact integers. Includes a composite
    * determinant (the lineitem PK) and known-false candidates so both
    * verdict polarities are exercised. */
  private def fdBranch(label: String, table: String,
                       det: String, dep: String): String = s"""
      SELECT '$label' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_det,
             CAST(MAX(nd) AS BIGINT) AS max_dep_per_det,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             CAST(CASE WHEN MAX(nd) = 1 THEN 1 ELSE 0 END AS INT) AS holds
      FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd
            FROM $table GROUP BY $det) g"""

  private val FdSql = Seq(
    fdBranch("n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
    fdBranch("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
    fdBranch("o_custkey->o_orderstatus", "orders", "o_custkey", "o_orderstatus"),
    fdBranch("l_orderkey->l_partkey", "lineitem", "l_orderkey", "l_partkey"),
    fdBranch("l_orderkey,l_linenumber->l_partkey", "lineitem",
             "l_orderkey, l_linenumber", "l_partkey"),
    fdBranch("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    fdBranch("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey")
  ).mkString("", "\n      UNION ALL", "\n      ORDER BY fd")

  val queries: Map[String, Q] = Map(
    "profile_columns" -> Tables.sql(ProfileSql),
    "validate_constraints" -> Tables.sql(ValidateSql),
    "profile_benford" -> Tables.sql(benfordSql(spark = true)),
    "profile_fd" -> Tables.sql(FdSql)
  )

  val oracle: Map[String, String] = Map(
    "profile_columns" -> ProfileSql,
    "validate_constraints" -> ValidateSql,
    "profile_benford" -> benfordSql(spark = false),
    "profile_fd" -> FdSql
  )
}
