package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hive's user-extension surface (SURVEY.md §2.8): CREATE TEMPORARY
  * MACRO ≙ Spark 4 SQL UDF (CREATE TEMPORARY FUNCTION ... RETURN expr),
  * simple UDF ≙ spark.udf.register, and session-scoped function
  * registration/unregistration. */
class MacroAndUdfSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  test("CREATE TEMPORARY MACRO analog: SQL UDF with expression body") {
    // Hive: CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0/(1.0+EXP(-x))
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION sigmoid(x DOUBLE)
                 RETURNS DOUBLE RETURN 1.0 / (1.0 + EXP(-x))""")
    val r = spark.sql("SELECT sigmoid(0.0) AS s0, sigmoid(100.0) AS s1").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    // macros compose with table data
    Tables.register(spark, LocalSpark.sf)
    val n = spark.sql(
      "SELECT COUNT(*) FROM supplier WHERE sigmoid(s_acctbal / 1000.0) > 0.5"
    ).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("typed Aggregator UDAF (Hive GenericUDAF bridge): registered, SQL-callable, merge-correct") {
    // Hive custom UDAFs map to org.apache.spark.sql.expressions.Aggregator
    // registered through functions.udaf — the typed, codegen-friendly
    // extension path (SURVEY §2.8). Geometric mean: a real aggregate no
    // built-in provides, with a nontrivial (logSum, n) buffer whose
    // merge path multi-partition input actually exercises.
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{functions => F, Encoder, Encoders}
    object GeoMean extends Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double): (Double, Long) =
        (b._1 + math.log(x), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double =
        if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
        Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    spark.udf.register("geo_mean", F.udaf(GeoMean))
    Tables.register(spark, LocalSpark.sf)
    val rows = spark.sql("""
      SELECT l_returnflag, geo_mean(CAST(l_quantity AS DOUBLE)) AS gm, COUNT(*) AS n
      FROM (SELECT /*+ REPARTITION(8) */ l_returnflag, l_quantity FROM lineitem)
      GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    assert(rows.nonEmpty)
    // local reference per group — the multi-partition merge must agree
    // to float tolerance (log-sum order differs across partitions)
    val ref = spark.sql(
      "SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q FROM lineitem")
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) =>
        val qs = rs.map(_.getDouble(1))
        k -> math.exp(qs.map(math.log).sum / qs.length)
      }
    rows.foreach { r =>
      val exp = ref(r.getString(0))
      assert(math.abs(r.getDouble(1) - exp) / exp < 1e-12,
        s"${r.getString(0)}: ${r.getDouble(1)} vs $exp")
      // geometric mean of positive quantities sits inside [min, max]
      assert(r.getDouble(1) > 0.0)
    }
  }

  test("scala UDF registration (Hive simple UDF bridge)") {
    spark.udf.register("initials",
      (s: String) => if (s == null) null else s.split("[^A-Za-z]+").filter(_.nonEmpty).map(_.head).mkString)
    val r = spark.sql("SELECT initials('Apache Spark SQL')").collect()(0).getString(0)
    assert(r == "ASS")
  }

  test("temporary function is session-scoped and droppable") {
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION double_it(x INT) RETURNS INT RETURN x * 2")
    assert(spark.sql("SELECT double_it(21)").collect()(0).getInt(0) == 42)
    spark.sql("DROP TEMPORARY FUNCTION double_it")
    intercept[Exception] { spark.sql("SELECT double_it(21)").collect() }
  }
}
