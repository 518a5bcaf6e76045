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
