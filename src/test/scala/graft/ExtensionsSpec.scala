package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** GraftExtensions wiring: a session built with .withExtensions resolves
  * every graft function from SQL with no manual registration. The
  * existing SparkContext is reused (builder only applies extensions to a
  * NEW SparkSession, so active/default must be cleared first). */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft functions from SQL") {
    val base = LocalSpark.spark // shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "expected a fresh session carrying the extensions")
      val r = s.sql("""
        SELECT COSINE_SIM(ARRAY(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                          ARRAY(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
               SIMHASH64(ARRAY('a','b')) AS h,
               FIELD('b', 'a', 'b') AS f
      """).collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getInt(2) == 2)
      // DESCRIBE FUNCTION works for injected functions too
      val d = s.sql("DESCRIBE FUNCTION cosine_sim").collect()
        .map(_.getString(0)).mkString("\n")
      assert(d.contains("cosine_sim"), d)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
