package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the exactness boundary of HISTOGRAM_NUMERIC that the
  * agg_histogram_numeric oracle depends on: the sketch is exact iff each
  * group aggregates exactly ONE partial buffer with distinct(input) <=
  * nbins. add() increments an existing bin on exact x-match, but
  * merge()'s trim breaks equal-gap ties with a PRNG and does NOT prefer
  * collapsing duplicate-x bins — so multi-partition input is
  * nondeterministically approximate even when distinct(input) <= nbins.
  */
class HistogramExactnessSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  test("approx_count_distinct exactness boundary: <=7 distinct exact, 50 already collides") {
    // agg_approx_distinct's oracle substitutes COUNT(DISTINCT) for the
    // HLL++ sketch, which is only valid while linear counting sees no
    // register collisions. The boundary is MUCH tighter than the
    // 2^14-register capacity suggests: on this data 50 distinct
    // l_quantity values already hash into 47 registers. The oracled
    // columns (l_linestatus: 2, l_linenumber: 7) sit safely inside.
    val sf = "/root/testdata/sf0.01"
    Tables.register(spark, sf)
    try {
      val r = spark.sql("""
        SELECT APPROX_COUNT_DISTINCT(l_linestatus), COUNT(DISTINCT l_linestatus),
               APPROX_COUNT_DISTINCT(l_linenumber), COUNT(DISTINCT l_linenumber),
               APPROX_COUNT_DISTINCT(l_quantity),   COUNT(DISTINCT l_quantity)
        FROM lineitem""").collect()(0)
      assert(r.getLong(0) == r.getLong(1), "linestatus sketch must be exact")
      assert(r.getLong(2) == r.getLong(3), "linenumber sketch must be exact")
      assert(r.getLong(4) < r.getLong(5),
        s"l_quantity (${r.getLong(5)} distinct) was exact (${r.getLong(4)}) — " +
          "if the sketch got better, agg_approx_distinct could safely widen")
    } finally {
      // restore even on failure: later suites share this session's views
      Tables.invalidate(spark)
      Tables.register(spark, LocalSpark.sf)
    }
  }

  test("one partial per group (REPARTITION(1)) is exact under any file layout") {
    import spark.implicits._
    val df = (1 to 7).flatMap(v => Seq.fill(100 + v)(v)).toDF("x")
      .repartition(32)
    df.createOrReplaceTempView("hist_exact")
    val exact = spark.sql("""
      SELECT b.x AS bx, CAST(b.y AS DOUBLE) AS by
      FROM (SELECT HISTOGRAM_NUMERIC(x, 10) AS h
            FROM (SELECT /*+ REPARTITION(1) */ x FROM hist_exact))
      LATERAL VIEW EXPLODE(h) t AS b ORDER BY bx""").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(exact.toSeq == (1 to 7).map(v => (v, (100 + v).toDouble)))
  }

  test("multi-partition merge is NOT exact even with distinct <= nbins (regression trap)") {
    import spark.implicits._
    val df = (1 to 7).flatMap(v => Seq.fill(100 + v)(v)).toDF("x")
      .repartition(32)
    df.createOrReplaceTempView("hist_multi")
    // weights always sum to the row count whatever the merge did — that
    // invariant (not bin positions) is the only safe multi-partition
    // contract, which is why the harness query pins REPARTITION(1)
    val r = spark.sql("""
      SELECT AGGREGATE(TRANSFORM(h, b -> CAST(b.y AS DOUBLE)), CAST(0 AS DOUBLE), (a, y) -> a + y) AS wsum,
             SIZE(h) AS nbins
      FROM (SELECT HISTOGRAM_NUMERIC(x, 7) AS h FROM hist_multi)""").collect()(0)
    assert(math.abs(r.getDouble(0) - (1 to 7).map(100 + _).sum) < 1e-6)
    assert(r.getInt(1) == 7)
  }
}
