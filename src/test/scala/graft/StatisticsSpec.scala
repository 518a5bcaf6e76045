package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Statistics

/** Statistical operators (SURVEY.md §2.5 — the layer above Hive's
  * variance/corr UDAFs): each query is cross-checked against an
  * independently-computed Spark spelling, not just its own oracle. */
class StatisticsSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("stats_regression: slope agrees with corr * sd_y/sd_x per nation") {
    val out = Statistics.queries("stats_regression")(spark, LocalSpark.sf)
      .select("nation", "slope", "r2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // independent spelling: Spark's built-in moment aggregates on the
    // same rounded points
    val pts = spark.table("lineitem")
      .join(spark.table("supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey".cast("long").as("nk"),
        round($"l_quantity").as("x"), round($"l_extendedprice").as("y"))
    val ref = pts.groupBy("nk")
      .agg(corr("x", "y").as("c"), stddev_pop("y").as("sy"), stddev_pop("x").as("sx"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1) * r.getDouble(2) / r.getDouble(3)).toMap
    assert(out.keySet == ref.keySet)
    out.foreach { case (nk, (slope, r2)) =>
      assert(math.abs(slope - ref(nk)) < 1e-4, s"nation $nk slope $slope vs ${ref(nk)}")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("stats_chisq: total equals the contribution sum; marginals consistent") {
    val rows = Statistics.queries("stats_chisq")(spark, LocalSpark.sf).collect()
    val total = rows.head.getDouble(5)
    assert(rows.forall(r => math.abs(r.getDouble(5) - total) < 1e-9)) // constant column
    val contribSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(contribSum - total) < 1e-3, s"$contribSum vs $total")
    // expected counts reproduce the observed row marginals exactly
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val obs = cells.map(_.getLong(2)).sum.toDouble
      val exp = cells.map(_.getDouble(3)).sum
      assert(math.abs(obs - exp) < 1e-3, s"row marginal $obs vs $exp")
    }
  }

  test("stats_gini: agrees with the mean-absolute-difference formula") {
    val out = Statistics.queries("stats_gini")(spark, LocalSpark.sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(g => g >= 0.0 && g < 1.0))
    // independent spelling on one segment: G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ)
    val seg = out.keySet.min
    val xs = spark.table("customer").join(spark.table("orders"),
        $"o_custkey" === $"c_custkey")
      .where($"c_mktsegment" === seg)
      .groupBy("c_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("r"))
      .select("r").as[Long].collect().map(_.toDouble)
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / (n * n)
    assert(math.abs(out(seg) - mad / (2 * mu)) < 1e-5,
      s"segment $seg gini ${out(seg)} vs ${mad / (2 * mu)}")
  }
}
