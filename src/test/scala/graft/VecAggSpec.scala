package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VecSumAgg}

/** VecSumAgg (`vec_sum`) unit coverage: multi-partition aggregation so
  * the partial/merge/serde paths genuinely execute, plus the loud-fail
  * edges (width mismatch, null element, zero-length) and a direct serde
  * round-trip property. Round-4 lesson: a registered aggregate with no
  * consumer shipped untested — this spec pins the kernel independently
  * of the Clustering operator that consumes it. */
class VecAggSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("vec_sum sums element-wise across many partitions (merge + serde path)") {
    GraftFunctions.register(spark)
    // 97 rows over 16 partitions forces non-trivial partial aggregation:
    // update on each partition, serialize/deserialize + merge at exchange
    val rows = (1 to 97).map(i => (i % 3, Array(i.toDouble, 2.0 * i, -i.toDouble)))
    val df = spark.createDataset(rows).repartition(16)
      .toDF("g", "v")
    val out = df.groupBy($"g").agg(GraftFunctions.vec_sum($"v").as("s"))
      .orderBy($"g")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val expect = (0 to 2).map { g =>
      val is = (1 to 97).filter(_ % 3 == g)
      (g, Seq(is.map(_.toDouble).sum, is.map(2.0 * _).sum, -is.map(_.toDouble).sum))
    }
    out.toSeq shouldBe expect
    // exactness, not approximation: integer-valued doubles sum exactly
    out.map(_._2.head).sum shouldBe (1 to 97).map(_.toDouble).sum
  }

  test("vec_sum works from SQL and over a single global group") {
    GraftFunctions.register(spark)
    spark.createDataset(Seq(Array(1.5, 2.5), Array(3.0, -1.0), Array(0.25, 0.75)))
      .toDF("v").createOrReplaceTempView("vecagg_in")
    val r = spark.sql("SELECT vec_sum(v) AS s FROM vecagg_in")
      .collect().head.getSeq[Double](0)
    r shouldBe Seq(4.75, 2.25)
  }

  test("width mismatch fails loudly") {
    GraftFunctions.register(spark)
    val df = spark.createDataset(Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .repartition(1).toDF("v")
    val ex = intercept[Exception] {
      df.agg(GraftFunctions.vec_sum($"v")).collect()
    }
    ex.getMessage should include regex "vec_sum.*width"
  }

  test("null element fails loudly, null row is skipped") {
    GraftFunctions.register(spark)
    // null ROW skipped (sum semantics)
    spark.sql("SELECT vec_sum(v) AS s FROM VALUES (array(1.0d, 2.0d)), (CAST(NULL AS ARRAY<DOUBLE>)) t(v)")
      .collect().head.getSeq[Double](0) shouldBe Seq(1.0, 2.0)
    // null ELEMENT rejected (silent +0.0 would be a quiet wrong answer)
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_sum(v) FROM VALUES (array(1.0d, CAST(NULL AS DOUBLE))) t(v)").collect()
    }
    ex.getMessage should include("null element")
  }

  test("zero-length vector fails loudly in any arrival order") {
    GraftFunctions.register(spark)
    for (vals <- Seq(Seq(Array.empty[Double], Array(1.0)),
                     Seq(Array(1.0), Array.empty[Double]))) {
      val df = spark.createDataset(vals).repartition(1).toDF("v")
      val ex = intercept[Exception] {
        df.agg(GraftFunctions.vec_sum($"v")).collect()
      }
      ex.getMessage should include("zero-length")
    }
  }

  test("serialize/deserialize is an identity; merge handles empty buffers") {
    val agg = VecSumAgg(org.apache.spark.sql.catalyst.expressions.Literal(1))
    for (buf <- Seq(Array.emptyDoubleArray, Array(0.0, -0.0, 1.5),
                    Array.tabulate(64)(i => i * math.Pi))) {
      val rt = agg.deserialize(agg.serialize(buf))
      rt.toSeq shouldBe buf.toSeq
      // -0.0 must survive serde bit-exactly
      rt.zip(buf).foreach { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) shouldBe
          java.lang.Double.doubleToRawLongBits(b)
      }
    }
    agg.merge(Array.emptyDoubleArray, Array(1.0, 2.0)).toSeq shouldBe Seq(1.0, 2.0)
    agg.merge(Array(1.0, 2.0), Array.emptyDoubleArray).toSeq shouldBe Seq(1.0, 2.0)
    agg.merge(Array(1.0, 2.0), Array(0.5, -2.0)).toSeq shouldBe Seq(1.5, 0.0)
    intercept[IllegalArgumentException] {
      agg.merge(Array(1.0), Array(1.0, 2.0))
    }
  }
}
