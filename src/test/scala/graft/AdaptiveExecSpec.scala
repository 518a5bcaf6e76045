package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime re-optimization (SURVEY.md §4.3): the Hive physical passes
  * (CommonJoinResolver's conditional tasks, SkewJoinResolver,
  * AppMasterEventOperator's dynamic pruning) are replaced wholesale by
  * AQE + DPP. These tests pin that the replacements actually engage on
  * this build — runtime SMJ→broadcast conversion, skew-partition
  * splitting, and partition-pruning via a join-side filter. */
class AdaptiveExecSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE converts a planned SortMergeJoin to broadcast at runtime") {
    Tables.register(spark, LocalSpark.sf)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // no static broadcast
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val dim = spark.table("customer").where($"c_custkey" < 20)
      val j = spark.table("orders").join(dim, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val initial = j.queryExecution.executedPlan.toString()
      assert(initial.contains("SortMergeJoin"), initial)
      j.collect()
      val fin = j.queryExecution.executedPlan.toString()
      assert(fin.contains("BroadcastHashJoin"),
        s"AQE should have switched to broadcast:\n$fin")
    }
  }

  test("AQE splits a skewed join partition") {
    // hot key 0 carries ~100k rows; all other keys are unique
    val left = spark.range(0, 200000)
      .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("pad"))
    val right = spark.range(0, 1000).select($"id".as("k"), lit("r").as("rv"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      // collect() (not count()) so THIS DataFrame's queryExecution runs
      // — count() spawns a separate execution and leaves this plan cold
      val j = left.join(right, "k").select(sum(length($"pad")).as("s"))
      j.collect()
      val fin = j.queryExecution.executedPlan.toString()
      assert(fin.contains("skew=true"), s"expected skew-split join:\n$fin")
    }
  }

  test("dynamic partition pruning through a dimension filter") {
    Tables.register(spark, LocalSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    // fact partitioned by nation; dim filter selects one nation name
    spark.table("customer").write.mode("overwrite")
      .partitionBy("c_nationkey").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.table("nation").where($"n_name" === "ASIA0")
    val j = fact.join(dim, fact("c_nationkey") === dim("n_nationkey"))
    val plan = j.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery in PartitionFilters:\n$plan")
  }

  test("runtime bloom-filter injection prunes the fact side of a selective join") {
    // the 100 TB runtime-filter story: a selective dim predicate
    // injects a bloom filter (might_contain) on the fact's join key so
    // fact rows drop BEFORE the join shuffle. Production thresholds
    // are sized for real tables, so both gates are opened for test
    // scale: the application-side scan-size floor drops to 0 and the
    // creation-side cap is RAISED to 10GB so the tiny dim qualifies.
    Tables.register(spark, LocalSpark.sf)
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql("""
        SELECT l_orderkey, o_totalprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 490000""")
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected an injected runtime bloom filter:\n${plan.take(3000)}")
      // the filtered plan still returns the right rows
      assert(df.count() ==
        spark.sql("""SELECT COUNT(*) FROM lineitem JOIN orders
                     ON l_orderkey = o_orderkey
                     WHERE o_totalprice > 490000""").collect()(0).getLong(0))
    }
  }

  test("grouping_id bit order is the Spark/Hive-3 convention (SURVEY §7.3 trap)") {
    Tables.register(spark, LocalSpark.sf)
    val rows = spark.sql("""
      SELECT GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p,
             GROUPING_ID(o_orderstatus, o_orderpriority) AS gid
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """).select("g_s", "g_p", "gid").distinct().collect()
      .map(r => (r.getByte(0).toInt, r.getByte(1).toInt, r.getLong(2) /* bigint */))
    // Spark (= Hive 3): first listed column is the HIGH bit. Hive 1.2
    // reversed this — any porting layer must translate, never pass through.
    assert(rows.toSet == Set((0, 0, 0L), (0, 1, 1L), (1, 0, 2L), (1, 1, 3L)),
      rows.mkString(","))
  }
}
