package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write-path surface (SURVEY.md §2.2, §7.1 step 5 — Hive
  * FileSinkOperator): dynamic partitioned writes, bucketed+sorted
  * tables, multi-insert fan-out, and format round-trips
  * (csv/json/orc/avro). */
class WritePathsSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("dynamic partitioned write + partition pruning on read") {
    Tables.register(spark, LocalSpark.sf)
    val dir = tmp("part")
    spark.table("documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    // partition pruning: only the lang=en directory is scanned
    val en = back.where($"lang" === "en")
    val scan = en.queryExecution.executedPlan.toString()
    assert(en.count() > 0)
    assert(!scan.contains("lang=de") || scan.contains("PartitionFilters"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))
  }

  test("LOAD DATA: static-partition and unpartitioned loads, move vs LOCAL copy") {
    import graft.sources.LoadData
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_load_test")

    // --- static-partition loads: nation rows staged per region ---
    val stage = tmp("load_stage")
    val nation = spark.table("nation")
    (0 to 2).foreach { r =>
      nation.where($"n_regionkey" === r).drop("n_regionkey")
        .coalesce(1).write.parquet(s"$stage/r=$r")
    }
    spark.sql("DROP TABLE IF EXISTS graft_load_test.nation_loaded")
    LoadData.createLoadTarget(spark, "graft_load_test.nation_loaded",
      nation.schema, Seq("n_regionkey"))
    (0 to 2).foreach { r =>
      LoadData.loadData(spark, s"$stage/r=$r", "graft_load_test.nation_loaded",
        partition = Seq("n_regionkey" -> r.toString), overwrite = true)
    }
    val loaded = spark.table("graft_load_test.nation_loaded")
    val expected = nation.where($"n_regionkey" <= 2)
    assert(loaded.count() == expected.count())
    assert(loaded.agg(sum("n_nationkey")).head.getLong(0) ==
      expected.agg(sum("n_nationkey")).head.getLong(0))
    // INPATH (non-LOCAL) moved the files out of the staging dir
    assert(new java.io.File(s"$stage/r=0").listFiles()
      .forall(f => f.getName.startsWith("_") || f.getName.startsWith(".")))

    // --- unpartitioned load, LOCAL (copy) semantics ---
    val stage2 = tmp("load_stage2")
    val region = spark.table("region")
    region.coalesce(1).write.parquet(s"$stage2/files")
    spark.sql("DROP TABLE IF EXISTS graft_load_test.region_loaded")
    LoadData.createLoadTarget(spark, "graft_load_test.region_loaded",
      region.schema, Nil)
    LoadData.loadData(spark, s"$stage2/files", "graft_load_test.region_loaded",
      local = true)
    assert(spark.table("graft_load_test.region_loaded").count() == 5)
    // LOCAL kept the source files in place
    assert(new java.io.File(s"$stage2/files").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // append (no OVERWRITE) accumulates: load the same files again
    val stage3 = tmp("load_stage3")
    region.coalesce(1).write.parquet(s"$stage3/files")
    LoadData.loadData(spark, s"$stage3/files", "graft_load_test.region_loaded")
    assert(spark.table("graft_load_test.region_loaded").count() == 10)
  }

  test("LOAD DATA: reserved-word table name survives identifier quoting end-to-end") {
    // every SQL statement the load path emits (CREATE, LOAD/rename,
    // ALTER ADD PARTITION, REFRESH, the lock's DESCRIBE FORMATTED)
    // backtick-quotes the identifier — a table named `order` parses
    // ONLY when quoted, so this proves none of them interpolates it
    // raw (hyphens etc. are rejected by SessionCatalog.validateName
    // itself, so a reserved word is the strongest legal probe)
    import graft.sources.LoadData
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_load_test")
    val name = "graft_load_test.order"
    spark.sql("DROP TABLE IF EXISTS graft_load_test.`order`")
    val stage = tmp("load_stage_reserved")
    val region = spark.table("region")
    region.coalesce(1).write.parquet(s"$stage/files")
    LoadData.createLoadTarget(spark, name, region.schema, Nil)
    LoadData.loadData(spark, s"$stage/files", name, local = true)
    assert(spark.table("graft_load_test.`order`").count() == 5)
  }

  test("LOAD DATA: date-string partition values are quoted into the spec") {
    import graft.sources.LoadData
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_load_test")
    // ds='2024-01-01' is the single most canonical Hive partition value —
    // an unquoted digits-and-dashes rendering fails Spark's partition
    // grammar (or parses as arithmetic 2024-1-1=2022)
    val days = Seq("2024-01-01", "2024-01-02")
    val stage = tmp("load_ds")
    val region = spark.table("region")
    days.foreach { d =>
      region.coalesce(1).write.parquet(s"$stage/ds=$d")
    }
    spark.sql("DROP TABLE IF EXISTS graft_load_test.region_by_day")
    val schema = org.apache.spark.sql.types.StructType(
      region.schema :+ org.apache.spark.sql.types.StructField(
        "ds", org.apache.spark.sql.types.StringType))
    LoadData.createLoadTarget(spark, "graft_load_test.region_by_day",
      schema, Seq("ds"))
    days.foreach { d =>
      LoadData.loadData(spark, s"$stage/ds=$d", "graft_load_test.region_by_day",
        partition = Seq("ds" -> d), overwrite = true)
    }
    val loaded = spark.table("graft_load_test.region_by_day")
    assert(loaded.count() == 10)
    assert(loaded.where($"ds" === "2024-01-01").count() == 5)
    // the partitions registered with the literal date value
    val parts = spark.sql("SHOW PARTITIONS graft_load_test.region_by_day")
      .collect().map(_.getString(0)).toSet
    assert(parts == days.map(d => s"ds=$d").toSet, parts.toString)
  }

  test("LOAD DATA: zero-padded and special-char partition values survive verbatim") {
    import graft.sources.LoadData
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_load_test")
    // '007' unquoted would normalize to 7 in the catalog while the files
    // land in k=007; 'a b:c' needs Hive partition-path escaping so the
    // directory the files land in is the one the catalog points at
    val vals = Seq("007", "a b:c")
    val stage = tmp("load_pad")
    val region = spark.table("region")
    vals.zipWithIndex.foreach { case (_, i) =>
      region.coalesce(1).write.parquet(s"$stage/v$i")
    }
    spark.sql("DROP TABLE IF EXISTS graft_load_test.region_by_code")
    val schema = org.apache.spark.sql.types.StructType(
      region.schema :+ org.apache.spark.sql.types.StructField(
        "code", org.apache.spark.sql.types.StringType))
    LoadData.createLoadTarget(spark, "graft_load_test.region_by_code",
      schema, Seq("code"))
    vals.zipWithIndex.foreach { case (v, i) =>
      LoadData.loadData(spark, s"$stage/v$i", "graft_load_test.region_by_code",
        partition = Seq("code" -> v), overwrite = true)
    }
    val loaded = spark.table("graft_load_test.region_by_code")
    assert(loaded.count() == 10)
    // the VERBATIM values read back — a collapsed '7' or a mangled
    // directory would lose these rows
    vals.foreach { v =>
      assert(loaded.where($"code" === v).count() == 5, s"value '$v' lost")
    }
  }

  test("bucketed + sorted table write (CLUSTERED BY ... SORTED BY ... INTO n BUCKETS)") {
    Tables.register(spark, LocalSpark.sf)
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.table("orders")
      .write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    assert(spark.table("orders_bucketed").count() == 1500)
    // bucketed self-join plans without an Exchange on the bucketed side
    val j = spark.table("orders_bucketed").groupBy("o_custkey").count()
    val plan = j.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation should not reshuffle:\n$plan")
  }

  test("multi-insert: one scan fans out to two sinks") {
    Tables.register(spark, LocalSpark.sf)
    val src = spark.table("orders").cache()
    try {
      val d1 = tmp("mi1"); val d2 = tmp("mi2")
      src.where($"o_orderstatus" === "F")
        .select("o_orderkey", "o_totalprice").write.mode("overwrite").parquet(d1)
      src.where($"o_totalprice" > 300000)
        .select("o_orderkey", "o_custkey").write.mode("overwrite").parquet(d2)
      val n1 = spark.read.parquet(d1).count()
      val n2 = spark.read.parquet(d2).count()
      assert(n1 > 0 && n2 > 0)
      assert(n1 == src.where($"o_orderstatus" === "F").count())
    } finally src.unpersist()
  }

  // spark-avro datasource module is not in /opt/spark/jars (only avro core
  // libs), so the avro round-trip is not testable here; csv/json/orc/parquet
  // cover the SURVEY.md §2.2 format surface.
  test("format round-trips: csv, json, orc") {
    Tables.register(spark, LocalSpark.sf)
    val df = spark.table("nation").orderBy("n_nationkey")
    val base = tmp("fmt")
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    df.write.mode("overwrite").json(s"$base/json")
    df.write.mode("overwrite").orc(s"$base/orc")
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$base/csv")
    val json = spark.read.json(s"$base/json")
    val orc = spark.read.orc(s"$base/orc")
    Seq(csv, json, orc).foreach(r => assert(r.count() == 25))
    assert(orc.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ==
      df.collect().map(_.getString(1)).toSeq)
  }

  test("SMB join: two co-bucketed co-sorted tables join without exchanges") {
    Tables.register(spark, LocalSpark.sf)
    spark.sql("DROP TABLE IF EXISTS smb_orders")
    spark.sql("DROP TABLE IF EXISTS smb_lineitem")
    spark.table("orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("smb_orders")
    spark.table("lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("smb_lineitem")
    // force SMJ (not broadcast) to show the bucket-aligned merge join
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("smb_lineitem").join(spark.table("smb_orders"),
        $"l_orderkey" === $"o_orderkey")
      val p = j.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle either side:\n$p")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("SequenceFile round-trip via the Hadoop RDD path (legacy format)") {
    // Hive's SequenceFile storage (QL/io/HiveSequenceFileOutputFormat)
    // has no DataFrame source; the supported Spark path is the Hadoop
    // RDD API with a text codec at the edge
    Tables.register(spark, LocalSpark.sf)
    val dir = tmp("seqf") + "/data"
    val rows = spark.table("nation")
      .selectExpr("n_nationkey", "concat_ws('|', n_name, CAST(n_regionkey AS STRING))")
      .collect().map(r => (r.getInt(0).toLong, r.getString(1)))
    spark.sparkContext.parallelize(rows.toSeq, 2).saveAsSequenceFile(dir)
    val back = spark.sparkContext.sequenceFile[Long, String](dir)
      .map { case (k, v) =>
        val parts = v.split('|'); (k, parts(0), parts(1).toInt)
      }
    import spark.implicits._
    val df = back.toDF("n_nationkey", "n_name", "n_regionkey")
    assert(df.count() == 25)
    val expect = spark.table("nation").orderBy("n_nationkey")
      .collect().map(_.getString(1)).toSeq
    assert(df.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq == expect)
  }

  test("ORC predicate pushdown survives the round-trip") {
    Tables.register(spark, LocalSpark.sf)
    val base = tmp("orcpd")
    spark.table("lineitem").write.mode("overwrite").orc(base)
    val q = spark.read.orc(base).where($"l_quantity" < 2).select("l_orderkey")
    assert(q.count() > 0)
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters: [") && scan.contains("l_quantity"),
      s"expected pushed filter in:\n$scan")
  }

  test("malformed-row tolerance: Hive's forgiving text serde vs strict modes") {
    // Hive's LazySimpleSerDe never fails a query on a bad row — short
    // rows pad with NULL, unparseable numerics read as NULL. Spark's
    // CSV modes map the contract: PERMISSIVE is the Hive behavior,
    // DROPMALFORMED trades rows for cleanliness, FAILFAST surfaces
    // corruption loudly. At 100 TB some fraction of any text corpus IS
    // malformed, so the default path must be the tolerant one.
    import org.apache.spark.sql.types._
    val dir = tmp("malformed")
    val fs = new java.io.PrintWriter(new java.io.File(dir + "/part-00000.csv"))
    fs.write("1,alpha,10\n2,beta\nnot_a_number,gamma,30\n4,delta,40\n")
    fs.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", LongType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").csv(dir).collect()
    assert(permissive.length == 4)
    // short row: missing column is NULL; bad numeric: cell is NULL
    assert(permissive.exists(r => r.getLong(0) == 2L && r.isNullAt(2)))
    assert(permissive.exists(r => r.isNullAt(0) && r.getString(1) == "gamma"))
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").csv(dir).collect()
    assert(dropped.map(_.getLong(0)).toSet == Set(1L, 4L), dropped.mkString(","))
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST").csv(dir).collect()
    }
  }

  test("schema evolution: merged read NULLs absent columns, prunes to the merged projection") {
    val (g1, g2) = graft.sources.SchemaEvolutionIO.writeFixture(spark, LocalSpark.sf)
    val merged = graft.sources.SchemaEvolutionIO.readMerged(spark, g1, g2)
    // name-based union despite the generations' different column order
    assert(merged.columns.toSet ==
      Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))
    // pre-ALTER rows surface NULL for the evolved column, post-ALTER never
    import org.apache.spark.sql.functions._
    val byGen = merged.groupBy((col("o_orderkey") % 2).as("g"))
      .agg(count(lit(1)).as("n"), count(col("o_orderpriority")).as("np"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byGen(0L)._2 == 0L && byGen(1L)._2 == byGen(1L)._1)
    // column pruning plans against the MERGED schema: a 2-column
    // projection must not read the other columns
    val plan = merged.select("o_orderkey", "o_orderpriority")
      .queryExecution.executedPlan.toString
    assert(plan.contains("o_orderpriority"))
    assert(!plan.contains("o_totalprice"), "merged-schema scan failed to prune")
  }
}
