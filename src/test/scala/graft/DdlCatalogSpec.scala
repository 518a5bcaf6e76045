package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DDL / catalog statement surface (SURVEY.md §2.3: TOK_CREATETABLE/
  * VIEW/DATABASE, SHOW/DESCRIBE, TOK_ANALYZE, INSERT INTO/OVERWRITE) —
  * Hive DDLSemanticAnalyzer territory, all native Spark SQL here. */
class DdlCatalogSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  test("database + managed table lifecycle with INSERT INTO/OVERWRITE") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.t1")
    spark.sql("""CREATE TABLE graft_db.t1 (k INT, v STRING)
                 USING parquet PARTITIONED BY (ds STRING)""")
    spark.sql("INSERT INTO graft_db.t1 PARTITION (ds='2024-01-01') VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO graft_db.t1 PARTITION (ds='2024-01-02') VALUES (3,'c')")
    assert(spark.table("graft_db.t1").count() == 3)
    // dynamic-partition overwrite of one partition only
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.sql("INSERT OVERWRITE TABLE graft_db.t1 PARTITION (ds='2024-01-01') VALUES (9,'z')")
    val left = spark.table("graft_db.t1").orderBy("k").collect().map(_.getInt(0)).toSeq
    assert(left == Seq(3, 9), left.toString)
    // partition pruning against the catalog table
    val pruned = spark.table("graft_db.t1").where(col("ds") === "2024-01-02")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() == 1)
  }

  test("SHOW / DESCRIBE surface") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    assert(spark.sql("SHOW DATABASES").collect().map(_.getString(0)).contains("graft_db"))
    spark.sql("CREATE TABLE IF NOT EXISTS graft_db.t2 (x INT) USING parquet")
    assert(spark.sql("SHOW TABLES IN graft_db").collect().nonEmpty)
    val cols = spark.sql("DESCRIBE graft_db.t2").collect().map(_.getString(0))
    assert(cols.contains("x"))
    assert(spark.sql("SHOW FUNCTIONS LIKE 'sum'").collect().nonEmpty)
  }

  test("SHOW PARTITIONS + MSCK REPAIR for externally-added partitions") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.ext_p")
    val dir = java.nio.file.Files.createTempDirectory("extp").toString
    spark.sql(s"""CREATE TABLE graft_db.ext_p (k INT) USING parquet
                  PARTITIONED BY (ds STRING) LOCATION '$dir'""")
    spark.sql("INSERT INTO graft_db.ext_p PARTITION (ds='a') VALUES (1)")
    // drop a partition directory in behind the catalog's back
    spark.range(5).selectExpr("CAST(id AS INT) AS k")
      .write.parquet(s"$dir/ds=b")
    spark.sql("MSCK REPAIR TABLE graft_db.ext_p")
    val parts = spark.sql("SHOW PARTITIONS graft_db.ext_p")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("ds=a", "ds=b"), parts.toString)
    assert(spark.table("graft_db.ext_p").count() == 6)
  }

  test("EXPLAIN statement and DESCRIBE FUNCTION") {
    Tables.register(spark, LocalSpark.sf)
    val ex = spark.sql("EXPLAIN EXTENDED SELECT COUNT(*) FROM orders WHERE o_orderkey < 10")
      .collect()(0).getString(0)
    assert(ex.contains("Physical Plan") && ex.contains("PushedFilters"), ex)
    val df = spark.sql("DESCRIBE FUNCTION EXTENDED percentile_approx")
      .collect().map(_.getString(0)).mkString("\n")
    assert(df.contains("percentile_approx"), df)
  }

  test("SHOW CREATE TABLE and EXPORT/IMPORT-style relocation") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.exp_src")
    spark.sql("DROP TABLE IF EXISTS graft_db.exp_dst")
    Tables.register(spark, LocalSpark.sf)
    spark.table("nation").write.saveAsTable("graft_db.exp_src")
    val ddl = spark.sql("SHOW CREATE TABLE graft_db.exp_src")
      .collect()(0).getString(0)
    assert(ddl.contains("CREATE TABLE") && ddl.contains("n_name"), ddl)
    // Hive EXPORT TABLE ... TO / IMPORT: data+schema relocation — the
    // Spark equivalent is a self-describing parquet copy
    val dir = java.nio.file.Files.createTempDirectory("export").toString
    spark.table("graft_db.exp_src").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).write.saveAsTable("graft_db.exp_dst")
    assert(spark.table("graft_db.exp_dst").count() ==
      spark.table("graft_db.exp_src").count())
  }

  test("views: logical, expanded at plan time (Hive TOK_CREATEVIEW)") {
    Tables.register(spark, LocalSpark.sf)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW big_orders AS
                 SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                 WHERE o_totalprice > 400000""")
    val n = spark.sql("SELECT COUNT(*) FROM big_orders").collect()(0).getLong(0)
    assert(n > 0)
    // the view expands: filter reaches the parquet scan
    val p = spark.sql("SELECT o_orderkey FROM big_orders").queryExecution
      .executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("o_totalprice"), p)
  }

  test("Hive multi-insert statement: FROM src INSERT ... INSERT ...") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.mi_a")
    spark.sql("DROP TABLE IF EXISTS graft_db.mi_b")
    spark.sql("CREATE TABLE graft_db.mi_a (k BIGINT, p DOUBLE) USING parquet")
    spark.sql("CREATE TABLE graft_db.mi_b (k BIGINT, c BIGINT) USING parquet")
    Tables.register(spark, LocalSpark.sf)
    // Hive's signature one-scan-many-sinks statement, parsed natively
    spark.sql("""
      FROM orders
      INSERT OVERWRITE TABLE graft_db.mi_a
        SELECT o_orderkey, o_totalprice WHERE o_orderstatus = 'F'
      INSERT OVERWRITE TABLE graft_db.mi_b
        SELECT o_custkey, COUNT(*) GROUP BY o_custkey
    """)
    val na = spark.table("graft_db.mi_a").count()
    val nb = spark.table("graft_db.mi_b").count()
    assert(na > 0 && nb > 0)
    val expectA = spark.table("orders").where(col("o_orderstatus") === "F").count()
    assert(na == expectA)
  }

  test("ANALYZE TABLE + CBO statistics") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    spark.sql("DROP TABLE IF EXISTS graft_db.li_stats")
    Tables.register(spark, LocalSpark.sf)
    spark.table("lineitem").limit(1000).write.saveAsTable("graft_db.li_stats")
    spark.sql("ANALYZE TABLE graft_db.li_stats COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_quantity")
    val desc = spark.sql("DESCRIBE EXTENDED graft_db.li_stats l_quantity")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("distinct_count").exists(_ != "NULL"), desc.toString)
    // stats feed the optimizer when CBO is on
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val stats = spark.table("graft_db.li_stats").queryExecution
      .optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == 1000L), stats.toString)
  }
}
