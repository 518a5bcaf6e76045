package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ExportImport

/** EXPORT/IMPORT bundle round-trips (SURVEY.md §2.3 TOK_EXPORT /
  * TOK_IMPORT): data + metadata dump, re-import under a new database
  * with partitions recovered — Hive ExportSemanticAnalyzer territory. */
class ExportImportSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_exim").toString

  test("partitioned export round-trips through external import") {
    Tables.register(spark, LocalSpark.sf)
    val orders = spark.table("orders")
    val dest = s"${freshDir()}/bundle"
    ExportImport.exportTable(orders, dest, Seq("o_orderstatus"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dest, "_graft_metadata.json")))

    val imported = ExportImport.importTable(
      spark, dest, "graft_exim_test.orders_rt", overwrite = true)
    assert(imported.count() == orders.count())
    // partitions recovered into the catalog
    val parts = spark.sql("SHOW PARTITIONS graft_exim_test.orders_rt")
      .collect().map(_.getString(0)).toSet
    val statuses = orders.select("o_orderstatus").distinct()
      .collect().map(r => s"o_orderstatus=${r.getString(0)}").toSet
    assert(parts == statuses, s"$parts vs $statuses")
    // schema preserved exactly (partition col moves to the end)
    assert(imported.columns.toSet == orders.columns.toSet)
    // values identical: compare an exact aggregate
    val a = orders.agg(sum("o_orderkey"), count(lit(1))).head
    val b = imported.agg(sum("o_orderkey"), count(lit(1))).head
    assert(a == b)
    // partition pruning works against the imported table
    val pruned = spark.table("graft_exim_test.orders_rt")
      .where(col("o_orderstatus") === "F")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters"))
  }

  test("unpartitioned export round-trips, types preserved from manifest") {
    Tables.register(spark, LocalSpark.sf)
    val nation = spark.table("nation")
    val dest = s"${freshDir()}/bundle"
    ExportImport.exportTable(nation, dest)
    val imported = ExportImport.importTable(
      spark, dest, "graft_exim_test.nation_rt", overwrite = true)
    assert(imported.schema == nation.schema)
    assert(imported.count() == 25)
  }

  test("managed import copies into warehouse storage and drops the stage") {
    Tables.register(spark, LocalSpark.sf)
    val region = spark.table("region")
    val dest = s"${freshDir()}/bundle"
    ExportImport.exportTable(region, dest, Seq("r_name"))
    val imported = ExportImport.importTableManaged(
      spark, dest, "graft_exim_test.region_managed", overwrite = true)
    assert(imported.count() == 5)
    // stage table cleaned up
    val tables = spark.sql("SHOW TABLES IN graft_exim_test")
      .collect().map(_.getString(1)).toSet
    assert(!tables.exists(_.contains("graft_import_stage")), tables.toString)
    // managed: location is under the warehouse, not the bundle
    val loc = spark.sql("DESCRIBE EXTENDED graft_exim_test.region_managed")
      .collect().find(_.getString(0) == "Location").map(_.getString(1)).get
    assert(!loc.contains(dest) &&
      loc.contains(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")), loc)
  }

  test("bucketed table round-trips: spec carried in manifest, SMB join exchange-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_exim_test")
    def mkBucketed(name: String, df: org.apache.spark.sql.DataFrame,
                   key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS graft_exim_test.$name")
      df.write.mode("overwrite").bucketBy(4, key).sortBy(key)
        .saveAsTable(s"graft_exim_test.$name")
    }
    mkBucketed("li_bsrc",
      spark.table("lineitem").where(col("l_orderkey") <= 1000), "l_orderkey")
    mkBucketed("ord_bsrc",
      spark.table("orders").where(col("o_orderkey") <= 1000), "o_orderkey")

    val base = freshDir()
    ExportImport.exportCatalogTable(spark, "graft_exim_test.li_bsrc", s"$base/li")
    ExportImport.exportCatalogTable(spark, "graft_exim_test.ord_bsrc", s"$base/ord")
    // the manifest carries the bucket spec (no silent metadata loss)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/li", "_graft_metadata.json")), "UTF-8")
    assert(manifest.contains("l_orderkey") && manifest.contains("numBuckets"),
      manifest)

    val li = ExportImport.importTable(
      spark, s"$base/li", "graft_exim_test.li_brt", overwrite = true)
    val ord = ExportImport.importTable(
      spark, s"$base/ord", "graft_exim_test.ord_brt", overwrite = true)
    assert(li.count() == spark.table("graft_exim_test.li_bsrc").count())
    // DESCRIBE shows the re-applied bucket spec
    val desc = spark.sql("DESCRIBE EXTENDED graft_exim_test.li_brt")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets=4") && desc.contains("l_orderkey"), desc)

    // the re-imported pair still plans an exchange-free SMB join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val root =
      try spark.sql("""
        SELECT /*+ MERGE(l) */ o.o_orderstatus, COUNT(*) AS n
        FROM graft_exim_test.li_brt l
        JOIN graft_exim_test.ord_brt o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus""").queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val p = root.toString()
    assert(p.contains("SortMergeJoin"), p)
    val preJoin = root.collect { case e: ShuffleExchangeExec => e }
      .filter(_.output.exists(a => a.name == "l_orderkey" || a.name == "o_orderkey"))
    assert(preJoin.isEmpty,
      s"re-imported bucketed join must not shuffle its inputs:\n$p")
  }

  test("partition-scoped export ships one partition; import recovers only it") {
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_exim_test")
    spark.sql("DROP TABLE IF EXISTS graft_exim_test.sup_psrc")
    spark.table("supplier").write.mode("overwrite")
      .partitionBy("s_nationkey").saveAsTable("graft_exim_test.sup_psrc")

    val base = freshDir()
    ExportImport.exportCatalogTable(spark, "graft_exim_test.sup_psrc",
      s"$base/one", partitionSpec = Seq("s_nationkey" -> "3"))
    // bundle data holds exactly the selected subtree
    val dataDirs = new java.io.File(s"$base/one/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dataDirs == Set("s_nationkey=3"), dataDirs.toString)

    val imported = ExportImport.importTable(
      spark, s"$base/one", "graft_exim_test.sup_prt", overwrite = true)
    val parts = spark.sql("SHOW PARTITIONS graft_exim_test.sup_prt")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("s_nationkey=3"), parts.toString)
    val expect = spark.table("graft_exim_test.sup_psrc")
      .where(col("s_nationkey") === 3)
    assert(imported.count() == expect.count() && imported.count() > 0)
    assert(imported.agg(sum("s_suppkey")).head ==
      expect.agg(sum("s_suppkey")).head)

    // a spec that skips the leading partition column is rejected
    val e = intercept[IllegalArgumentException] {
      ExportImport.exportCatalogTable(spark, "graft_exim_test.sup_psrc",
        s"$base/bad", partitionSpec = Seq("nope" -> "1"))
    }
    assert(e.getMessage.contains("partition spec"), e.getMessage)
    // a missing partition value fails loudly, not an empty bundle
    val e2 = intercept[IllegalArgumentException] {
      ExportImport.exportCatalogTable(spark, "graft_exim_test.sup_psrc",
        s"$base/gone", partitionSpec = Seq("s_nationkey" -> "9999"))
    }
    assert(e2.getMessage.contains("no such partition"), e2.getMessage)
  }

  test("partition-scoped IMPORT registers one partition of a whole-table bundle") {
    Tables.register(spark, LocalSpark.sf)
    val orders = spark.table("orders")
    val dest = s"${freshDir()}/bundle"
    ExportImport.exportTable(orders, dest, Seq("o_orderstatus"))
    val imported = ExportImport.importTable(
      spark, dest, "graft_exim_test.orders_ponly", overwrite = true,
      partitionSpec = Seq("o_orderstatus" -> "F"))
    val parts = spark.sql("SHOW PARTITIONS graft_exim_test.orders_ponly")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("o_orderstatus=F"), parts.toString)
    val expect = orders.where(col("o_orderstatus") === "F")
    assert(imported.count() == expect.count() && imported.count() > 0)
    // the other statuses exist in the bundle but are NOT registered
    assert(imported.count() < orders.count())
    // missing partition value fails loudly
    val e = intercept[IllegalArgumentException] {
      ExportImport.importTable(spark, dest, "graft_exim_test.orders_pnone",
        overwrite = true, partitionSpec = Seq("o_orderstatus" -> "ZZ"))
    }
    assert(e.getMessage.contains("no such partition"), e.getMessage)
  }

  test("partition-scoped export of a bucketed+partitioned table keeps the bucket spec") {
    Tables.register(spark, LocalSpark.sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_exim_test")
    spark.sql("DROP TABLE IF EXISTS graft_exim_test.ord_pbsrc")
    spark.table("orders").where(col("o_orderkey") <= 2000)
      .write.mode("overwrite")
      .partitionBy("o_orderstatus").bucketBy(4, "o_custkey")
      .saveAsTable("graft_exim_test.ord_pbsrc")

    val base = freshDir()
    ExportImport.exportCatalogTable(spark, "graft_exim_test.ord_pbsrc",
      s"$base/f", partitionSpec = Seq("o_orderstatus" -> "F"))
    val imported = ExportImport.importTable(
      spark, s"$base/f", "graft_exim_test.ord_pbrt", overwrite = true)
    val expect = spark.table("graft_exim_test.ord_pbsrc")
      .where(col("o_orderstatus") === "F")
    assert(imported.count() == expect.count() && imported.count() > 0)
    // the verbatim subtree copy + manifest round-trip re-applied the
    // bucket spec (bucket ids live in the preserved file names)
    val desc = spark.sql("DESCRIBE EXTENDED graft_exim_test.ord_pbrt")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets=4") && desc.contains("o_custkey"), desc)
  }

  test("import refuses a directory that is not a bundle") {
    val notABundle = freshDir()
    val e = intercept[IllegalArgumentException] {
      ExportImport.importTable(spark, notABundle, "graft_exim_test.nope")
    }
    assert(e.getMessage.contains("_graft_metadata.json"))
  }

  test("export refuses to overwrite an existing bundle's data") {
    Tables.register(spark, LocalSpark.sf)
    val region = spark.table("region")
    val dest = s"${freshDir()}/bundle"
    ExportImport.exportTable(region, dest)
    intercept[Exception] { ExportImport.exportTable(region, dest) }
  }
}
