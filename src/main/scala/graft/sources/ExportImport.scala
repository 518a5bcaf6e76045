package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** EXPORT / IMPORT analog (SURVEY.md §2.3 `TOK_EXPORT`/`TOK_IMPORT`;
  * Hive's `ql/parse/ExportSemanticAnalyzer` + `ImportSemanticAnalyzer`
  * with the bundle layout of `ql/parse/EximUtil` in the canonical
  * tree): the warehouse-to-warehouse migration primitive — dump a
  * table to a self-describing directory bundle, re-import it under a
  * fresh catalog/database with partitions recovered.
  *
  * Bundle layout mirrors Hive's (metadata sidecar + data subtree):
  * {{{
  *   <dest>/_graft_metadata.json   # schema, partition spec, format
  *   <dest>/data/[p1=v1/...]*.parquet
  * }}}
  *
  * Spark-first design, 100 TB notes:
  *  - EXPORT is one distributed `DataFrameWriter.partitionBy` job —
  *    the data never routes through the driver; only the ~1 KB
  *    manifest is driver-written.
  *  - IMPORT registers the bundle's `data/` directory as the table
  *    LOCATION (zero-copy — at warehouse scale you move the bundle
  *    with distcp-class tooling, not through an engine) and recovers
  *    partitions from the directory tree (Spark parallelizes the
  *    listing). Hive's copying IMPORT is `importTableManaged`: the
  *    same registration followed by one distributed INSERT OVERWRITE
  *    into a managed table.
  *  - The manifest carries the full Spark schema JSON, so an import
  *    into a session that has never seen the source preserves types
  *    exactly (no inference pass over the data).
  */
object ExportImport {

  private val ManifestName = "_graft_metadata.json"
  private val FormatVersion = 1

  /** Dump `df` as a bundle at `dest` (must not exist or be empty).
    * `partitionCols` become directory-level partitions in `data/`,
    * exactly as the re-imported table will be partitioned. */
  def exportTable(
      df: DataFrame,
      dest: String,
      partitionCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"partition columns not in schema: $missing")
    val writer = df.write.format(format).mode("errorifexists")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).save(s"$dest/data")
    // manifest AFTER the data job: a bundle with a manifest is complete
    // by construction (the reader keys on the manifest, so a killed
    // export leaves a recognizably-partial directory, not a lie).
    // Hadoop FS, not java.nio — the bundle may live on HDFS/object
    // storage, or carry a file: scheme the nio API can't parse.
    val manifest = jsonObj(Seq(
      "version" -> FormatVersion.toString,
      "format" -> quote(format),
      "schema" -> df.schema.json, // already JSON
      "partitionColumns" -> partitionCols.map(quote).mkString("[", ",", "]")
    ))
    val mPath = new Path(dest, ManifestName)
    val fs = mPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(mPath, false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Re-register a bundle as `db.table` (EXTERNAL, zero-copy: the
    * table's LOCATION is the bundle's `data/`). Creates the database
    * if needed, recovers partitions, returns the imported table. */
  def importTable(
      spark: SparkSession,
      src: String,
      target: String,
      overwrite: Boolean = false): DataFrame = {
    val (schema, partitionCols, format) = readManifest(spark, src)
    val (db, tbl) = splitTarget(target)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (overwrite) spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
    val partClause =
      if (partitionCols.nonEmpty)
        s"PARTITIONED BY (${partitionCols.mkString(", ")})"
      else ""
    spark.sql(
      s"""CREATE TABLE $db.$tbl (${schema.toDDL})
         |USING $format $partClause
         |LOCATION '$src/data'""".stripMargin)
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE $db.$tbl")
    spark.table(s"$db.$tbl")
  }

  /** Hive's copying IMPORT: register the bundle, then one distributed
    * INSERT OVERWRITE into a fresh MANAGED table (warehouse-owned
    * storage). The staging external table is dropped afterwards. */
  def importTableManaged(
      spark: SparkSession,
      src: String,
      target: String,
      overwrite: Boolean = false): DataFrame = {
    val (schema, partitionCols, format) = readManifest(spark, src)
    val (db, tbl) = splitTarget(target)
    val stage = s"${tbl}_graft_import_stage"
    importTable(spark, src, s"$db.$stage", overwrite = true)
    try {
      if (overwrite) spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
      val partClause =
        if (partitionCols.nonEmpty)
          s"PARTITIONED BY (${partitionCols.mkString(", ")})"
        else ""
      spark.sql(
        s"""CREATE TABLE $db.$tbl (${schema.toDDL})
           |USING $format $partClause""".stripMargin)
      // data columns first, partition columns last — INSERT matches by
      // position against the table's reordered (data ++ partition) layout
      val dataCols = schema.fieldNames.filterNot(partitionCols.contains)
      val ordered = (dataCols ++ partitionCols).mkString(", ")
      spark.sql(
        s"INSERT OVERWRITE TABLE $db.$tbl SELECT $ordered FROM $db.$stage")
      spark.table(s"$db.$tbl")
    } finally spark.sql(s"DROP TABLE IF EXISTS $db.$stage")
  }

  private def readManifest(
      spark: SparkSession, src: String): (StructType, Seq[String], String) = {
    val mPath = new Path(src, ManifestName)
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mPath),
      s"not a graft export bundle (no $ManifestName): $src")
    val in = fs.open(mPath)
    val text =
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // the manifest is machine-written flat JSON; targeted extraction
    // keeps this dependency-free (schema json is handed to Spark's
    // own parser, which validates it fully)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(extractRaw(text, "schema")).asInstanceOf[StructType]
    val parts = extractRaw(text, "partitionColumns")
      .stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    val format = extractRaw(text, "format")
      .stripPrefix("\"").stripSuffix("\"")
    (schema, parts, format)
  }

  /** Extract the raw value of a top-level key from the flat manifest:
    * scans from `"key":` to the matching end (tracks brace/bracket
    * depth and string state — enough for machine-written JSON). */
  private def extractRaw(json: String, key: String): String = {
    val marker = s""""$key":"""
    val at = json.indexOf(marker)
    require(at >= 0, s"manifest missing key $key")
    var i = at + marker.length
    while (json(i).isWhitespace) i += 1
    val start = i
    var depth = 0
    var inStr = false
    var done = false
    while (!done && i < json.length) {
      val c = json(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' if depth > 0 => depth -= 1
        case ',' | '}' | ']' if depth == 0 => done = true
        case _ =>
      }
      if (!done) i += 1
    }
    json.substring(start, i).trim
  }

  private def splitTarget(target: String): (String, String) =
    target.split('.') match {
      case Array(db, tbl) => (db, tbl)
      case Array(tbl) => ("default", tbl)
      case _ => throw new IllegalArgumentException(
        s"target must be [db.]table, got: $target")
    }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")

  // ------------------------------------------------------------------
  // harness row: full warehouse-migration round trip — EXPORT orders
  // partitioned by status, IMPORT under a fresh database (registering
  // in whatever catalog the session runs — the Hive metastore in the
  // verify harness), aggregate THROUGH the imported catalog table.
  // The oracle computes the same aggregate over the source parquet:
  // equality proves bundle data + manifest schema + partition recovery
  // all survived the trip. Cents-grid money (exact BIGINT sums).
  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_export_import" -> ((spark, sfDir) => {
      graft.Tables.register(spark, sfDir)
      val base = spark.conf.get("spark.sql.warehouse.dir") +
        s"/_graft_fixtures/exim_${java.lang.Integer.toHexString(sfDir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      // supplier partitioned by nation: 25 recovered partitions (the
      // densest partition-recovery shape in the fixtures) at 1/15th of
      // orders' bytes — the bundle mechanics are identical
      exportTable(spark.table("supplier"), s"$base/bundle",
        Seq("s_nationkey"))
      importTable(spark, s"$base/bundle",
        "graft_exim.supplier_imported", overwrite = true)
      spark.sql("""
        SELECT s_nationkey AS nation,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
                 AS BIGINT) AS sum_cents,
               CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
               CAST(MAX(s_suppkey) AS BIGINT) AS max_key
        FROM graft_exim.supplier_imported
        GROUP BY s_nationkey
        ORDER BY nation""")
    })
  )

  val oracle: Map[String, String] = Map(
    "source_export_import" -> """
      SELECT s_nationkey AS nation,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
               AS BIGINT) AS sum_cents,
             CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
             CAST(MAX(s_suppkey) AS BIGINT) AS max_key
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY nation"""
  )
}
