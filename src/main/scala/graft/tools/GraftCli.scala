package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI entry point (SURVEY §3.1 #1: `CLI/CliDriver.java` `main → run →
  * executeDriver → processLine → processCmd`): batch SQL execution
  * with Hive CLI's surface shape — `-e "sql"` inline, `-f script`
  * files, `;`-separated statements, `--`/`#` comments, tab-separated
  * output with `NULL` for nulls (CliDriver's default print path).
  * Statements run against a session with the graft extensions and,
  * when `--sf <dir>` is given, the testdata tables registered — so a
  * migrating `hive -f etl.sql` invocation maps 1:1.
  *
  * The third reference entry point (programmatic `new Driver(conf)`)
  * is the library surface itself (`SparkEntry`/`spark.sql`); the
  * thrift one is ThriftServerSpec. */
object GraftCli {

  def main(args: Array[String]): Unit = {
    var sql: Option[String] = None
    var file: Option[String] = None
    var sf: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-e" => sql = Some(args(i + 1)); i += 2
        case "-f" => file = Some(args(i + 1)); i += 2
        case "--sf" => sf = Some(args(i + 1)); i += 2
        case other => sys.error(s"unknown argument: $other")
      }
    }
    val script = (sql, file) match {
      case (Some(s), None) => s
      case (None, Some(f)) =>
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8")
      case _ => sys.error("exactly one of -e <sql> / -f <file> required")
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_CLI_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-cli-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    sf.foreach(dir => graft.Tables.register(spark, dir))

    try {
      statements(script).foreach { stmt =>
        val df = spark.sql(stmt)
        // CliDriver print shape: tab-separated cells, NULL for nulls.
        // LocalIterator: results stream to stdout without materializing
        // the full set on the driver heap.
        df.toLocalIterator().forEachRemaining { row =>
          println((0 until row.length)
            .map(j => if (row.isNullAt(j)) "NULL" else row.get(j).toString)
            .mkString("\t"))
        }
      }
    } finally spark.stop()
  }

  /** Split a script on top-level `;` (quote-aware), dropping blank
    * statements and `--` / `#` comment lines — CliDriver.processLine's
    * contract. */
  private[graft] def statements(script: String): Seq[String] = {
    val noComments = script.linesIterator
      .filterNot(l => l.trim.startsWith("--") || l.trim.startsWith("#"))
      .mkString("\n")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < noComments.length) {
      val c = noComments(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < noComments.length) {
          cur.append(noComments(i + 1)); i += 1
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c)
        case ';' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
