package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: `runMain graft.tools.Explain <query> [sfDir]`
  * prints the formatted physical plan of one harness query — the
  * fastest way to eyeball pushdown (`PushedFilters`/`ReadSchema`),
  * codegen spans, and exchange placement after a change. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // formatted plan first: pushdown detail (ReadSchema/PushedFilters)
    df.explain("formatted")
    // then EXECUTE and print the finalized plan — AQE only renders
    // codegen spans (*(n)) and settled exchange placement after a run
    df.write.mode("overwrite").format("noop").save()
    println("=== finalized plan (post-execution, AQE settled) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
