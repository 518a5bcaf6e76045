package graft.tools

import org.apache.spark.sql.SparkSession

/** One local-session factory for the ad-hoc tools (Explain, EntrySmoke)
  * so the config block can't drift between copies. Bench/Verify keep
  * their own builders: their configs are part of the driver contract. */
object ToolSession {
  def local(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
