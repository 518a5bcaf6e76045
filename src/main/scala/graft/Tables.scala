package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver-generated parquet testdata (TESTDATA.md) as temp
  * views so queries can be expressed in the Hive-ish SQL dialect Spark SQL
  * natively accepts (SURVEY.md §2.3 — no custom parser).
  *
  * Views are cheap catalog entries over parquet scans: Catalyst still gets
  * full predicate pushdown / column pruning / partition pruning through
  * them, so at 100 TB the scan only reads what each query touches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // skip re-registration while the session's views already point at this
  // sfDir: re-reading 10 parquet footers per query is pure overhead.
  // Temp views are PER SparkSession, so key by the session itself
  // (weakly — sessions must stay collectable), remembering only the
  // LAST dir: switching sfDir must re-register.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def register(spark: SparkSession, sfDir: String): Unit = {
    if (registered.get(spark) == sfDir) return
    // events.ts precision varies across testdata generations: TIMESTAMP
    // (NANOS) (read as a nanos long under the legacy flag, floor-divided
    // to µs — integer div, double division would lose precision above
    // 2^53) or plain timestamp[us] (read as TIMESTAMP_NTZ). Normalize
    // both to session-TZ TimestampType (session TZ is pinned UTC, so the
    // NTZ→TZ cast is value-preserving) — queries and the DuckDB oracle
    // then see identical µs instants either way (FIXTURES.md §2).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names.foreach { t =>
      val raw = spark.read.parquet(s"$sfDir/$t.parquet")
      val df =
        if (t == "events") {
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.types._
          raw.schema("ts").dataType match {
            case LongType => // nanos-as-long generation
              raw.withColumn("ts",
                timestamp_micros(expr("CAST(ts DIV 1000L AS LONG)")))
            case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
          }
        } else raw
      df.createOrReplaceTempView(t)
    }
    // memoize only after every view registered: a partial failure must
    // re-throw on the next query, not cascade into missing-view errors
    registered.put(spark, sfDir)
  }

  /** Drop the memoized sfDir for this session so the NEXT register()
    * call re-reads the parquet views even for the same dir. Test hook:
    * specs that temporarily replace a view (e.g. planting a document)
    * restore the pristine views with invalidate+register instead of
    * bouncing through a sibling testdata dir that may not exist. */
  def invalidate(spark: SparkSession): Unit = registered.remove(spark)

  /** Standard shape of a harness query: register views, run SQL. */
  def sql(q: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => { register(spark, sfDir); spark.sql(q) }
}
