package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up generator: replicates an existing SF directory
  * K× (default 10) into `<dest>`, preserving the statistical shape the
  * operators care about rather than naively copying rows:
  *
  *  - fact keys (order/part/supp/cust/user/doc/vec/event ids) get a
  *    per-replica offset, keeping every foreign-key join consistent
  *    and key cardinality growing linearly;
  *  - dimension tables (nation, region) do NOT scale — as in any real
  *    warehouse decade;
  *  - document text gets a tiny per-replica salt (with n_chars kept
  *    consistent) so the dedup family sees 10× corpus, not a fake
  *    all-pairs duplicate explosion that no real corpus has;
  *  - embeddings get a per-replica micro-perturbation on dim 0 so ANN
  *    bucket structure densifies realistically instead of collapsing
  *    into exact-duplicate points.
  *
  * Output is NEVER oracled — it exists purely for measured scaling
  * exponents (BASELINE.md "scale evidence"). Usage:
  *   runMain graft.tools.ScaleGen /root/testdata/sf0.1 target/sf1 [10]
  */
object ScaleGen {

  private val Off = 1000000000L // per-replica key offset (> any fixture key)

  def main(args: Array[String]): Unit = {
    val (src, dest) = (args(0), args(1))
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = Runtime.getRuntime.availableProcessors.toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(t: String)(f: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val reps = spark.range(k).withColumnRenamed("id", "graft_r")
      val out = f(base.crossJoin(reps), col("graft_r")).drop("graft_r")
      out.write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scalegen] $t: ${out.count()} rows")
    }
    def offsetKeys(keys: String*)(df: DataFrame, r: org.apache.spark.sql.Column): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + r * Off))

    // dimensions: copy, don't scale
    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scalegen] $t: copied")
    }
    replicate("customer")(offsetKeys("c_custkey"))
    replicate("supplier")(offsetKeys("s_suppkey"))
    // p_name gets a per-replica ALPHABET ROTATION: entity-linking
    // queries block on name prefix+length, and (a) verbatim 10× name
    // copies explode every block 100× with exact dupes, while (b) a
    // shared synthetic prefix collapses ALL parts into 10 giant
    // blocks — both artifacts no real 10×-bigger catalog has. Rotating
    // the lowercase alphabet per replica yields 10 disjoint
    // vocabularies with the ORIGINAL per-replica block-size
    // distribution (prefix diversity and name lengths preserved), so
    // per-block work replicates linearly — the honest decade.
    locally {
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val reps = (0 until k).map { r =>
        val rot = alpha.drop(r) + alpha.take(r)
        spark.read.parquet(s"$src/part.parquet")
          .withColumn("p_partkey", col("p_partkey") + lit(r.toLong * Off))
          .withColumn("p_name", translate(col("p_name"), alpha, rot))
      }
      val out = reps.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dest/part.parquet")
      println(s"[scalegen] part: ${out.count()} rows")
    }
    replicate("orders")(offsetKeys("o_orderkey", "o_custkey"))
    replicate("lineitem")(offsetKeys("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events")(offsetKeys("event_id", "user_id"))
    replicate("documents") { (df, r) =>
      offsetKeys("doc_id")(df, r)
        .withColumn("text", concat(col("text"), lit(" zq"), r.cast("string")))
        .withColumn("n_chars",
          col("n_chars") + lit(3) + length(r.cast("string")))
    }
    replicate("embeddings") { (df, r) =>
      offsetKeys("vec_id")(df, r)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + (r * lit(1e-4)).cast("float")).otherwise(x)))
    }
    spark.stop()
  }
}
