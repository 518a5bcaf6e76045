package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantiles

/** The two-level exact-quantile primitive (r17, closing the r16 verdict
  * weak): brute-force equality under ties/duplicates/negatives, the
  * empty-input guard, and the PLAN gates that pin the bounded-state
  * shape — every unpartitioned cumulative window must read either the
  * FLOOR integer-grid aggregate (level 1, bounded by the value RANGE)
  * or the single boundary bucket (level 2, bounded by the decimal
  * grid), never the raw value rows. */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  /** Reference semantics, literally: min v with count(<= v)*den >= n*num. */
  private def brute(vals: Seq[Double], num: Long, den: Long): Double = {
    if (vals.isEmpty) return Double.NegativeInfinity
    val sorted = vals.sorted
    val n = sorted.length.toLong
    // the value at the first crossing rank IS the min value meeting the
    // cum criterion (for any v' < it, cum(v') <= that rank - 1 < cut)
    sorted.zipWithIndex
      .find { case (_, i) => (i + 1).toLong * den >= n * num }
      .map(_._1).getOrElse(sorted.last)
  }

  // capacity classification only — the generic grids here all sit far
  // inside the perplexity domain's declared range
  private val Dom = Quantiles.Domains.Perplexity6dp

  private def cut(vals: Seq[Double], num: Long, den: Long): Double =
    Quantiles.exactCutoff(vals.toDF("x"), "x", num, den, Dom)

  test("matches brute force on seeded grids with heavy ties") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(400)
      // 2-dp grid spanning several integer buckets, duplicates likely;
      // negatives included (FLOOR, not truncation, must drive level 1)
      val vals = Seq.fill(n)(
        math.round((rnd.nextDouble() * 40 - 10) * 100) / 100.0)
      for ((num, den) <- Seq((2L, 3L), (1L, 2L), (1L, 4L), (9L, 10L), (1L, 1L)))
        assert(cut(vals, num, den) == brute(vals, num, den),
          s"trial=$trial num=$num den=$den n=$n")
    }
  }

  test("all-ties, single-value, and single-bucket inputs") {
    assert(cut(Seq(7.25, 7.25, 7.25), 2, 3) == 7.25)
    assert(cut(Seq(42.0), 2, 3) == 42.0)
    // every value inside ONE integer bucket: level 1 degenerates to a
    // single grid row, level 2 does all the work
    val oneBucket = Seq(3.1, 3.2, 3.2, 3.4, 3.9)
    assert(cut(oneBucket, 2, 3) == brute(oneBucket, 2, 3))
  }

  test("num=0 returns the minimum value, num=den the maximum") {
    val vals = Seq(5.5, 2.25, 9.75, 2.25)
    assert(cut(vals, 0, 1) == 2.25)
    assert(cut(vals, 1, 1) == 9.75)
  }

  test("empty and all-null input returns -Infinity, not an NPE") {
    assert(cut(Seq.empty[Double], 2, 3) == Double.NegativeInfinity)
    val nulls = Seq[java.lang.Double](null, null).toDF("x")
    assert(Quantiles.exactCutoff(nulls, "x", 2, 3, Dom) == Double.NegativeInfinity)
  }

  test("NaN rows are excluded like NULL, never counted into bucket 0") {
    // without the isnan guard, Spark's double->long cast lands NaN in
    // integer bucket 0 — below every real value — skewing n and t
    val vals = Seq(Double.NaN, Double.NaN, Double.NaN, 5.0, 6.0, 7.0)
    assert(cut(vals, 2, 3) == 6.0) // the 2/3 cut of {5, 6, 7} alone
    assert(cut(Seq(Double.NaN), 2, 3) == Double.NegativeInfinity)
  }

  // Both gates pin the ANALYZED plan: on LocalRelation test inputs the
  // optimizer constant-folds FLOOR away, and it can only ever push the
  // bucket filter further DOWN (never above a window), so the analyzed
  // shape is the conservative invariant.

  test("plan gate: level-1 window reads the FLOOR grid aggregate, not raw rows") {
    val v = Seq.fill(100)(1.0).toDF("x")
      .select(col("x").cast("double").as("v"))
    val p = Quantiles.gridHitDf(v, 2, 3).queryExecution.analyzed.toString()
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, p)
    // plans print top-down: the grid Aggregate must sit BELOW the window
    val aggIdx = p.indexOf("Aggregate", wIdx)
    assert(aggIdx > wIdx && p.substring(aggIdx).contains("FLOOR"),
      s"level-1 window must consume the FLOOR(v) grid aggregate:\n$p")
  }

  test("plan gate: level-2 window sits above the single-bucket filter") {
    val v = Seq(1.5, 2.5).toDF("x")
      .select(col("x").cast("double").as("v"))
    val p = Quantiles.refineDf(v, gstar = 2L, below = 1L, n = 2L,
      num = 2L, den = 3L).queryExecution.analyzed.toString()
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, p)
    val fIdx = p.indexOf("FLOOR", wIdx)
    assert(fIdx > wIdx,
      s"level-2 window must consume only the g* bucket (FLOOR filter below it):\n$p")
  }

  test("domain registry: reviewed classes pinned; unregistered domains rejected") {
    // the registry IS the review surface — a new caller must land here
    assert(Quantiles.Domains.reviewed.map(d =>
      (d.name, d.maxAbs, d.gridStep, d.width)) ==
      Set(("perplexity_6dp", 1e6, 1e-6, 1L)))
    val rogue = Quantiles.ValueDomain("rogue", 10.0, 1e-2)
    val e = intercept[IllegalArgumentException] {
      Quantiles.exactCutoff(Seq(1.0).toDF("x"), "x", 1, 2, rogue)
    }
    assert(e.getMessage.contains("not in Quantiles.Domains"))
  }

  test("a value outside the declared domain fails loudly, never re-grows the grid") {
    val vals = Seq(1.0, 2.0, 3e6) // 3e6 > Perplexity6dp.maxAbs = 1e6
    val e = intercept[IllegalStateException] { cut(vals, 2, 3) }
    assert(e.getMessage.contains("perplexity_6dp") &&
      e.getMessage.contains("re-grow"))
  }

  test("coarse-width grid (wide-range domain) stays exact") {
    // a heavy-tailed statistic's domain gets width > 1; the two-level
    // answer must still equal brute force — exercised on the internals
    // (register a production domain before using this in a query)
    val wide = Quantiles.ValueDomain("wide_test", 1e9, 1.0)
    assert(wide.width == 500)
    val rnd = new scala.util.Random(43)
    val vals = Seq.fill(300)(math.floor(rnd.nextDouble() * 2e8 - 1e8))
    val v = vals.toDF("x").select(col("x").cast("double").as("v"))
    val hit = Quantiles.gridHitDf(v, 2, 3, wide.width).collect()(0)
    val t = Quantiles.refineDf(v, hit.getLong(0), hit.getLong(1),
      hit.getLong(2), 2, 3, wide.width)
      .agg(min(col("v"))).collect()(0).getDouble(0)
    assert(t == brute(vals, 2, 3))
  }

  test("source gate: every production domain construction lives in Quantiles.scala") {
    // the WindowDomainSpec discipline applied to quantile domains: an
    // ad-hoc ValueDomain in operator code bypasses the registry review
    def scalaFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil)
    val offenders = scalaFiles(new java.io.File("src/main/scala"))
      .filterNot(_.getName == "Quantiles.scala")
      .filter(f => java.nio.file.Files.readString(f.toPath)
        .contains("ValueDomain("))
      .map(_.getPath)
    assert(offenders.isEmpty,
      s"ValueDomain constructed outside the reviewed registry: $offenders")
  }

  test("pipeline_curate_ppl's gate equals the primitive's cutoff end-to-end") {
    // the funnel keeps exactly the docs at or under the 2/3 value-domain
    // cut of the PERSISTED scored table — recompute t independently and
    // check the query's max kept ppl / min dropped ppl straddle it
    val q = SparkEntry.queries("pipeline_curate_ppl")(spark, LocalSpark.sf)
      .select(col("ppl")).collect().map(_.getDouble(0))
    val all = operators.TextAnalysis.queries("text_perplexity")(spark, LocalSpark.sf)
      .select(col("ppl")).collect().map(_.getDouble(0))
    val t = {
      val sorted = all.sorted
      sorted.zipWithIndex.find { case (_, i) =>
        (i + 1).toLong * 3 >= sorted.length.toLong * 2 }.get._1
    }
    assert(q.nonEmpty && q.max <= t)
    assert(q.count(_ <= t) == q.length)
  }
}
