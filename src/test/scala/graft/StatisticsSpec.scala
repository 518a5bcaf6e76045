package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Statistics

/** Statistical operators (SURVEY.md §2.5 — the layer above Hive's
  * variance/corr UDAFs): each query is cross-checked against an
  * independently-computed Spark spelling, not just its own oracle. */
class StatisticsSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("stats_regression: slope agrees with corr * sd_y/sd_x per nation") {
    val out = Statistics.queries("stats_regression")(spark, LocalSpark.sf)
      .select("nation", "slope", "r2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // independent spelling: Spark's built-in moment aggregates on the
    // same rounded points
    val pts = spark.table("lineitem")
      .join(spark.table("supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey".cast("long").as("nk"),
        round($"l_quantity").as("x"), round($"l_extendedprice").as("y"))
    val ref = pts.groupBy("nk")
      .agg(corr("x", "y").as("c"), stddev_pop("y").as("sy"), stddev_pop("x").as("sx"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1) * r.getDouble(2) / r.getDouble(3)).toMap
    assert(out.keySet == ref.keySet)
    out.foreach { case (nk, (slope, r2)) =>
      assert(math.abs(slope - ref(nk)) < 1e-4, s"nation $nk slope $slope vs ${ref(nk)}")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("stats_chisq: total equals the contribution sum; marginals consistent") {
    val rows = Statistics.queries("stats_chisq")(spark, LocalSpark.sf).collect()
    val total = rows.head.getDouble(5)
    assert(rows.forall(r => math.abs(r.getDouble(5) - total) < 1e-9)) // constant column
    val contribSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(contribSum - total) < 1e-3, s"$contribSum vs $total")
    // expected counts reproduce the observed row marginals exactly
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val obs = cells.map(_.getLong(2)).sum.toDouble
      val exp = cells.map(_.getDouble(3)).sum
      assert(math.abs(obs - exp) < 1e-3, s"row marginal $obs vs $exp")
    }
  }

  test("stats_ttest: antisymmetric in the pair and df within Welch bounds") {
    val rows = Statistics.queries("stats_ttest")(spark, LocalSpark.sf).collect()
    assert(rows.length == 10) // C(5,2) priority pairs
    rows.foreach { r =>
      val (na, nb, diff, t, df) = (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.signum(t) == math.signum(diff) || t == 0.0)
      // Welch df lies between min(na,nb)-1 and na+nb-2
      assert(df >= math.min(na, nb) - 1.0 && df <= na + nb - 2.0,
        s"df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    }
  }

  test("stats_mannwhitney: U agrees with a driver-side pairwise count") {
    val row = Statistics.queries("stats_mannwhitney")(spark, LocalSpark.sf)
      .collect().head
    val (n1, n2, u) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val xs = spark.table("orders")
      .where($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select($"o_orderpriority" === "1-URGENT",
        round($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val g1 = xs.filter(_._1).map(_._2)
    val g2 = xs.filterNot(_._1).map(_._2)
    assert(n1 == g1.length && n2 == g2.length)
    // U = #{(a,b): a>b} + #{ties}/2, the direct definition
    val uRef = (for (a <- g1; b <- g2)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    assert(math.abs(u - uRef) < 1e-6, s"$u vs $uRef")
  }

  test("stats_spearman: agrees with Pearson-on-ranks via Spark builtins") {
    val out = Statistics.queries("stats_spearman")(spark, LocalSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(v => v >= -1.0 && v <= 1.0))
    // independent spelling: rank with Window + built-in corr
    import org.apache.spark.sql.expressions.Window
    val x = spark.table("lineitem").select($"l_returnflag".as("rf"),
      round($"l_quantity").as("a"), round($"l_extendedprice" * 100).as("b"))
    val ranked = x
      .withColumn("ra", rank().over(Window.partitionBy("rf").orderBy("a")) * 2
        + count(lit(1)).over(Window.partitionBy("rf", "a")) - 1)
      .withColumn("rb", rank().over(Window.partitionBy("rf").orderBy("b")) * 2
        + count(lit(1)).over(Window.partitionBy("rf", "b")) - 1)
    val ref = ranked.groupBy("rf").agg(corr("ra", "rb")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { case (rf, rho) =>
      assert(math.abs(rho - ref(rf)) < 1e-5, s"$rf: $rho vs ${ref(rf)}")
    }
  }

  test("stats_theilsen: matches a driver-side pairwise-slope median") {
    val row = Statistics.queries("stats_theilsen")(spark, LocalSpark.sf)
      .collect().head
    val (m, slope) = (row.getLong(0), row.getDouble(1))
    val days = spark.table("orders").where(year($"o_orderdate") === 1995)
      .groupBy(datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- days.indices; j <- (i + 1) until days.length
    } yield (days(j)._2 - days(i)._2).toDouble / (days(j)._1 - days(i)._1)).sorted
    assert(m == slopes.length)
    val medRef =
      if (m % 2 == 1) slopes(slopes.length / 2)
      else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
    assert(math.abs(slope - medRef / 100) < 1e-3, s"$slope vs ${medRef / 100}")
  }

  test("stats_anova: F and sums of squares reproduce from group moments") {
    val row = Statistics.queries("stats_anova")(spark, LocalSpark.sf)
      .collect().head
    val (k, n, ssb, ssw, f) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val vs = spark.table("orders")
      .select($"o_orderpriority", round($"o_totalprice").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(k == vs.map(_._1).distinct.length && n == vs.length)
    val grand = vs.map(_._2.toDouble).sum / n
    val ssbRef = vs.groupBy(_._1).values.map { g =>
      val m = g.map(_._2.toDouble).sum / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val sswRef = vs.groupBy(_._1).values.flatMap { g =>
      val m = g.map(_._2.toDouble).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m))
    }.sum
    assert(math.abs(ssb - ssbRef) < 1e-2 * ssbRef + 10, s"$ssb vs $ssbRef")
    assert(math.abs(ssw - sswRef) < 1e-6 * sswRef + 10, s"$ssw vs $sswRef")
    val fRef = (ssbRef / (k - 1)) / (sswRef / (n - k))
    assert(math.abs(f - fRef) < 1e-3 * math.max(1.0, fRef.abs), s"$f vs $fRef")
  }

  test("stats_ks: D equals the max ECDF gap computed driver-side") {
    val row = Statistics.queries("stats_ks")(spark, LocalSpark.sf)
      .collect().head
    val (n1, n2, d) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val vs = spark.table("orders")
      .where($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select($"o_orderpriority" === "1-URGENT", round($"o_totalprice").cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val g1 = vs.filter(_._1).map(_._2).sorted
    val g2 = vs.filterNot(_._1).map(_._2).sorted
    assert(n1 == g1.length && n2 == g2.length)
    val dRef = (g1 ++ g2).distinct.map { v =>
      math.abs(g1.count(_ <= v).toDouble / n1 - g2.count(_ <= v).toDouble / n2)
    }.max
    assert(math.abs(d - dRef) < 1e-6, s"$d vs $dRef")
  }

  test("stats_kruskal: H reproduces from driver-side mid-ranks") {
    val row = Statistics.queries("stats_kruskal")(spark, LocalSpark.sf)
      .collect().head
    val (k, nt, h) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val vs = spark.table("orders")
      .select($"o_orderpriority", round($"o_totalprice").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(k == vs.map(_._1).distinct.length && nt == vs.length)
    // mid-ranks over the pooled sample
    val sorted = vs.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .view.mapValues(g => g.map(_._2 + 1).sum.toDouble / g.length).toMap
    val rq = vs.groupBy(_._1).values.map { g =>
      val rs = g.map(x => rankOf(x._2)).sum
      math.round(rs * rs / g.length).toDouble
    }.sum
    val ties = vs.map(_._2).groupBy(identity).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val hRef = (12.0 * rq / (nt * (nt + 1.0)) - 3.0 * (nt + 1)) /
      (1 - ties / (nt.toDouble * nt * nt - nt))
    assert(math.abs(h - hRef) < 1e-4, s"$h vs $hRef")
  }

  test("stats_gini: agrees with the mean-absolute-difference formula") {
    val out = Statistics.queries("stats_gini")(spark, LocalSpark.sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(g => g >= 0.0 && g < 1.0))
    // independent spelling on one segment: G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ)
    val seg = out.keySet.min
    val xs = spark.table("customer").join(spark.table("orders"),
        $"o_custkey" === $"c_custkey")
      .where($"c_mktsegment" === seg)
      .groupBy("c_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("r"))
      .select("r").as[Long].collect().map(_.toDouble)
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / (n * n)
    assert(math.abs(out(seg) - mad / (2 * mu)) < 1e-5,
      s"segment $seg gini ${out(seg)} vs ${mad / (2 * mu)}")
  }

  test("stats_bootstrap_poisson: replica sizes concentrate around n, means around the sample mean") {
    Tables.register(spark, LocalSpark.sf)
    val rows = graft.operators.Statistics
      .queries("stats_bootstrap_poisson")(spark, LocalSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 32 && rows.map(_._1).toSeq == (0 until 32))
    val slice = spark.table("lineitem").where($"l_orderkey" % 4 === 0)
    val n = slice.count()
    val totalCents = slice
      .agg(sum(round($"l_extendedprice" * 100).cast("long"))).first().getLong(0)
    val mean = totalCents.toDouble / n
    // Poisson(1) multiplicities: E[n_eff] = n, sd ≈ √n ⇒ all replicas
    // within 6σ at sf0.001 (n = 6000, √n ≈ 77)
    rows.foreach { case (b, nEff, sumC) =>
      assert(math.abs(nEff - n) < 6 * math.sqrt(n.toDouble), s"replica $b n_eff $nEff vs n $n")
      val repMean = sumC.toDouble / nEff
      assert(math.abs(repMean - mean) / mean < 0.05, s"replica $b mean $repMean vs $mean")
    }
    // replicas differ from each other (the hash actually varies by b)
    assert(rows.map(_._2).distinct.length > 16)
  }

  test("stats_cohens_kappa: micro-unit kappa reproduces from the cell counts") {
    val r = Statistics.queries("stats_cohens_kappa")(spark, LocalSpark.sf).first()
    val (a, b, c, d, n) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(a + b + c + d == n && n > 0)
    val po = (a + d).toDouble / n
    val pe = ((a + b) * (a + c) + (c + d) * (b + d)).toDouble / n / n
    val kappa = (po - pe) / (1 - pe)
    // micro-unit outputs are the truncated-toward-zero fixed points
    assert(math.abs(r.getLong(5) / 1e6 - po) < 2e-6)
    assert(math.abs(r.getLong(6) / 1e6 - pe) < 2e-6)
    assert(math.abs(r.getLong(7) / 1e6 - kappa) < 2e-6)
    // the two length-proxy raters must agree far beyond chance
    assert(kappa > 0.5, s"kappa $kappa")
  }

  test("stats_mcnemar: chi2 reproduces from the discordant cells; cc <= raw") {
    val r = Statistics.queries("stats_mcnemar")(spark, LocalSpark.sf).first()
    val (b, c) = (r.getLong(0), r.getLong(1))
    assert(b + c > 0)
    val chi2 = (b - c).toDouble * (b - c) / (b + c)
    val cc = math.pow(math.max(math.abs(b - c) - 1.0, 0.0), 2) / (b + c)
    assert(math.abs(r.getLong(2) / 1e6 - chi2) < 2e-6)
    assert(math.abs(r.getLong(3) / 1e6 - cc) < 2e-6)
    assert(r.getLong(3) <= r.getLong(2))
  }

  test("stats_fleiss_kappa: micro-unit kappa reproduces from the rater sums") {
    val r = Statistics.queries("stats_fleiss_kappa")(spark, LocalSpark.sf).first()
    val (n, s1, s0) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 + s0 == 3 * n && n > 0)
    // replay the common-denominator algebra against the double formula
    val pbar = r.getLong(3) / 1e6
    val pbare = r.getLong(4) / 1e6
    val kappa = r.getLong(5) / 1e6
    assert(pbar >= 1.0 / 3 - 1e-6 && pbar <= 1.0) // r=3 floor: P_i >= 1/3
    assert(pbare >= 0.5 - 1e-6 && pbare <= 1.0)   // two categories: >= 1/2
    assert(math.abs((pbar - pbare) / (1 - pbare) - kappa) < 5e-6)
    // the three length-proxy raters agree far beyond chance
    assert(kappa > 0.5, s"fleiss kappa $kappa")
  }

  test("privacy_kanonymity: violations and diversity reproduce from a recount") {
    val rows = graft.operators.Profiling
      .queries("privacy_kanonymity")(spark, LocalSpark.sf).collect()
    val (gen, fine) = rows.partition(_.getInt(0) == 1)
    assert(gen.nonEmpty && fine.nonEmpty)
    // generalized rows cover every nation once with band = -1
    assert(gen.forall(_.getLong(2) == -1L))
    assert(gen.map(_.getInt(1)).distinct.length == gen.length)
    // per-nation totals: fine classes partition the generalized class
    val fineByNation = fine.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(3)).sum)
    gen.foreach { g =>
      assert(g.getLong(3) == fineByNation(g.getInt(1)), s"nation ${g.getInt(1)}")
    }
    // flags are pure functions of n / n_seg
    rows.foreach { r =>
      assert((r.getInt(5) == 1) == (r.getLong(3) < 10))
      assert((r.getInt(6) == 1) == (r.getLong(4) < 3))
      assert(r.getLong(4) <= math.min(5L, r.getLong(3)))
    }
    // generalization can only merge classes: violations never increase
    assert(gen.count(_.getInt(5) == 1) <= fine.count(_.getInt(5) == 1) || fine.forall(_.getInt(5) == 0))
  }

  test("stats_conformal: q-hat is the order statistic; coverage near the 90% target") {
    val rows = Statistics.queries("stats_conformal")(spark, LocalSpark.sf).collect()
    assert(rows.nonEmpty)
    Tables.register(spark, LocalSpark.sf)
    val pts = spark.table("lineitem")
      .join(spark.table("supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey".cast("long").as("nk"), ($"l_orderkey" % 3).as("fold"),
        round($"l_quantity").cast("long").as("x"),
        round($"l_extendedprice").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val nk = r.getLong(0)
      val mine = pts.filter(_._1 == nk)
      val fit = mine.filter(_._2 == 0)
      val (n, sx, sy) = (fit.length.toDouble, fit.map(_._3).sum.toDouble, fit.map(_._4).sum.toDouble)
      val sxx = fit.map(p => p._3 * p._3).sum.toDouble
      val sxy = fit.map(p => p._3 * p._4).sum.toDouble
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
      val scores = mine.filter(_._2 == 1)
        .map(p => math.abs(p._4 - (a + b * p._3))).sorted
      val k = ((9 * (scores.length + 1) + 9) / 10) - 1
      assert(math.abs(r.getDouble(5) - scores(k)) < 1e-6,
        s"nation $nk qhat ${r.getDouble(5)} vs ${scores(k)}")
      // finite-sample conformal guarantee: coverage ≈ 90%, slack for
      // the small per-nation test folds at sf0.001
      val cov = r.getLong(6) / 1e6
      assert(cov > 0.70 && cov <= 1.0, s"nation $nk coverage $cov")
    }
  }

  test("stats_dawid_skene: hard-EM round replays driver-side; noisy rater downweighted") {
    val r = Statistics.queries("stats_dawid_skene")(spark, LocalSpark.sf).first()
    Tables.register(spark, LocalSpark.sf)
    val votes = spark.table("documents")
      .select($"n_chars", $"text", $"lang").collect().map { row =>
        val text = row.getString(1)
        val v1 = if (row.getLong(0) >= 250) 1 else 0
        val v2 = if (text.count(_ == ' ') + 1 >= 40) 1 else 0 // spaces+1 = words
        val v3 = if (row.getString(2) == "en") 1 else 0
        (v1, v2, v3)
      }
    val y0 = votes.map { case (a, b, c) => if (a + b + c >= 2) 1 else 0 }
    val n = votes.length.toLong
    val accs = Seq(
      votes.map(_._1).zip(y0).count(p => p._1 == p._2).toLong,
      votes.map(_._2).zip(y0).count(p => p._1 == p._2).toLong,
      votes.map(_._3).zip(y0).count(p => p._1 == p._2).toLong)
    assert(r.getLong(0) == n)
    assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3)) == accs)
    val w = accs.map(_ * 1000000 / n)
    assert(Seq(r.getLong(4), r.getLong(5), r.getLong(6)) == w)
    def lik(v: (Int, Int, Int), y: Int) =
      Seq(v._1, v._2, v._3).zip(w).map { case (vi, wi) =>
        if (vi == y) wi else 1000000 - wi
      }.product
    val y1 = votes.zip(y0).map { case (v, y) =>
      val (l1, l0) = (lik(v, 1), lik(v, 0))
      if (l1 > l0) 1 else if (l1 < l0) 0 else y
    }
    assert(r.getLong(7) == y1.count(_ == 1))
    assert(r.getLong(8) == y1.zip(y0).count(p => p._1 != p._2))
    // the independent-signal rater must look noisy vs the majority
    assert(w(2) < 700000 && w(0) > 800000 && w(1) > 800000)
  }

  test("stats_sprt: LLR replays from cumulative counts; first crossing flagged once") {
    val rows = Statistics.queries("stats_sprt")(spark, LocalSpark.sf).collect()
    assert(rows.length == 12)
    val bound = math.log(19.0)
    var seenCross = false
    rows.sortBy(_.getInt(0)).foreach { r =>
      val (n, s) = (r.getLong(2), r.getLong(3))
      assert(s <= n)
      val llr = s * math.log(4.0 / 3.0) + (n - s) * math.log(8.0 / 9.0)
      assert(math.abs(r.getDouble(4) - llr) < 1e-5)
      val dec = r.getString(5)
      assert(dec == (if (llr >= bound) "accept_h1"
                     else if (llr <= -bound) "accept_h0" else "continue"))
      if (r.getInt(6) == 1) {
        assert(!seenCross && dec != "continue", "flag = FIRST non-continue look")
        seenCross = true
      }
    }
    // cum_n is monotone across looks
    val ns = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns.sameElements(ns.sorted))
  }

  test("curation_dedup_aware_sample: keep rates track 1/csize; draws replay") {
    val rows = graft.operators.Dedup
      .queries("curation_dedup_aware_sample")(spark, LocalSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.exists(_._1 > 1), "corpus must have dup clusters")
    Tables.register(spark, LocalSpark.sf)
    assert(rows.map(_._2).sum == spark.table("documents").count())
    rows.foreach { case (csize, n, kept) =>
      assert(kept <= n)
      // binomial(n, 1/csize): within 5 sigma of expectation
      val exp = n.toDouble / csize
      val sd = math.sqrt(n.toDouble * (1.0 / csize) * (1 - 1.0 / csize))
      assert(math.abs(kept - exp) <= 5 * sd + 1, s"csize $csize: $kept vs $exp")
    }
  }

  test("stats_srm / stats_did: cells replay from conditional counts") {
    Tables.register(spark, LocalSpark.sf)
    val orders = spark.table("orders")
      .select($"o_custkey", $"o_orderpriority",
        ($"o_orderdate" >= lit("1998-01-01 00:00:00").cast("timestamp")).as("post"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getBoolean(2), r.getLong(3)))
    // SRM overall row
    val srm = Statistics.queries("stats_srm")(spark, LocalSpark.sf)
      .where($"stratum" === "_overall").first()
    val n0 = orders.count(_._1 % 2 == 0).toLong
    val n1 = orders.length - n0
    assert((srm.getLong(1), srm.getLong(2)) == ((n0, n1)))
    assert(srm.getLong(3) == BigInt((n0 - n1) * (n0 - n1)) * 1000000 / (n0 + n1))
    // DiD cells
    val did = Statistics.queries("stats_did")(spark, LocalSpark.sf).first()
    def cell(arm: Int, post: Boolean) =
      orders.filter(o => o._1 % 2 == arm && o._3 == post)
    def m(arm: Int, post: Boolean) = {
      val c = cell(arm, post)
      (BigInt(c.map(_._4).sum) * 1000000 / c.length).toLong
    }
    assert(did.getLong(0) == cell(0, false).length)
    assert(did.getLong(3) == cell(1, true).length)
    assert(did.getLong(4) == m(0, false) && did.getLong(7) == m(1, true))
    assert(did.getLong(8) == (m(1, true) - m(1, false)) - (m(0, true) - m(0, false)))
  }

  test("stats_calibration: ECE replays from the reliability rows; fit is calibrated") {
    val rows = Statistics.queries("stats_calibration")(spark, LocalSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 11)
    rows.foreach { case (_, n, sy, conf, acc, gap, _) =>
      assert(sy <= n)
      assert(acc == BigInt(sy) * 1000000 / n)
      assert(conf >= 0 && conf <= 1000000)
      assert(gap == math.abs(conf - acc))
    }
    val eces = rows.map(_._7).distinct
    assert(eces.length == 1) // constant column
    val expect = rows.map(r => r._2 * r._6).sum / rows.map(_._2).sum
    assert(eces.head == expect, s"${eces.head} vs $expect")
    // an IRLS fit evaluated on its own training cells must be well
    // calibrated — a few percent, not tens
    assert(eces.head < 50000, s"ECE ${eces.head / 1e4}%")
  }

  test("microDiv: split fixed-point divide is exact, sign-correct, overflow-safe") {
    Tables.register(spark, LocalSpark.sf)
    // drive the SQL kernel itself over value pairs including negatives
    // and magnitudes where x*1e6 would overflow BIGINT
    // last three: x*1e6 would overflow BIGINT (9e21) but the quotient
    // fits in micro units — the range the split form exists for
    val cases = Seq(
      (7L, 3L), (-7L, 3L), (0L, 5L), (1L, 7L), (-1L, 7L),
      (9000000000000000L, 7000000000000L), (-9000000000000000L, 7000000000000L),
      (123456789L, 1000000007L))
    val sql = cases.zipWithIndex.map { case ((x, dd), i) =>
      s"SELECT $i AS id, ${Statistics.microDiv(
        s"CAST($x AS BIGINT)", s"CAST($dd AS BIGINT)", spark = true)} AS q"
    }.mkString(" UNION ALL ")
    val got = spark.sql(sql).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case ((x, dd), i) =>
      val expect = (BigInt(x) * 1000000 / dd).toLong  // BigInt / truncates toward zero
      assert(got(i) == expect, s"case $i: ${got(i)} vs $expect")
    }
  }
}
