package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Property checks for the corpus-curation operators at sf0.001:
  * chunk coverage/bounds, packing balance and token preservation,
  * incremental-dedup status correctness vs brute force, mixture-sample
  * reproducibility, and PII-scrub residue. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = LocalSpark.spark
  import spark.implicits._

  /** Run `body` with an extra row unioned into the `documents` view,
    * restoring the pristine view afterwards (Tables.register memoizes
    * per sfDir; invalidate drops the memo so the restore re-reads the
    * real views regardless of which sfDir is active). */
  private def withPlantedDoc[A](row: (Long, String, String, String, Long))(body: => A): A = {
    Tables.register(spark, LocalSpark.sf)
    val docs = spark.table("documents")
    docs.unionByName(Seq(row).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .createOrReplaceTempView("documents")
    try body
    finally {
      Tables.invalidate(spark)
      Tables.register(spark, LocalSpark.sf)
    }
  }

  test("text_chunks: stride-48 starts, <=64-token chunks, full coverage") {
    val chunks = Curation.queries("text_chunks")(spark, LocalSpark.sf)
      .select("doc_id", "chunk_id", "chunk_start", "n_tok_chunk", "chunk_text")
      .collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val (start, len, text) = (r.getInt(2), r.getInt(3), r.getString(4))
      assert(start % 48 === 0)
      assert(r.getLong(1) === start / 48, "chunk_id is start/stride")
      assert(len >= 1 && len <= 64)
      assert(text.split(' ').count(_.nonEmpty) === len,
        "chunk_text token count matches n_tok_chunk")
    }
    // per doc: starts are 0,48,96,…; the final chunk reaches the last token
    Tables.register(spark, LocalSpark.sf)
    val nTok = spark.sql(
      "SELECT doc_id, SIZE(FILTER(SPLIT(LOWER(text),' '), w -> w <> '')) n FROM documents")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_.getLong(0)).foreach { case (doc, cs) =>
      val starts = cs.map(_.getInt(2)).sorted
      assert(starts === starts.indices.map(_ * 48).toArray)
      val last = cs.maxBy(_.getInt(2))
      assert(last.getInt(2) + last.getInt(3) === nTok(doc),
        "chunks cover every token position")
    }
  }

  test("pack_sequences: bin count, +/-1 doc balance, token preservation") {
    Tables.register(spark, LocalSpark.sf)
    val docs = spark.sql(
      "SELECT SIZE(FILTER(SPLIT(LOWER(text),' '), w -> w <> '')) n FROM documents")
      .collect().map(_.getInt(0)).filter(_ > 0)
    val total = docs.map(_.toLong).sum
    val bins = math.max(1L, math.ceil(total / 2048.0).toLong)

    val packed = Curation.queries("pack_sequences")(spark, LocalSpark.sf).collect()
    assert(packed.length === bins)
    assert(packed.map(_.getLong(2)).sum === total, "every token lands in a sequence")
    val counts = packed.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "round-robin doc balance")
    // balanced token mass: no bin above 2x the target budget (the greedy
    // round-robin bound on this corpus; exact equality is not the contract)
    assert(packed.map(_.getLong(2)).max <= 2 * 2048,
      s"token mass stays near the 2048 budget")
  }

  test("pack_sequences is deterministic across runs") {
    val a = Curation.queries("pack_sequences")(spark, LocalSpark.sf).collect().toSeq
    val b = Curation.queries("pack_sequences")(spark, LocalSpark.sf).collect().toSeq
    assert(a === b)
  }

  test("dedup_incremental statuses match brute force over new x old") {
    Tables.register(spark, LocalSpark.sf)
    val rows = Curation.queries("dedup_incremental")(spark, LocalSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = spark.sql("SELECT doc_id, text FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (newIds, oldIds) = docs.keySet.partition(_ % 5 == 4)
    assert(rows.keySet === newIds, "one status row per new-batch doc")

    def grams(s: String): Set[String] = {
      val t = s.toLowerCase.split(' ').filter(_.nonEmpty)
      t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val oldTexts = oldIds.map(docs)
    val oldGrams = oldIds.toSeq.map(i => grams(docs(i))).filter(_.nonEmpty)
    newIds.foreach { id =>
      val g = grams(docs(id))
      val isExact = oldTexts.contains(docs(id))
      val isNear = g.nonEmpty && oldGrams.exists { og =>
        val inter = (g & og).size.toDouble
        inter / (g.size + og.size - inter) >= 0.8
      }
      val expect = if (isExact) "exact_dup" else if (isNear) "near_dup" else "kept"
      assert(rows(id) === expect, s"doc $id")
    }
    // sf0.001 plants near-dups but no cross-batch exact copy — the
    // exact_dup path is exercised by the planted test below
    assert(Set("near_dup", "kept").subsetOf(rows.values.toSet),
      "corpus exercises the near_dup and kept statuses")
  }

  test("dedup_incremental flags a planted cross-batch exact duplicate") {
    Tables.register(spark, LocalSpark.sf)
    val oldText = spark.table("documents")
      .where($"doc_id" === 0L).select($"text").head.getString(0)
    // 9999 % 5 == 4 → new batch; identical text to old doc 0 → exact_dup
    withPlantedDoc((9999L, oldText, "en", "src0", oldText.length.toLong)) {
      val rows = Curation.queries("dedup_incremental")(spark, LocalSpark.sf)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(9999L) === "exact_dup")
    }
  }

  test("sample_weighted_mix: exact hash-threshold keep set; en kept fully") {
    Tables.register(spark, LocalSpark.sf)
    val kept = Curation.queries("sample_weighted_mix")(spark, LocalSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val thresholds = Map("en" -> 4294967296L, "de" -> 2147483648L,
      "fr" -> 2147483648L, "es" -> 1073741824L, "zh" -> 429496729L)
    val docs = spark.sql("SELECT doc_id, lang FROM documents")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.collect {
      case (id, lang) if (id * 2654435761L) % 4294967296L < thresholds(lang) => id
    }.toSet
    assert(kept === expect)
    val en = docs.collect { case (id, "en") => id }.toSet
    assert(en.subsetOf(kept), "weight-1.0 stratum keeps everything")
    assert(kept.size < docs.length, "sub-1.0 strata actually drop documents")
  }

  test("text_decontaminate matches brute-force 5-gram overlap vs the bench slice") {
    Tables.register(spark, LocalSpark.sf)
    val docs = spark.sql("SELECT doc_id, text FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String): Set[String] = {
      val t = s.toLowerCase.split(' ').filter(_.nonEmpty)
      t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }
    val benchGrams = docs.collect { case (id, t) if id % 97 == 0 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val rows = Curation.queries("text_decontaminate")(spark, LocalSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toSet === docs.keySet.filter(_ % 97 != 0),
      "one row per non-benchmark doc")
    rows.foreach { case (id, nShared, status) =>
      val expect = (grams(docs(id)) & benchGrams).size.toLong
      assert(nShared === expect, s"doc $id shared-gram count")
      assert(status === (if (expect > 0) "contaminated" else "clean"), s"doc $id")
    }
  }

  test("text_decontaminate flags a planted eval-set copy") {
    Tables.register(spark, LocalSpark.sf)
    val benchText = spark.table("documents")
      .where($"doc_id" === 0L).select($"text").head.getString(0)
    // 9998 % 97 != 0 → corpus side; identical text to benchmark doc 0
    withPlantedDoc((9998L, benchText, "en", "src0", benchText.length.toLong)) {
      val byId = Curation.queries("text_decontaminate")(spark, LocalSpark.sf)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(byId(9998L) === "contaminated")
    }
  }

  test("text_repetition matches brute-force Gopher metrics") {
    Tables.register(spark, LocalSpark.sf)
    val docs = spark.sql("SELECT doc_id, text FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.queries("text_repetition")(spark, LocalSpark.sf)
      .collect()
    val expected = docs.toSeq.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(' ').filter(_.nonEmpty)
      if (toks.isEmpty) None else {
        val n = toks.length.toLong
        val uniq = toks.distinct.length
        val topC = toks.groupBy(identity).values.map(_.length).max
        val n3 = math.max(n - 2, 0L)
        val n3uniq = toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet.size
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val fdt = r6(1.0 - uniq.toDouble / n)
        val ttf = r6(topC.toDouble / n)
        val fd3 = if (n3 > 0) r6(1.0 - n3uniq.toDouble / n3) else 0.0
        val keep = if (fdt <= 0.3 && ttf <= 0.1 && fd3 <= 0.2) 1 else 0
        Some(id -> ((n, fdt, ttf, fd3, keep)))
      }
    }.toMap
    assert(rows.map(_.getLong(0)).toSet === expected.keySet)
    rows.foreach { r =>
      val (n, fdt, ttf, fd3, keep) = expected(r.getLong(0))
      assert(r.getLong(1) === n, s"n_tok for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - fdt) < 1e-9, s"frac_dup_tok doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - ttf) < 1e-9, s"top_tok_frac doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - fd3) < 1e-9, s"frac_dup_3gram doc ${r.getLong(0)}")
      assert(r.getInt(5) === keep, s"keep_flag doc ${r.getLong(0)}")
    }
  }

  test("text_pii_scrub: all planted PII found and redacted, none left behind") {
    val rows = Curation.queries("text_pii_scrub")(spark, LocalSpark.sf).collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b".r
    val phone = "\\+[0-9][0-9 ]{7,}[0-9]".r
    rows.foreach { r =>
      assert(r.getInt(1) === 1 && r.getInt(2) === 1 && r.getInt(3) === 1,
        "each augmented row plants exactly one of each class")
      val s = r.getString(4)
      assert(s.contains("<EMAIL>") && s.contains("<IP>") && s.contains("<PHONE>"))
      assert(email.findFirstIn(s).isEmpty && ip.findFirstIn(s).isEmpty &&
        phone.findFirstIn(s).isEmpty, "no residual PII after scrubbing")
    }
  }

  test("pack_shards: folded assignment balances tokens within a size-band") {
    val rows = graft.operators.Curation
      .queries("pack_shards")(spark, LocalSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    // doc counts differ by at most 1 (round-robin over the rank)
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1)
    // token totals: the folded rule bounds shard spread by roughly one
    // size-band; 2% is generous at any SF
    val tokens = rows.map(_._3)
    val mean = tokens.sum.toDouble / 8
    tokens.foreach(t => assert(math.abs(t - mean) / mean < 0.02, s"$t vs $mean"))
    // imbalance column replays from the totals
    rows.foreach { case (_, _, t, imb) =>
      assert(imb == t * 8000000L / tokens.sum - 1000000L)
    }
    Tables.register(spark, LocalSpark.sf)
    import org.apache.spark.sql.functions._
    val total = spark.table("documents")
      .select(size(filter(split(lower($"text"), " "), w => w =!= ""))
        .cast("long").as("n")).where($"n" > 0)
      .agg(sum($"n")).first().getLong(0)
    assert(tokens.sum == total)
  }

  test("curation_quota_fill: Hamilton quotas sum exactly; fills maximal under quota") {
    val rows = graft.operators.Curation
      .queries("curation_quota_fill")(spark, LocalSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // apportionment: quotas sum to the budget EXACTLY (the property
    // floor-only shares lack), and each quota is floor or floor+1
    assert(rows.map(_._4).sum == 20000L)
    val n = rows.map(_._3).sum
    rows.foreach { case (src, _, ns, quota, taken, tok) =>
      val q0 = 20000L * ns / n
      assert(quota == q0 || quota == q0 + 1, s"$src quota $quota vs floor $q0")
      assert(tok <= quota, s"$src fill exceeds quota")
      assert(taken >= 0 && tok >= 0)
    }
    // fill maximality: the next-ranked doc would not have fit
    Tables.register(spark, LocalSpark.sf)
    import org.apache.spark.sql.functions._
    val docs = spark.table("documents")
      .select($"source", $"doc_id",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (src, _, _, quota, taken, tok) =>
      val ranked = docs.filter(_._1 == src).sortBy(d => (-d._3, d._2))
      assert(ranked.take(taken.toInt).map(_._3).sum == tok, s"$src tokens")
      if (taken.toInt < ranked.length)
        assert(tok + ranked(taken.toInt)._3 > quota, s"$src fill not maximal")
    }
  }
}
