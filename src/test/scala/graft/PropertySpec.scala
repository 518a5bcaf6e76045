package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.collection.mutable

import graft.functions.{Hashing, NGramsTopKAgg}

/** Property-based tests (SURVEY.md §5.2 item 4) for the custom
  * aggregate/hash kernels — the merge-semantics mirror of Hive's
  * GenericUDAFEvaluator.merge contract: partials must combine to the
  * same result regardless of how rows were split across partitions. */
class PropertySpec extends AnyFunSuite {

  /** run a ScalaCheck property and fail the suite with its status */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  private val tokenGen: Gen[Seq[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e")).map(_.toSeq)
  private val corpusGen: Gen[List[Seq[String]]] =
    Gen.listOfN(8, tokenGen)

  // drive the aggregate's update/merge directly, as the execution
  // engine would
  private def agg = NGramsTopKAgg(
    org.apache.spark.sql.catalyst.expressions.Literal(null), n = 2, k = 100,
    maxBuf = 100000)

  private def updateWith(buf: mutable.HashMap[String, Long],
                         toks: Seq[String]): mutable.HashMap[String, Long] = {
    // inline the gram loop (update() evals the child expression; here we
    // feed token lists directly through the same counting logic)
    if (toks.length >= 2) {
      toks.sliding(2).foreach { w =>
        val g = w.mkString(" ")
        buf.update(g, buf.getOrElse(g, 0L) + 1L)
      }
    }
    buf
  }

  test("ngrams partials merge to the same counts for ANY partition split") {
    val a = agg
    check(Prop.forAll(corpusGen, Gen.choose(0, 8)) { (docs, splitAt0) =>
      val splitAt = splitAt0 min docs.length
      val whole = docs.foldLeft(a.createAggregationBuffer())(updateWith)
      val left = docs.take(splitAt).foldLeft(a.createAggregationBuffer())(updateWith)
      val right = docs.drop(splitAt).foldLeft(a.createAggregationBuffer())(updateWith)
      a.merge(left, right).toMap == whole.toMap
    })
  }

  test("ngrams serialize/deserialize round-trips any buffer") {
    val a = agg
    check(Prop.forAll(corpusGen) { docs =>
      val buf = docs.foldLeft(a.createAggregationBuffer())(updateWith)
      a.deserialize(a.serialize(buf)).toMap == buf.toMap
    })
  }

  test("hash64 distributes: no seed collisions across small inputs") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty),
                      Gen.alphaNumStr.suchThat(_.nonEmpty)) { (s1, s2) =>
      val b1 = s1.getBytes("UTF-8"); val b2 = s2.getBytes("UTF-8")
      // different inputs, same seed → different hashes (a collision in
      // this tiny space would indicate a broken mix); same input,
      // different seeds → different hashes
      (s1 == s2 ||
        Hashing.hash64(b1, 0, b1.length, 1L) != Hashing.hash64(b2, 0, b2.length, 1L)) &&
        Hashing.hash64(b1, 0, b1.length, 1L) != Hashing.hash64(b1, 0, b1.length, 2L)
    })
  }

  test("tokenize kernel equals the composed split/lower/filter reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val tok = graft.functions.Tokenize(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val textGen = Gen.listOf(Gen.oneOf("a", "Bc", "DEF", " ", "  ", "x1", "ü"))
      .map(_.mkString)
    check(Prop.forAll(textGen) { s =>
      val got = tok.kernel(UTF8String.fromString(s))
        .asInstanceOf[GenericArrayData].array.map(_.toString).toSeq
      val ref = s.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      got == ref
    })
  }

  test("approx_topk (Misra-Gries): exact when distinct <= buf, n/(buf+1) bound beyond, any split") {
    import org.apache.spark.unsafe.types.UTF8String
    def mg(buf: Int) = graft.functions.ApproxTopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null), k = buf, buf = buf)
    // drive update/merge/serde directly, as the engine would
    def run(buf: Int, parts: List[List[String]]): Map[String, Long] = {
      val a = mg(buf)
      val partials = parts.map { p =>
        p.foldLeft(a.createAggregationBuffer())((b, v) => a.updateValue(b, v))
      }.map(p => a.deserialize(a.serialize(p))) // serde at the shuffle boundary
      partials.reduceOption((x, y) => a.merge(x, y))
        .map(_.counts).getOrElse(Map.empty)
    }
    val streamGen = Gen.listOf(Gen.frequency(
      (8, Gen.const("hot")), (4, Gen.oneOf("w1", "w2")),
      (2, Gen.oneOf("x1", "x2", "x3", "x4")),
      (1, Gen.oneOf("r1", "r2", "r3", "r4", "r5", "r6"))))
    val splitGen = Gen.chooseNum(1, 5)
    check(Prop.forAll(streamGen, splitGen) { (stream, nParts) =>
      val parts = stream.grouped(math.max(1, (stream.size + nParts - 1) / nParts))
        .toList match { case Nil => List(Nil); case ps => ps }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // exact regime: buf >= all distinct (13 possible values)
      val exact = run(16, parts)
      val exactOk = exact == truth
      // sketch regime: buf = 3; the PODS'12 merged bound
      val est = run(3, parts)
      val n = stream.size.toLong
      val bound = n / 4 // n/(buf+1)
      val sketchOk = truth.forall { case (v, t) =>
        val e = est.getOrElse(v, 0L)
        e <= t && (t - e) <= bound
      } && est.keySet.forall(truth.contains)
      exactOk && sketchOk
    })
  }

  test("char_ngrams kernel equals the sliding-window reference on any text") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val cn = graft.functions.CharNGrams(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 3)
    val textGen = Gen.listOf(Gen.oneOf("a", "Bc", "DEF", " ", "x1", "ü", "."))
      .map(_.mkString)
    check(Prop.forAll(textGen) { s =>
      val got = cn.kernel(UTF8String.fromString(s))
        .asInstanceOf[GenericArrayData].array.map(_.toString).toSeq
      val low = s.toLowerCase
      val ref = if (low.length < 3) Seq.empty[String]
                else (0 to low.length - 3).map(i => low.substring(i, i + 3))
      got == ref
    })
  }

  test("lang_trigram_scores equals char_ngrams + set-membership reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val lts = graft.functions.LangTrigramScores(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val textGen = Gen.listOf(Gen.oneOf(
      "the ", "der ", "le ", "and ", "und ", "que ", "xyz", " ", "a"))
      .map(_.mkString)
    check(Prop.forAll(textGen) { s =>
      val got = lts.kernel(UTF8String.fromString(s))
      val low = s.toLowerCase
      if (low.codePointCount(0, low.length) < 3) got == null
      else {
        val grams = (0 to low.length - 3).map(i => low.substring(i, i + 3))
        val row = got.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        def ratio(p: Seq[String]) = grams.count(p.contains).toDouble / grams.size
        row.getDouble(0) == ratio(graft.functions.LangProfiles.en) &&
          row.getDouble(1) == ratio(graft.functions.LangProfiles.de) &&
          row.getDouble(2) == ratio(graft.functions.LangProfiles.fr)
      }
    })
  }

  test("cosine_sim_d equals the float kernel on float-valued arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cd = graft.functions.CosineSimD(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val cf = graft.functions.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 16.0f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      // float→double promotion is exact, and both kernels accumulate in
      // the same index order → identical doubles (modulo the double
      // kernel's -2.0-vs-null zero-norm convention)
      val d = cd.nullSafeEval(
        new GenericArrayData(a.map(_.toDouble).toArray),
        new GenericArrayData(b.map(_.toDouble).toArray))
      val f = cf.nullSafeEval(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      if (f == null) d == null || d == -2.0
      else d.asInstanceOf[Double] == f.asInstanceOf[Double]
    })
  }

  test("prefix filter keeps every pair with jaccard >= t (theorem check)") {
    // mirror of the dedup_ngram_jaccard prefix: order grams by (df, gram),
    // keep n - ceil(t*n) + 1 per set; any pair at jaccard >= t must share
    // a kept gram
    val t = 0.5
    val setGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'j').map(_.toString))).map(_.toSet))
    check(Prop.forAll(Gen.listOfN(6, setGen)) { sets =>
      val df = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(s: Set[String]): Set[String] = {
        val keep = s.size - math.ceil(t * s.size).toInt + 1
        s.toSeq.sortBy(g => (df(g), g)).take(keep).toSet
      }
      sets.combinations(2).forall { case Seq(a, b) =>
        val j = a.intersect(b).size.toDouble / a.union(b).size
        j < t || prefix(a).intersect(prefix(b)).nonEmpty
      }
    })
  }

  test("minhash signature equality rate estimates jaccard (statistical bound)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val mh = graft.functions.MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 256)
    def sig(xs: Set[String]): Seq[Long] = {
      val arr = new GenericArrayData(xs.toArray.map(UTF8String.fromString): Array[Any])
      mh.nullSafeEval(arr).asInstanceOf[GenericArrayData].toLongArray().toSeq
    }
    check(Prop.forAll(Gen.choose(10, 60), Gen.choose(0, 40)) { (common, extra) =>
      val shared = (0 until common).map("s" + _).toSet
      val a = shared ++ (0 until extra).map("a" + _)
      val b = shared ++ (0 until extra).map("b" + _)
      val trueJ = shared.size.toDouble / (a ++ b).size
      val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 256.0
      math.abs(est - trueJ) < 0.2
    })
  }

  test("mix64 avalanches: adjacent replica draws are uncorrelated (bit-flip rate)") {
    // the property the Poisson bootstrap depends on (and the property
    // the Knuth multiplicative lattice LACKS): flipping the replica
    // index flips ~half the output bits, for dense sequential keys
    check(Prop.forAll(Gen.choose(1L, 1000000L), Gen.choose(0L, 30L)) { (k, b) =>
      val flips = java.lang.Long.bitCount(
        Hashing.mix64(k, b) ^ Hashing.mix64(k, b + 1))
      flips >= 12 && flips <= 52
    })
    // top-32-bit draws over dense keys must NOT equidistribute like the
    // lattice: per-replica below-threshold counts should fluctuate on
    // the √n scale (the lattice's spread here was O(1) — measured 6
    // across 32 replicas before mix64 replaced it)
    val n = 4096
    val thresh = 1580030168L // P(Poisson(1)=0) · 2^32
    val counts = (0 until 16).map { b =>
      (1 to n).count { k =>
        ((Hashing.mix64(k.toLong, b.toLong) >>> 32) & 0xffffffffL) < thresh
      }
    }
    val spread = counts.max - counts.min
    assert(spread > 20, s"replica draw counts suspiciously uniform: $counts")
  }

  test("audio constellation: peaks are gain-invariant, landmarks shift-covariant") {
    import graft.operators.Multimodal.AudioFingerprint
    val N = AudioFingerprint.WindowSize
    check(Prop.forAll(
      Gen.listOfN(5, Gen.choose(0, AudioFingerprint.Bins - 1)),
      Gen.choose(0.05, 0.9)) { (bins, gain) =>
      val samples = bins.toArray.flatMap(b =>
        Array.tabulate(N)(i => math.sin(2 * math.Pi * (b + 1) * i / N) * 0.95))
      val scaled = samples.map(_ * gain)
      // Goertzel power is quadratic in gain — argmax unchanged
      AudioFingerprint.peakBins(samples).toSeq ==
        AudioFingerprint.peakBins(scaled).toSeq &&
        AudioFingerprint.peakBins(samples).toSeq == bins
    })
    // landmark covariance under a whole-window shift
    val peaks = Array(3, 7, 11, 5, 9)
    val shifted = Array(0, 0) ++ peaks
    val lm = AudioFingerprint.landmarks(peaks).toSet
    val lmShift = AudioFingerprint.landmarks(shifted).toSet
    assert(lm.map { case (fp, t) => (fp, t + 2) }.subsetOf(lmShift))
  }

  // --- string-distance kernels (r16): the DuckDB oracle exercises them
  // only on the TPC-H name distribution across four SFs; these add
  // random-input coverage and pin the Hive/Java CODE-UNIT semantics
  // (Hive's UDFs operate on UTF-16 units — deliberately NOT DuckDB's
  // codepoints; the driver corpus is ASCII so the oracle never sees
  // the difference, and this pin keeps the choice explicit).

  private def dl(a: String, b: String): Int =
    graft.functions.DamerauLevenshtein(
      org.apache.spark.sql.catalyst.expressions.Literal(a),
      org.apache.spark.sql.catalyst.expressions.Literal(b))
      .kernel(org.apache.spark.unsafe.types.UTF8String.fromString(a),
              org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private val shortStr: Gen[String] =
    Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)

  test("damerau_levenshtein metric axioms on random strings (small alphabet forces transpositions)") {
    check(Prop.forAll(shortStr, shortStr, shortStr) { (a, b, c) =>
      val dab = dl(a, b)
      dl(a, a) == 0 &&
        dab == dl(b, a) &&                                   // symmetry
        dab >= math.abs(a.length - b.length) &&              // lower bound
        dab <= math.max(a.length, b.length) &&               // upper bound
        dl(a, c) <= dab + dl(b, c)                           // triangle
    })
    // adjacent transposition is exactly one edit, wherever it sits
    check(Prop.forAll(shortStr, shortStr) { (pre, post) =>
      val s = pre + "xy" + post
      val t = pre + "yx" + post
      dl(s, t) == 1
    })
  }

  test("jaro_winkler equals an independently transcribed reference on random strings") {
    def ref(a: String, b: String): Double = {
      val (la, lb) = (a.length, b.length)
      if (la == 0 || lb == 0) return 0.0
      val win = math.max(0, math.max(la, lb) / 2 - 1)
      val used = Array.fill(lb)(false)
      val amatch = new StringBuilder
      val bIdx = mutable.ArrayBuffer.empty[Int]
      for (i <- 0 until la) {
        val cands = (math.max(0, i - win) to math.min(lb - 1, i + win))
          .filter(j => !used(j) && b.charAt(j) == a.charAt(i))
        cands.headOption.foreach { j => used(j) = true; amatch += a.charAt(i); bIdx += j }
      }
      val m = amatch.length
      if (m == 0) return 0.0
      val bmatch = bIdx.sorted.map(b.charAt).mkString
      val half = amatch.toString.zip(bmatch).count { case (x, y) => x != y }
      val t = half / 2
      val jd = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
      if (jd <= 0.7) jd
      else {
        val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
        jd + 0.1 * p * (1.0 - jd)
      }
    }
    val jw = (a: String, b: String) =>
      graft.functions.JaroWinkler(
        org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b))
        .kernel(org.apache.spark.unsafe.types.UTF8String.fromString(a),
                org.apache.spark.unsafe.types.UTF8String.fromString(b))
    check(Prop.forAll(shortStr, shortStr) { (a, b) =>
      math.abs(jw(a, b) - ref(a, b)) < 1e-12
    })
  }

  test("string kernels use UTF-16 code units (Hive/Java parity), not codepoints") {
    // U+1D11E (musical G clef) is a surrogate PAIR: 2 units vs 1 codepoint.
    // Hive's UDFs run on Java chars, so distance('x', clef) is 2 — a
    // codepoint implementation (DuckDB's) would say 1. The driver corpus
    // is ASCII, so the oracle never exercises this; the pin keeps the
    // reference-parity choice explicit.
    val clef = new String(Character.toChars(0x1D11E))
    assert(clef.length == 2)
    assert(dl("x", clef) == 2)
    assert(dl(clef, clef) == 0)
  }
}
