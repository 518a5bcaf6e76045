package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.tools.ScaleGen

/** The honest-decade generator's invariants, pinned (round-12 lesson:
  * every scale claim in BASELINE.md is load-bearing on these, and the
  * first two generator designs silently violated them — a 3-char salt
  * left replicas at shingle-Jaccard ≈0.99 and a dim-0 nudge left them
  * at cosine ≈1.0, both manufacturing quadratic near-dup growth that
  * mismeasured LSH at 15.6×/decade). A future edit that reintroduces
  * either artifact fails here, not in a bench table three rounds later.
  *
  * Bounds are empirical on the sf0.001 fixture with slack (measured:
  * cross-replica same-base cosine max 0.36, char-3-gram Jaccard max
  * 0.04): the artifact modes sit at ≈1.0, an order of magnitude above
  * the pins. */
class ScaleGenSpec extends AnyFunSuite with Matchers {
  lazy val spark = LocalSpark.spark
  val sf = LocalSpark.sf
  val k = 3

  private lazy val dest: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.main(Array(sf, d, k.toString))
    d
  }

  test("row counts: facts replicate ×k, dimensions copy") {
    spark.read.parquet(s"$dest/documents.parquet").count() shouldBe 500L * k
    spark.read.parquet(s"$dest/embeddings.parquet").count() shouldBe 500L * k
    spark.read.parquet(s"$dest/orders.parquet").count() shouldBe 1500L * k
    spark.read.parquet(s"$dest/nation.parquet").count() shouldBe
      spark.read.parquet(s"$sf/nation.parquet").count()
  }

  test("referential integrity survives key offsetting") {
    val cust = spark.read.parquet(s"$dest/customer.parquet")
      .select(col("c_custkey")).distinct()
    val dangling = spark.read.parquet(s"$dest/orders.parquet")
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()
    dangling shouldBe 0L
  }

  test("all 156 affine alphabet permutations are distinct and length-preserving") {
    val images = (0 until 156).map(ScaleGen.affineImage)
    images.distinct.length shouldBe 156
    all(images.map(_.length)) shouldBe 52
    // and each is a true permutation of the alphabet halves
    images.foreach(im => im.take(26).sorted shouldBe ('a' to 'z').mkString)
  }

  test("text decoherence: same base doc across replicas stays below 3-gram Jaccard 0.2") {
    val off = 1000000000L
    val texts = spark.read.parquet(s"$dest/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    val base = texts.keys.filter(_ < off).take(100)
    val js = for (id <- base; r <- 1 until k) yield {
      val (a, b) = (grams(texts(id)), grams(texts(id + r * off)))
      if ((a ++ b).isEmpty) 0.0 else (a & b).size.toDouble / (a ++ b).size
    }
    js.max should be <= 0.2   // artifact mode is ≈0.99
  }

  test("embedding isometry: within-replica norms exact, cross-replica cosine below 0.5") {
    val off = 1000000000L
    val vecs = spark.read.parquet(s"$dest/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val src = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map(p => p._1 * p._2).sum / (norm(a) * norm(b))
    val sample = src.keys.take(100)
    for (id <- sample; r <- 1 until k) {
      val rep = vecs(id + r * off)
      norm(rep) shouldBe norm(src(id)) +- 1e-9    // isometry (fold-order ulp)
      math.abs(cos(rep, src(id))) should be < 0.5 // decoherence (artifact ≈1.0)
    }
  }

  test("no manufactured exact duplicates: disjoint vocabularies never collide") {
    // the source has zero exact text dups, so the ×k surplus rule says
    // the output must too — any collision between two replicas' affine
    // images would be a manufactured dup, the artifact class itself
    val dups = spark.read.parquet(s"$dest/documents.parquet")
      .groupBy(col("text")).count().where(col("count") > 1).count()
    dups shouldBe 0L
  }

  test("never-stack rule is enforced with a loud error") {
    // dest carries the output marker; using it as a SOURCE must refuse
    val e = intercept[IllegalArgumentException] {
      ScaleGen.main(Array(dest,
        java.nio.file.Files.createTempDirectory("graft-stack").toString, "2"))
    }
    e.getMessage should include ("NEVER stack")
    new java.io.File(dest, "_SCALEGEN_OUTPUT.json").exists() shouldBe true
  }
}
