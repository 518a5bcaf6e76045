package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over the embedding column (Array[Float], dim 64).
  *
  * Two paths, mirroring how an ANN system is actually deployed:
  *  - `ann_cosine_topk`: brute-force exact top-k — the baseline and the
  *    per-bucket kernel. O(|Q|·n); fine when |Q| is small or as the
  *    refine step.
  *  - `ann_lsh_bucketed`: random-hyperplane LSH (16 tables × adaptive
  *    pe-bit buckets, pe = min p in [6,18] with n ≤ 64·2^p) —
  *    candidates come from an equi-join on (table, bucket),
  *    so at 100 TB the plan is shuffle-on-bucket + per-bucket top-k,
  *    never a cross join. Probabilistic recall (PipelineSpec measures
  *    it against the brute-force truth) but fully deterministic output.
  */
object Similarity {

  private type Q = (SparkSession, String) => DataFrame

  private def gsql(q: String): Q = (spark, sfDir) => {
    Tables.register(spark, sfDir)
    GraftFunctions.register(spark)
    spark.sql(q)
  }

  /** The shared int8 quantize pipeline (vec_id, ed, sc_raw, q) —
    * ONE definition serves embed_quantize_int8 and ann_quantized_topk
    * so the latter's "same per-element steps" claim is structural, not
    * a comment. Each step is its own attribute: embedding a `sc_raw`
    * expression TREE inside the transform lambdas would recompute the
    * array_max per ELEMENT (64× per row — benched 2.3 s vs 0.4 s).
    * The internal attribute must NOT share an output alias (lateral-
    * column-alias trap, SURVEY §7.3.7; pinned in PipelineSpec). */
  private def quantized8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("ed"))
      .withColumn("sc_raw", array_max(transform(col("ed"), abs(_))) / lit(127.0))
      // round-half-up via floor(v+0.5): identical in DuckDB; clamp after
      .withColumn("q", transform(col("ed"), x =>
        least(greatest(floor(x / col("sc_raw") + lit(0.5)), lit(-127L)), lit(127L))))

  /** DuckDB twin of quantized8's e/s CTEs and the q-element kernel —
    * the same single-definition rule for the oracle side. */
  private val QuantBaseCtes = """
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings),
      s AS (SELECT vec_id, ed,
              list_max(list_transform(ed, x -> abs(x))) / 127.0 AS scale
            FROM e)"""
  private def qElemSql(x: String): String =
    s"CAST(LEAST(GREATEST(floor($x / scale + 0.5), -127.0), 127.0) AS BIGINT)"

  /** Record linkage, the shared shape: a deterministically-corrupted
    * "dirty" side (built IN SQL so both engines derive byte-identical
    * inputs) fuzzy-joined back to the clean catalog through a blocking
    * key. Blocking = equi-join on (name prefix, length bucket) — the
    * prefix survives the corruption by construction and the length
    * relation is known exactly (swap preserves it, drop shifts by 1) —
    * so the plan is a hash join over small blocks, NEVER an all-pairs
    * cross: at 100 TB the scorer kernel only ever runs inside a block.
    * Both statements are dialect-shared; `jwFn` abstracts the one name
    * difference (graft `jaro_winkler` vs DuckDB's
    * `jaro_winkler_similarity` — kernels validated bit-identical, see
    * expressions.scala). */
  /** The linkage fixture's dirty side — ONE spelling shared by
    * link_fuzzy_match and link_blocking_metrics so the corruption and
    * blocking key cannot drift between the matcher and its evaluator. */
  // REPARTITION before the scorer join (the MinhashPairsSql
  // discipline): part scans as ONE split at test scale and the
  // blocked join streams THIS side, so every damerau_levenshtein /
  // jaro_winkler call — 3.16M candidate pairs at sf0.1 — ran on a
  // single core (r18 plan audit: BroadcastHashJoin, BuildRight, probe
  // = the one-partition dirty scan; measured 6.7 s idle → the kernel
  // grind serialized). The hint is a Spark comment-hint; DuckDB parses
  // it as a plain block comment, so the shared oracle text is
  // unaffected.
  private val DirtyCte = """dirty AS (
        SELECT p_partkey AS did,
               CONCAT(SUBSTR(p_name, 1, 3), SUBSTR(p_name, 5, 1),
                      SUBSTR(p_name, 4, 1), SUBSTR(p_name, 6)) AS dname,
               SUBSTR(p_name, 1, 3) AS blk, LENGTH(p_name) AS len
        FROM (SELECT /*+ REPARTITION(32) */ p_partkey, p_name
              FROM part WHERE p_partkey % 5 = 0) src
      )"""

  /** Blocking-scheme evaluation (Christen, TKDE'12 survey metrics):
    * REDUCTION RATIO (how much of the |D|×|P| all-pairs space the
    * blocking key prunes) and PAIR COMPLETENESS (what fraction of true
    * matches survive into the candidate set — blocking recall). The
    * ground truth is the fixture's own identity (did = pid by
    * construction). Pure integer counts + exact micro ratios; the
    * candidate count is ONE aggregate over the same blocked equi-join
    * the matcher runs — evaluating a blocking scheme costs one pass,
    * which is why you measure before you pay for the scorer at 100 TB.
    * Scale bound: the nd·np denominator keeps the two-level microDiv
    * exact while nd·np < 9.2e15 (e.g. 1e8 dirty × 9e7 clean); past
    * that the product itself nears BIGINT range and the reduction
    * ratio should be computed in DECIMAL(38) — documented here, per
    * the microDiv contract, rather than left to wrap. */
  private def blockingMetricsSql(spark: Boolean): String = {
    val mdiv = Statistics.microDiv(_: String, _: String, spark)
    s"""
      WITH $DirtyCte,
      cand AS (
        SELECT d.did, p.p_partkey AS pid
        FROM dirty d JOIN part p
          ON SUBSTR(p.p_name, 1, 3) = d.blk AND LENGTH(p.p_name) = d.len
      ),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
               CAST(SUM(CASE WHEN did = pid THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_in_cand
        FROM cand
      ),
      d AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM dirty),
      p AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM part)
      SELECT nd, np, n_cand, n_true_in_cand,
             ${mdiv("nd * np - n_cand", "nd * np")} AS reduction_micro,
             ${mdiv("n_true_in_cand", "nd")} AS completeness_micro
      FROM m CROSS JOIN d CROSS JOIN p"""
  }

  private def linkFuzzySql: String = s"""
      WITH $DirtyCte, cand AS (
        SELECT d.did, p.p_partkey AS pid,
               damerau_levenshtein(d.dname, p.p_name) AS dist
        FROM dirty d JOIN part p
          ON SUBSTR(p.p_name, 1, 3) = d.blk AND LENGTH(p.p_name) = d.len
      ), best AS (
        SELECT did, pid, dist,
               ROW_NUMBER() OVER (PARTITION BY did ORDER BY dist, pid) AS rn
        FROM cand WHERE dist <= 2
      )
      SELECT did, pid, CAST(dist AS INT) AS dist,
             CASE WHEN pid = did THEN 1 ELSE 0 END AS self_hit
      FROM best WHERE rn = 1 ORDER BY did"""

  private def linkJaroSql(jwFn: String): String = s"""
      WITH dirty AS (
        SELECT p_partkey AS did,
               CONCAT(SUBSTR(p_name, 1, 4), SUBSTR(p_name, 6)) AS dname,
               SUBSTR(p_name, 1, 4) AS blk, LENGTH(p_name) - 1 AS len
        FROM (SELECT /*+ REPARTITION(32) */ p_partkey, p_name
              FROM part WHERE p_partkey % 7 = 0) src
      ), cand AS (
        SELECT d.did, p.p_partkey AS pid,
               ROUND($jwFn(d.dname, p.p_name), 6) AS jw
        FROM dirty d JOIN part p
          ON SUBSTR(p.p_name, 1, 4) = d.blk AND LENGTH(p.p_name) = d.len + 1
      ), best AS (
        SELECT did, pid, jw,
               ROW_NUMBER() OVER (PARTITION BY did ORDER BY jw DESC, pid) AS rn
        FROM cand WHERE jw >= 0.88
      )
      SELECT did, pid, jw FROM best WHERE rn = 1 ORDER BY did"""

  /** JL sign-projection text. The sign of matrix cell (i, j) is the
    * parity of a quadratic residue: t = (i·73856093 + j·19349663) mod
    * 1000003, sign = +1 iff (t² mod 1000003) is even — all BIGINT-safe
    * (t ≤ 1e6 ⇒ t² ≤ 1e12 < 2^53) and written once for both dialects.
    * The signed sum of quantized coords is exact (≤ 64·1e6 ≪ 2^53), so
    * fold order cannot matter; /1e6/4 closes it (√16 = 4 exact). The
    * value ships UNROUNDED: val·4e6 is an exact integer, so it is
    * already bit-deterministic, while ROUND(·, 6) would sit exactly on
    * decimal ties (…75) where Spark's shortest-decimal HALF_UP and
    * DuckDB's binary-double rounding disagree — measured, row 147 of
    * sf0.01 flipped the 6th decimal. */
  private def randProjSql(spark: Boolean): String = {
    def sign(i: String, j: String): String = {
      val t = s"(CAST($i AS BIGINT) * 73856093 + CAST($j AS BIGINT) * 19349663) % 1000003"
      s"(CASE WHEN ((($t) * ($t)) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
    }
    if (spark) {
      // Spark side superseded by the SignRandProj kernel (see the
      // queries entry): the unrolled-ELEMENT_AT SQL spelling inlined
      // the quantize TRANSFORM behind its 1024 array references and
      // re-evaluated the interpreted lambda per reference — 42 s for
      // 200k rows at sf10, all constant factor. Kept here only so a
      // dialect comparison remains possible; not used by queries().
      sys.error("spark side of randProjSql superseded by SignRandProj")
    } else s"""
      WITH q AS (SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 1000000.0) AS DOUBLE)) AS qe
             FROM embeddings)
      SELECT vec_id, CAST(j AS INT) AS dim,
             list_reduce(list_prepend(0.0, list_transform(range(1, 65), i -> ${sign("i", "j")} * qe[i])), (x, y) -> x + y) / 1000000.0 / 4.0 AS val
      FROM q CROSS JOIN range(1, 17) r(j)
      ORDER BY vec_id, dim"""
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): from the query's top-10 cosine pool, greedily pick 5
    * results maximizing λ·rel − (1−λ)·max-sim-to-already-picked
    * (λ=0.7) — the diversity-aware retrieval shape RAG rerankers run
    * after ANN. The greedy loop is inherently sequential in k but k is
    * tiny and FIXED: each of the 4 unrolled steps is a join over the
    * ≤10-row pool (broadcast-sized), while the only row-scale work is
    * the pool's brute-force top-10 (TakeOrderedAndProject; at 100 TB
    * swap the LSH/IVF candidate kernel in front, same rerank).
    * Determinism: vectors quantize first (the Clustering discipline)
    * so every cosine is bit-identical across engines; MAX over doubles
    * is order-free; the λ-combination is one fixed IEEE op chain and
    * ties break by vec_id — the pick sequence matches exactly. */
  private def mmrCos(spark: Boolean)(a: String, b: String): String =
    if (spark) s"COSINE_SIM_D($a, $b)" else Clustering.cosSql(a, b)

  /** The candidate pool: brute-force quantized-cosine top-10 for the
    * vec_id=0 query — the only row-scale stage of MMR. */
  private def mmrPoolSql(spark: Boolean): String = {
    val quant =
      if (spark) "TRANSFORM(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE) / 1000000.0)"
      else "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * 1000000.0) AS DOUBLE) / 1000000.0)"
    s"""
      WITH v AS (SELECT vec_id, $quant AS ve FROM embeddings)
      , q AS (SELECT ve AS qv FROM v WHERE vec_id = 0)
      SELECT v.vec_id, v.ve, ${mmrCos(spark)("v.ve", "q.qv")} AS rel
      FROM v CROSS JOIN q WHERE v.vec_id <> 0
      ORDER BY rel DESC, vec_id LIMIT 10"""
  }

  /** The 4 unrolled greedy steps over `poolSrc` + the final projection
    * — the ORACLE spelling (DuckDB materializes each CTE once). Spark
    * does NOT run this text: Catalyst inlines CTEs, so the sel-chain
    * expands ~4^k subtrees (27 s uncached, 10 s even with the pool
    * cached — all planning and tiny exchanges); the Spark side instead
    * collects the 10-row pool and runs the greedy loop as driver
    * arithmetic, which is bounded O(k·dim) driver state — the
    * k-means-centroid class, and exactly how a production reranker
    * treats its top-k. */
  private def mmrStepsSql(spark: Boolean, poolSrc: String): String = {
    val cos = mmrCos(spark) _
    val steps = (2 to 5).map { k =>
      s"""
      , m$k AS (
          SELECT p.vec_id, MAX(${cos("p.ve", "s.ve")}) AS msim
          FROM $poolSrc p JOIN sel${k - 1} s ON p.vec_id <> s.vec_id
          WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
          GROUP BY p.vec_id)
      , pick$k AS (
          SELECT vec_id, ve, rel, msim, $k AS pick_rank FROM (
            SELECT p.vec_id, p.ve, p.rel, m.msim,
                   ROW_NUMBER() OVER (ORDER BY CAST(0.7 AS DOUBLE) * p.rel
                     - CAST(0.3 AS DOUBLE) * m.msim DESC, p.vec_id) AS rn
            FROM $poolSrc p JOIN m$k m ON p.vec_id = m.vec_id) x
          WHERE rn = 1)
      , sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM pick$k)"""
    }.mkString
    s"""
      sel1 AS (
          SELECT vec_id, ve, rel, CAST(NULL AS DOUBLE) AS msim, 1 AS pick_rank
          FROM $poolSrc ORDER BY rel DESC, vec_id LIMIT 1)$steps
      SELECT vec_id, CAST(pick_rank AS INT) AS pick_rank,
             ROUND(rel, 6) AS rel, ROUND(msim, 6) AS max_sim_sel
      FROM sel5 ORDER BY pick_rank"""
  }

  /** Top principal component of the embedding cloud by TWO power
    * iterations in the FACTORED form vₖ₊₁ = Xᵀ(X·vₖ) — the Gram matrix
    * X'X is never materialized, so each iteration is two joins on
    * (vec_id | dim) over the exploded (vec_id, dim, q) coordinates plus
    * two hash aggregates: the plan a 1000-executor cluster runs
    * unchanged whether X is 2k×64 or 10¹⁰×64 (the d²-cell Gram build,
    * by contrast, explodes 4096 cells per row before aggregating).
    * Determinism discipline (the Clustering/k-means treatment):
    * coordinates quantize to exact 1e-3 integers, every matrix-vector
    * sum is an exact integer SUM (bounded: |v₂| ≤ n·10³·64·10⁹ — far
    * inside BIGINT at bench scale; the per-iteration max-abs
    * renormalization to the 1e6 grid is what keeps the NEXT iteration
    * bounded at any n), and the only float ops are the renormalize
    * divides — identical IEEE chains both engines. v₀ = 1⃗ fixes the
    * sign. Output: exact quantized loading + its float display twin. */
  private def pcaSql(spark: Boolean): String = {
    val coords =
      if (spark) """
      co AS (SELECT vec_id, pos AS d,
                    CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS q
             FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x)"""
      else """
      co AS (SELECT vec_id, i - 1 AS d,
                    CAST(FLOOR(emb[i] * 1000) AS BIGINT) AS q
             FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings) e, range(1, 65) r(i))"""
    s"""
      WITH $coords,
      s1 AS (SELECT vec_id, CAST(SUM(q) AS BIGINT) AS s FROM co GROUP BY vec_id),
      v1 AS (SELECT co.d, CAST(SUM(co.q * s1.s) AS BIGINT) AS v
             FROM co JOIN s1 ON co.vec_id = s1.vec_id GROUP BY co.d),
      m1 AS (SELECT CAST(MAX(ABS(v)) AS DOUBLE) AS m FROM v1),
      v1q AS (SELECT d, CAST(ROUND(1000000.0 * (CAST(v AS DOUBLE) / m)) AS BIGINT) AS vq
              FROM v1 CROSS JOIN m1),
      s2 AS (SELECT co.vec_id, CAST(SUM(co.q * v1q.vq) AS BIGINT) AS s
             FROM co JOIN v1q ON co.d = v1q.d GROUP BY co.vec_id),
      v2 AS (SELECT co.d, CAST(SUM(co.q * s2.s) AS BIGINT) AS v
             FROM co JOIN s2 ON co.vec_id = s2.vec_id GROUP BY co.d),
      m2 AS (SELECT CAST(MAX(ABS(v)) AS DOUBLE) AS m FROM v2)
      SELECT d AS dim,
             CAST(ROUND(1000000.0 * (CAST(v AS DOUBLE) / m)) AS BIGINT) AS pc1_q,
             ROUND(CAST(v AS DOUBLE) / m, 6) AS pc1
      FROM v2 CROSS JOIN m2
      ORDER BY dim"""
  }

  /** End-to-end RAG retrieval in ONE statement — the "it all composes"
    * pipeline for the serving side (the batch twin of every piece is
    * separately oracled): hybrid retrieval (BM25 lexical + dense cosine,
    * fused by reciprocal-rank k=60 exactly as search_hybrid_rrf), the
    * top-5 fused docs chunked on the text_chunks 64/48 grid, and the
    * chunks PACKED into a 768-token context budget in (retrieval rank,
    * chunk order) — a running-sum window cut, the prompt-assembly step
    * every RAG service runs. Scale: both retrieval legs are
    * TakeOrderedAndProject top-k's before any window; chunking explodes
    * only the 5 RETRIEVED docs (never the corpus); the packing window
    * orders ≤ a few dozen chunk rows. Output is integer-only (ranks,
    * token counts, running totals) — the fused rrf double orders rows
    * bit-identically in both engines (hybrid_rrf's argument) but is
    * never projected. */
  private def ragSql(spark: Boolean): String = {
    val cosExpr =
      if (spark) "COSINE_SIM(q.embedding, e.embedding)"
      else "LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(e.embedding AS DOUBLE[]))"
    val size = if (spark) "SIZE" else "LEN"
    val chunkJoin =
      if (spark)
        "FROM top5 t5 JOIN t ON t5.doc_id = t.doc_id " +
          "LATERAL VIEW EXPLODE(SEQUENCE(0, SIZE(t.toks) - 1, 48)) ch AS s"
      else
        "FROM top5 t5 JOIN t ON t5.doc_id = t.doc_id, " +
          "UNNEST(range(0, LEN(t.toks), 48)) AS u(s)"
    val sExpr = if (spark) "s" else "CAST(u.s AS BIGINT)"
    s"""
      WITH ${TextAnalysis.bm25Ctes(spark)},
      lex10 AS (
        SELECT doc_id, ROUND(${TextAnalysis.bm25Sum()}, 6) AS score
        FROM d CROSS JOIN st
        ORDER BY score DESC, doc_id
        LIMIT 10
      ), lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rn
        FROM lex10
      ), dense10 AS (
        SELECT e.vec_id AS doc_id, ROUND($cosExpr, 6) AS cos
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY cos DESC, doc_id
        LIMIT 10
      ), dense AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS dense_rn
        FROM dense10
      ), fused AS (
        SELECT doc_id,
               COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense_rn), CAST(0.0 AS DOUBLE))
                 + COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rn), CAST(0.0 AS DOUBLE)) AS rrf
        FROM dense FULL OUTER JOIN lex USING (doc_id)
      ), top5 AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS ret_rank
        FROM (SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 5) x
      ), chunks AS (
        SELECT t5.ret_rank, t5.doc_id, $sExpr AS chunk_start,
               LEAST(64, $size(t.toks) - $sExpr) AS n_tok_chunk
        $chunkJoin
        WHERE $size(t.toks) > 0
      ), packed AS (
        SELECT ret_rank, doc_id, chunk_start, n_tok_chunk,
               SUM(n_tok_chunk) OVER (ORDER BY ret_rank, chunk_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM chunks
      )
      SELECT CAST(ret_rank AS INT) AS ret_rank, doc_id,
             CAST(chunk_start AS BIGINT) AS chunk_start,
             CAST(n_tok_chunk AS BIGINT) AS n_tok_chunk,
             CAST(cum_tok AS BIGINT) AS cum_tok
      FROM packed
      WHERE cum_tok <= 768
      ORDER BY ret_rank, chunk_start"""
  }

  /** Retrieval-quality evaluation (recall@k / precision@k / MRR —
    * Voorhees TREC-8 for MRR) over the exact-cosine retriever with
    * same-`label` vectors as graded-relevant: the eval harness every
    * retrieval stack runs against its golden set. Ranking reuses
    * ann_cosine_topk's validated ROUND(cos,6) compare (bit-identical
    * doubles, FloatDisciplineSpec rule); every metric then derives
    * from INTEGER ranks in exact micro units (split divide), so the
    * metric layer can never drift between engines. 20 queries × corpus
    * is the same bounded-query brute-force shape as ann_cosine_topk;
    * at 100 TB the retriever under eval swaps to the LSH/IVF path and
    * this metric layer is unchanged (it only sees (qid, rank, label)). */
  private def evalRetrievalSql(spark: Boolean): String = {
    val cos =
      if (spark) "COSINE_SIM(q.qe, e.embedding)"
      else "LIST_COSINE_SIMILARITY(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))"
    val mdiv = Statistics.microDiv(_: String, _: String, spark)
    s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        FROM embeddings WHERE vec_id < 20
      ),
      scored AS (
        SELECT q.qid, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
               ROUND($cos, 6) AS cos
        FROM q JOIN embeddings e ON e.vec_id <> q.qid
      ),
      ranked AS (
        SELECT qid, qlabel, nid, nlabel,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS BIGINT) AS rn
        FROM scored
      ),
      rel AS (
        SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM q JOIN embeddings e
          ON e.label = q.qlabel AND e.vec_id <> q.qid
        GROUP BY q.qid
      ),
      top AS (
        SELECT qid,
               CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits,
               CAST(MIN(CASE WHEN nlabel = qlabel THEN rn END) AS BIGINT)
                 AS first_rel
        FROM ranked WHERE rn <= 10 GROUP BY qid
      )
      SELECT t.qid, r.n_rel, t.hits, t.first_rel,
             ${mdiv("t.hits", "LEAST(10, r.n_rel)")} AS recall_at10_micro,
             t.hits * 100000 AS precision_at10_micro,
             COALESCE(${mdiv("1", "t.first_rel")}, 0) AS rr_micro
      FROM top t JOIN rel r ON t.qid = r.qid
      ORDER BY t.qid"""
  }

  /** Product quantization with asymmetric-distance scan (Jégou, Douze
    * & Schmid, PAMI'11 — the memory-bound ANN workhorse): 64 dims →
    * m=4 subspaces × 16 dims, a 10-codeword codebook per subspace
    * (deterministic training: per-label truncated-mean centroids on
    * the exact 1e-6 grid, so both engines learn the identical book),
    * vectors encode to 4 small codes, and the query scans CODES while
    * distances come from a 40-row (subspace, codeword) lookup — the
    * ADC trick. All-integer arithmetic end to end: quantized values,
    * squared distances, sign-aware truncated means. 100 TB shape: the
    * codebook (640 rows) and the query's ADC table (40 rows) both
    * broadcast; encode is a map-side equi-join on (s, d); the scan
    * touches 4-byte-ish codes, never raw vectors — exactly why PQ
    * exists at scale. */
  /** The PQ train/encode chain (x → codebook → per-subspace encode →
    * nearest-codeword codes), shared verbatim by the batch query, the
    * oracle, and the PERSISTED-index build (`pqIndexFixture`) so all
    * three learn the identical book and codes. */
  private def pqBaseCtes(spark: Boolean): String = {
    val dv = if (spark) "DIV" else "//"
    val x =
      if (spark) """
        SELECT vec_id, label,
               CAST(pos DIV 16 AS INT) AS s, CAST(pos % 16 AS INT) AS d,
               CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM embeddings LATERAL VIEW POSEXPLODE(embedding) pe AS pos, v"""
      else """
        SELECT vec_id, label,
               CAST((u.i - 1) // 16 AS INT) AS s, CAST((u.i - 1) % 16 AS INT) AS d,
               CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM embeddings, UNNEST(RANGE(1, 65)) AS u(i)"""
    s"""x AS ($x),
      cb AS (
        SELECT s, label AS cw, d,
               CASE WHEN SUM(qv) >= 0 THEN SUM(qv) $dv COUNT(*)
                    ELSE -((-SUM(qv)) $dv COUNT(*)) END AS cv
        FROM x GROUP BY s, label, d
      ),
      enc AS (
        SELECT x.vec_id, x.s, c.cw,
               CAST(SUM((x.qv - c.cv) * (x.qv - c.cv)) AS BIGINT) AS dist
        FROM x JOIN cb c ON x.s = c.s AND x.d = c.d
        GROUP BY x.vec_id, x.s, c.cw
      ),
      code AS (
        SELECT vec_id, s, cw AS code
        FROM (SELECT vec_id, s, cw,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, s
                       ORDER BY dist, cw) AS rn
              FROM enc) z
        WHERE rn = 1
      )"""
  }

  /** The coarse-cell assignment CTEs (nearest full codebook row by
    * summed per-subspace encode distance — the IVF-PQ inverted-list
    * key, Jégou PAMI'11 §IV), shared VERBATIM by the persisted-index
    * build and the cell-pruned probe oracle so both assign identical
    * cells. Assumes `enc` from `pqBaseCtes` is in scope. */
  private def pqCellCtes: String = """
      cellsum AS (
        SELECT vec_id, cw, CAST(SUM(dist) AS BIGINT) AS tdist
        FROM enc GROUP BY vec_id, cw
      ),
      cell AS (
        SELECT vec_id, cw AS cell
        FROM (SELECT vec_id, cw,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY tdist, cw) AS rn
              FROM cellsum) z
        WHERE rn = 1
      )"""

  /** Cells probed by `ann_pq_ivf_probe`: the query's nprobe nearest
    * coarse cells by its own ADC table. 3 of the 10 codebook cells —
    * the recall/scan trade a deployment tunes; candidacy (and the
    * oracle) restrict to exactly these cells. */
  private val PqNProbe = 3

  /** The cell-pruned IVF-PQ probe replication: same approximation as
    * the serving path — cells from the shared assignment CTEs, probe
    * set = the query's PqNProbe nearest cells (ties by cell id), ADC
    * restricted to their members — so the compare stays byte-exact. */
  private def pqIvfProbeSql: String = {
    s"""
      WITH ${pqBaseCtes(spark = false)},
      ${pqCellCtes},
      qd AS (
        SELECT e.s AS s, c.cw AS cw,
               CAST(SUM((e.qv - c.cv) * (e.qv - c.cv)) AS BIGINT) AS qdist
        FROM x e JOIN cb c ON e.s = c.s AND e.d = c.d
        WHERE e.vec_id = 0
        GROUP BY e.s, c.cw
      ),
      probe AS (
        SELECT cw AS cell
        FROM qd GROUP BY cw
        ORDER BY CAST(SUM(qdist) AS BIGINT), cw LIMIT $PqNProbe
      ),
      adc AS (
        SELECT co.vec_id AS nid, CAST(SUM(q.qdist) AS BIGINT) AS adc_dist
        FROM code co
        JOIN cell ce ON co.vec_id = ce.vec_id
        JOIN probe p ON ce.cell = p.cell
        JOIN qd q ON co.s = q.s AND co.code = q.cw
        WHERE co.vec_id <> 0
        GROUP BY co.vec_id
      ),
      top AS (
        SELECT nid, adc_dist FROM adc ORDER BY adc_dist, nid LIMIT 10
      )
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, nid) AS INT) AS rank,
             nid, adc_dist
      FROM top ORDER BY rank"""
  }

  private def pqAdcSql(spark: Boolean): String = {
    s"""
      WITH ${pqBaseCtes(spark)},
      qd AS (
        SELECT e.s AS s, c.cw AS cw,
               CAST(SUM((e.qv - c.cv) * (e.qv - c.cv)) AS BIGINT) AS qdist
        FROM x e JOIN cb c ON e.s = c.s AND e.d = c.d
        WHERE e.vec_id = 0
        GROUP BY e.s, c.cw
      ),
      adc AS (
        SELECT co.vec_id AS nid, CAST(SUM(q.qdist) AS BIGINT) AS adc_dist
        FROM code co JOIN qd q ON co.s = q.s AND co.code = q.cw
        WHERE co.vec_id <> 0
        GROUP BY co.vec_id
      )
      ,
      top AS (
        -- top-k cut BEFORE the rank window: Spark plans the ORDER BY +
        -- LIMIT as distributed TakeOrderedAndProject, so the
        -- unpartitioned ROW_NUMBER only ever sees 10 rows (the suite's
        -- standard guard against corpus-sized single-partition windows)
        SELECT nid, adc_dist FROM adc ORDER BY adc_dist, nid LIMIT 10
      )
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, nid) AS INT) AS rank,
             nid, adc_dist
      FROM top ORDER BY rank"""
  }

  /** Quantile normalization across embedding dimensions (Bolstad et
    * al., Bioinformatics'03 — the microarray-era distribution equalizer,
    * now standard feature preprocessing): every dimension's values are
    * replaced by the cross-dimension mean at their RANK, making all 64
    * per-dimension distributions literally identical. All-integer: the
    * 1e-6 quantize grid, per-dim rank windows with a (value, vec_id)
    * total order, rank-group sums, sign-aware truncated means. The
    * output is the per-dim distribution signature — 64 rows whose
    * stats columns must all agree, which IS the operator's contract.
    * 100 TB shape: one narrow explode, 64 independent per-dim window
    * sorts (partition-parallel), one rank-keyed aggregate whose group
    * count equals the row count per dim — never a global sort. */
  private def quantileNormSql(spark: Boolean): String = {
    val x =
      if (spark) """
        SELECT vec_id, CAST(pos AS INT) AS dim,
               CAST(FLOOR(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM embeddings LATERAL VIEW POSEXPLODE(embedding) pe AS pos, v"""
      else """
        SELECT vec_id, CAST(u.i - 1 AS INT) AS dim,
               CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
        FROM embeddings, UNNEST(RANGE(1, 65)) AS u(i)"""
    val dv = if (spark) "DIV" else "//"
    s"""
      WITH x AS ($x),
      rk AS (
        SELECT vec_id, dim, qv,
               CAST(ROW_NUMBER() OVER (PARTITION BY dim
                 ORDER BY qv, vec_id) AS BIGINT) AS r
        FROM x
      ),
      ref AS (
        SELECT r,
               CASE WHEN SUM(qv) >= 0 THEN SUM(qv) $dv 64
                    ELSE -((-SUM(qv)) $dv 64) END AS refv
        FROM rk GROUP BY r
      ),
      norm AS (
        SELECT rk.vec_id, rk.dim, ref.refv
        FROM rk JOIN ref ON rk.r = ref.r
      )
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(refv) AS BIGINT) AS sum_norm,
             CAST(MIN(refv) AS BIGINT) AS min_norm,
             CAST(MAX(refv) AS BIGINT) AS max_norm
      FROM norm
      GROUP BY dim
      ORDER BY dim"""
  }

  /** Hard-negative mining for contrastive/triplet training (Schroff et
    * al. CVPR'15 FaceNet; the batch-mining staple): per anchor, the
    * top-3 SAME-label neighbors (positives) and the top-3
    * DIFFERENT-label neighbors by cosine (hard negatives — the
    * impostors closest to the anchor, exactly the pairs a triplet loss
    * learns most from). One scored join, one window partitioned by
    * (anchor, polarity); ann_cosine_topk's pinned ROUND(cos,6)
    * ordering; ranks integer. Same bounded-anchor brute-force shape as
    * eval_retrieval — at 100 TB the candidate generator swaps to the
    * LSH/IVF path per polarity and this mining layer is unchanged. */
  private def hardNegSql(spark: Boolean): String = {
    val cos =
      if (spark) "COSINE_SIM(q.qe, e.embedding)"
      else "LIST_COSINE_SIMILARITY(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))"
    s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        FROM embeddings WHERE vec_id < 10
      ),
      scored AS (
        SELECT q.qid, e.vec_id AS nid,
               CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS is_pos,
               ROUND($cos, 6) AS cos
        FROM q JOIN embeddings e ON e.vec_id <> q.qid
      ),
      ranked AS (
        SELECT qid, nid, is_pos, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid, is_pos
                 ORDER BY cos DESC, nid) AS INT) AS rn
        FROM scored
      )
      SELECT qid, nid, is_pos, cos, rn
      FROM ranked WHERE rn <= 3
      ORDER BY qid, is_pos DESC, rn"""
  }

  /** The LSH bucket geometry shared by the batch and indexed-serving
    * paths: 16 tables, ADAPTIVE planes — pe = smallest p in [6, 18]
    * with n ≤ 64·2^p (the r15 finding: a fixed plane count lets
    * per-bucket occupancy, and so probe cost, grow linearly with the
    * corpus). Integer-exact; `graft.ann.lshTables`/`lshPlanes` knobs
    * override for deployment tuning (DiagLshKnob), but the driver
    * never sets them, so every oracled run is adaptive. */
  private[graft] def lshGeometry(spark: SparkSession,
                                 emb: DataFrame): (Int, Int) = {
    val tables = spark.conf.getOption("graft.ann.lshTables")
      .map(_.toInt).getOrElse(16)
    val planes = spark.conf.getOption("graft.ann.lshPlanes")
      .map(_.toInt).getOrElse {
        val n = emb.count()
        val pe = (6 to 18).find(p => n <= 64L * (1L << p)).getOrElse(18)
        System.err.println(s"[graft-scale] ann_lsh pe=$pe n=$n")
        pe
      }
    // buckets are encoded as a signed-Int bitmask of plane signs and
    // signs are indexed per table — out-of-range knobs would corrupt
    // buckets (planes > 31 overflows 1 << p) or crash deep inside the
    // kernel (tables = 0). Fail here with the knob's own name.
    require(tables >= 1,
      s"graft.ann.lshTables must be >= 1 (got $tables)")
    require(planes >= 1 && planes <= 31,
      s"graft.ann.lshPlanes must be in [1, 31] (got $planes): bucket " +
        "ids are signed-Int sign masks")
    (tables, planes)
  }

  // ------------------------------------------------------------------
  // ANN serving path (r16 verdict "What's missing #2"): the batch LSH
  // query recomputes bucketing every run (~2.5e9 sign multiplies at
  // sf10/pe=12 — the r16 probe-cost record shows it dominating batch
  // wall-time ~1000×), so the 64× candidate shrink only pays when the
  // buckets are a PERSISTED index and probes are online. This is that
  // split: build once into a Hive-bucketed, key-sorted file layout;
  // serve a probe batch as a driver-pruned, broadcast-joined lookup.
  // ------------------------------------------------------------------

  /** Hive bucket-file count of the persisted LSH index. Fixed at the
    * fixture SFs; at deployment it scales with the corpus (it is a
    * file-layout grain, ~index_bytes / target_file_size — the probe
    * path only ever opens the files its keys hash to, so the count
    * changes cost, not semantics). */
  private val IndexBuckets = 64
  private val indexLock = new Object

  /** pe-INVARIANT file-routing key of an index row: tbl·32 + the low 5
    * BUCKET bits. The plane-prefix invariant (bucket at pe = low pe
    * bits of any larger-pe bucket, because plane signs are seeded per
    * (table, plane) independent of the plane count) makes this stable
    * across re-bucketing epochs for every pe ≥ 5 — the adaptive domain
    * is [6,18] and an epoch-0 index one step below it is ≥ 5 — so a
    * pe → pe+1 step NEVER moves a row to a different file: the whole
    * migration is a per-file local key rewrite (see
    * `migrateLshIndexPeStep`). Routing on the raw key would bake pe
    * into the file placement and turn every epoch step into a full
    * re-shuffle of the index. 16 tables × 32 low-bucket values = 512
    * distinct route keys spread over the 64 files, so per-probe file
    * pruning is as selective as before. */
  private[graft] def invRouteKey(key: Column, planes: Int): Column =
    shiftright(key, planes) * lit(32L) + key.bitwiseAND(lit(31L))
  private[graft] def invRouteKeyOf(k: Long, planes: Int): Long =
    (k >> planes) * 32L + (k & 31L)

  /** Metadata-only fingerprint of the embeddings source (file names,
    * sizes, mtimes — an FS listing, no job): the index-staleness
    * signal. A regenerated corpus changes it; the fixture rebuilds. */
  private def embSourceFingerprint(spark: SparkSession,
                                   sfDir: String): String = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$sfDir/embeddings.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    val sig = stats.map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").mkString("|")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** Builds (once per warehouse, marker-gated) the persisted LSH index
    * for `sfDir`'s embeddings: rows (key, vec_id, embedding) where
    * key = tbl·2^planes + bucket, routed into `IndexBuckets` Hive
    * bucket files by HiveHash(invRouteKey) — the pe-invariant routing
    * that keeps epoch steps file-local — and SORTED by key inside each
    * file
    * (parquet row-group stats make per-key reads sub-file). The
    * embedding rides IN the index (the Faiss inverted-list discipline:
    * ~tables× storage so the probe path never touches the base table).
    * Build = one map pass (bucketing kernel) + the one routing shuffle.
    * Returns (dir, tables, planes) — geometry is read back from the
    * index's own meta on reuse, REVALIDATED against the current
    * session (r17 review finding: a knob change or a regenerated
    * corpus must rebuild, or the probe path silently serves geometry
    * the batch query and the oracle no longer compute): the meta
    * carries (tables, planes, source fingerprint); reuse requires the
    * fingerprint to match (metadata-only FS listing — still no corpus
    * recount) and any SET knob to agree with the recorded geometry.
    * With knobs unset a matching fingerprint proves the recorded
    * adaptive pe is still the adaptive answer. */
  private[graft] def lshIndexFixture(spark: SparkSession,
                                     sfDir: String): (String, Int, Int) =
    indexLock.synchronized {
      import org.apache.hadoop.fs.Path
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/lsh_index_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val meta = new Path(dir, "_LSH_META")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fp = embSourceFingerprint(spark, sfDir)
      // meta: tables,planes,fingerprint,kbT,kbP — PER-KNOB flags (r17
      // ADVICE: one combined bit let an index built with only
      // lshPlanes set be reused by a session that set only lshTables —
      // the unset planes knob agreed vacuously while the session's
      // adaptive pe diverged from the recorded knob-forced one). Each
      // parameter's knob-present state must match the build's
      // individually, AND any set knob's value must equal the recorded
      // geometry; clearing either knob still invalidates.
      val knobT = spark.conf.getOption("graft.ann.lshTables").map(_.toInt)
      val knobP = spark.conf.getOption("graft.ann.lshPlanes").map(_.toInt)
      val cached: Option[(Int, Int)] =
        if (fs.exists(new Path(dir, "_BUCKETS_OK")) && fs.exists(meta)) {
          val in = fs.open(meta)
          val line = scala.io.Source.fromInputStream(in).mkString.trim
          in.close()
          line.split(",") match {
            case Array("r32", t, p, f, kbT, kbP) if f == fp =>
              val (tm, pm) = (t.toInt, p.toInt)
              val sameT = (kbT == "1") == knobT.isDefined && knobT.forall(_ == tm)
              val sameP = (kbP == "1") == knobP.isDefined && knobP.forall(_ == pm)
              if (sameT && sameP) Some((tm, pm))
              else None // a knob's state or value disagrees with the build
            case _ => None // stale fingerprint or older meta format
          }
        } else None
      cached match {
        case Some((t, p)) => (dir, t, p)
        case None =>
          Tables.register(spark, sfDir)
          GraftFunctions.register(spark)
          val emb = spark.table("embeddings")
          val (tables, planes) = lshGeometry(spark, emb)
          val rows = emb
            .withColumn("bs",
              GraftFunctions.lsh_buckets(col("embedding"), tables, planes))
            .select(col("vec_id"), col("embedding"),
              posexplode(col("bs")).as(Seq("tbl", "bucket")))
            .select(
              (col("tbl").cast("long") * (1L << planes) + col("bucket"))
                .as("key"),
              col("vec_id"), col("embedding"))
          graft.sources.HiveBucketedIO.writeBucketed(
            rows, dir, IndexBuckets, Seq(col("key")),
            invRouteKey(col("key"), planes))
          val out = fs.create(meta, true)
          val kbT = if (knobT.isDefined) "1" else "0"
          val kbP = if (knobP.isDefined) "1" else "0"
          out.write(s"r32,$tables,$planes,$fp,$kbT,$kbP".getBytes("UTF-8"))
          out.close()
          (dir, tables, planes)
      }
    }

  /** Driver-pruned index read for a probe key set: each key's Hive
    * bucket is decided with the driver-side hash of its pe-INVARIANT
    * route key (the `source_hive_bucket_lookup` discipline — the scan
    * never opens the other buckets' files), then the key equi-filter
    * is pushed into the parquet scan where the within-file key sort
    * turns it into row-group pruning. ALL file generations of a hit
    * bucket are read (base + appended deltas — the maintenance path
    * routes deltas with the same hash and sort, so pruning composes).
    * Returns the scan plus the chosen bucket ids so the plan gate can
    * assert the pruning held. */
  private[graft] def prunedIndexScan(spark: SparkSession, dir: String,
                                     keys: Seq[Long],
                                     planes: Int): (DataFrame, Seq[Int]) = {
    val hit = keys
      .map(k => graft.sources.HiveBucketedIO.bucketIdOf(
        IndexBuckets, invRouteKeyOf(k, planes)))
      .distinct.sorted
    val scan =
      if (hit.isEmpty) // empty probe batch: schema-only, zero files
        graft.sources.HiveBucketedIO.readBucketFile(spark, dir, 0).limit(0)
      else spark.read.parquet(hit.flatMap(n =>
        graft.sources.HiveBucketedIO.bucketGenFiles(spark, dir, n)): _*)
    val live = scan.where(col("key").isin(keys: _*))
    // tombstone subtraction (the delete-maintenance path): ONLY the hit
    // buckets' tombstone files are read — they were routed by the same
    // hash as the rows they retire, so pruning covers them for free —
    // and the key filter bounds them like the data side. The broadcast
    // anti-join is probe-bounded, not corpus-bounded. Layouts with no
    // tombstones (one FS listing to know) keep their original plan.
    val subtracted =
      if (hit.isEmpty ||
          !graft.sources.HiveBucketedIO.hasTombstones(spark, dir)) live
      else {
        val tombFiles = hit.flatMap(n =>
          graft.sources.HiveBucketedIO.bucketTombFiles(spark, dir, n))
        if (tombFiles.isEmpty) live
        else {
          val tombs = spark.read.parquet(tombFiles: _*)
            .where(col("key").isin(keys: _*))
          live.join(broadcast(tombs), Seq("key", "vec_id"), "left_anti")
        }
      }
    (subtracted, hit)
  }

  /** The shared serving-path top-3: probe keys from the batch's own
    * vectors (|batch|·tables rows cross to the driver — bounded by the
    * batch, not the corpus), driver-pruned index scan, candidates
    * arrive WITH their embeddings (the index carries them), broadcast
    * rerank. Used by both the built-once and the base+append index
    * queries — the answers must be byte-identical to the batch form. */
  private[graft] def probeIndexTopK(spark: SparkSession, dir: String,
                                    tables: Int, planes: Int): DataFrame = {
    val emb = spark.table("embeddings")
    val qemb = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val qkeys = qemb
      .withColumn("bs",
        GraftFunctions.lsh_buckets(col("qemb"), tables, planes))
      .select(col("qid"), posexplode(col("bs")).as(Seq("tbl", "bucket")))
      .select(col("qid"),
        (col("tbl").cast("long") * (1L << planes) + col("bucket")).as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (pruned, _) = prunedIndexScan(spark, dir, qkeys.map(_._2).distinct, planes)
    import spark.implicits._
    val qk = qkeys.toSeq.toDF("qid", "key")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    pruned.join(broadcast(qk), "key")
      .where(col("qid") =!= col("vec_id"))
      // same (qid, nid) from several tables carries an identical
      // embedding copy — candidate set is batch-bounded, so the
      // distinct may keep the vector (no corpus-scale wide shuffle)
      .select(col("qid"), col("vec_id").as("nid"), col("embedding"))
      .distinct()
      .join(broadcast(qemb), "qid")
      .withColumn("cos",
        round(GraftFunctions.cosine_sim(col("qemb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Base+append variant of the index fixture (r17, the maintenance
    * path): the corpus splits deterministically into a 3/4 base
    * (vec_id % 4 != 0) built as generation 0 and a 1/4 delta
    * (vec_id % 4 == 0) APPENDED as generation 1 — one shuffle of the
    * delta only, base files untouched. Geometry is pinned to the FULL
    * corpus (base ∪ delta bucketed at the same planes IS the full
    * bucketing, which is what makes the batch oracle apply verbatim);
    * a real deployment re-buckets when the adaptive pe steps — the
    * append path covers everything between re-bucketing epochs. */
  private[graft] def lshIndexIncrFixture(spark: SparkSession,
                                         sfDir: String): (String, Int, Int) =
    indexLock.synchronized {
      import org.apache.hadoop.fs.Path
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/lsh_index_incr_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val meta = new Path(dir, "_LSH_META")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fp = embSourceFingerprint(spark, sfDir)
      val cached: Option[(Int, Int)] =
        if (fs.exists(new Path(dir, "_BUCKETS_OK")) && fs.exists(meta)) {
          val in = fs.open(meta)
          val line = scala.io.Source.fromInputStream(in).mkString.trim
          in.close()
          line.split(",") match {
            case Array("r32", t, p, f, "0", "0") if f == fp &&
                spark.conf.getOption("graft.ann.lshTables").isEmpty &&
                spark.conf.getOption("graft.ann.lshPlanes").isEmpty =>
              Some((t.toInt, p.toInt))
            case _ => None
          }
        } else None
      cached match {
        case Some((t, p)) => (dir, t, p)
        case None =>
          Tables.register(spark, sfDir)
          GraftFunctions.register(spark)
          val emb = spark.table("embeddings")
          val (tables, planes) = lshGeometry(spark, emb)
          def indexRows(part: DataFrame) = part
            .withColumn("bs",
              GraftFunctions.lsh_buckets(col("embedding"), tables, planes))
            .select(col("vec_id"), col("embedding"),
              posexplode(col("bs")).as(Seq("tbl", "bucket")))
            .select(
              (col("tbl").cast("long") * (1L << planes) + col("bucket"))
                .as("key"),
              col("vec_id"), col("embedding"))
          graft.sources.HiveBucketedIO.writeBucketed(
            indexRows(emb.where(col("vec_id") % 4 =!= 0)),
            dir, IndexBuckets, Seq(col("key")),
            invRouteKey(col("key"), planes))
          graft.sources.HiveBucketedIO.appendBucketed(
            indexRows(emb.where(col("vec_id") % 4 === 0)),
            dir, IndexBuckets, Seq(col("key")),
            invRouteKey(col("key"), planes))
          val out = fs.create(meta, true)
          val kbT = if (spark.conf.getOption("graft.ann.lshTables").isDefined)
            "1" else "0"
          val kbP = if (spark.conf.getOption("graft.ann.lshPlanes").isDefined)
            "1" else "0"
          out.write(s"r32,$tables,$planes,$fp,$kbT,$kbP".getBytes("UTF-8"))
          out.close()
          (dir, tables, planes)
      }
    }

  /** The 64 per-bucket migration branches of a pe → pe+1 re-bucketing
    * epoch, each a SINGLE partition that never leaves its file: read
    * the bucket's committed generations (a migration also compacts
    * deltas into the new generation 0), append the ONE new bucket bit
    * — plane index `peOld` of the row's own table, recomputed locally
    * from the embedding the index already carries (`lsh_plane_bit`;
    * planes× less compute than full re-bucketing) — and re-sort by the
    * new key inside the partition. The plane-prefix invariant
    * guarantees low bits are unchanged, and `invRouteKey` routing
    * guarantees the new key still belongs to this file, so the whole
    * epoch step is shuffle-free (gated in `rewriteBucketedLocal` and
    * AnnIndexSpec). */
  private[graft] def migratedBuckets(spark: SparkSession, srcDir: String,
                                     peOld: Int): Seq[DataFrame] = {
    require(peOld >= 5,
      s"epoch step from pe=$peOld would change the low-5-bit file routing")
    val tbl = shiftright(col("key"), peOld).cast("int")
    val bit = GraftFunctions.lsh_plane_bit(col("embedding"), tbl, peOld)
    val newKey =
      shiftleft(shiftright(col("key"), peOld), peOld + 1) +
        col("key").bitwiseAND(lit((1L << peOld) - 1)) +
        shiftleft(bit.cast("long"), peOld)
    // one footer read for the layout's schema — 64 per-branch schema
    // inferences would otherwise dominate the migration's driver-side
    // constant (measured ~seconds at any corpus size)
    val schema = graft.sources.HiveBucketedIO.readBucketFile(spark, srcDir, 0)
      .schema
    (0 until IndexBuckets).map { n =>
      val files = graft.sources.HiveBucketedIO.bucketGenFiles(spark, srcDir, n)
      spark.read.schema(schema).parquet(files: _*).coalesce(1)
        .withColumn("key", newKey)
        .select(col("key"), col("vec_id"), col("embedding"))
        .sortWithinPartitions(col("key"))
    }
  }

  /** Re-bucketing EPOCH: migrates a persisted index from peOld to
    * peOld+1 as 64 independent per-file local splits — zero shuffle,
    * zero re-hashing of the corpus, one plane dot product per index
    * row (vs tables·planes for a rebuild, PLUS the rebuild's full
    * index shuffle). This is what runs when n crosses 64·2^pe at
    * deployment: an overnight re-ingest becomes a per-file pass.
    * Hive analog: ALTER TABLE ... CONCATENATE-class per-file rewrites
    * (SURVEY §2.1 #19) rather than re-ingest. */
  private[graft] def migrateLshIndexPeStep(spark: SparkSession,
                                           srcDir: String, destDir: String,
                                           peOld: Int): Unit =
    graft.sources.HiveBucketedIO.rewriteBucketedLocal(
      migratedBuckets(spark, srcDir, peOld), destDir)

  /** Fixture for the migrated-epoch serving query: epoch-0 index built
    * at pe−1 (the geometry the index HAD before the corpus crossed the
    * 64·2^(pe−1) threshold), stepped to the current adaptive pe by
    * `migrateLshIndexPeStep`, then served exactly like the built-once
    * index. Because the migrated content equals a direct pe build
    * row-for-row (same buckets by the prefix invariant, same files by
    * the invariant routing), the serving answer must byte-match the
    * batch form — the oracle is the identical replication. */
  private[graft] def lshIndexMigratedFixture(spark: SparkSession,
                                             sfDir: String): (String, Int, Int) =
    indexLock.synchronized {
      import org.apache.hadoop.fs.Path
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/lsh_index_mig_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val meta = new Path(dir, "_LSH_META")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fp = embSourceFingerprint(spark, sfDir)
      val cached: Option[(Int, Int)] =
        if (fs.exists(new Path(dir, "_BUCKETS_OK")) && fs.exists(meta)) {
          val in = fs.open(meta)
          val line = scala.io.Source.fromInputStream(in).mkString.trim
          in.close()
          line.split(",") match {
            case Array("r32", t, p, f, "0", "0") if f == fp &&
                spark.conf.getOption("graft.ann.lshTables").isEmpty &&
                spark.conf.getOption("graft.ann.lshPlanes").isEmpty =>
              Some((t.toInt, p.toInt))
            case _ => None
          }
        } else None
      cached match {
        case Some((t, p)) => (dir, t, p)
        case None =>
          Tables.register(spark, sfDir)
          GraftFunctions.register(spark)
          val emb = spark.table("embeddings")
          val (tables, planes) = lshGeometry(spark, emb)
          val peOld = planes - 1 // ≥ 5: the adaptive domain floor is 6
          val epoch0 = dir + "_epoch0"
          val rows = emb
            .withColumn("bs",
              GraftFunctions.lsh_buckets(col("embedding"), tables, peOld))
            .select(col("vec_id"), col("embedding"),
              posexplode(col("bs")).as(Seq("tbl", "bucket")))
            .select(
              (col("tbl").cast("long") * (1L << peOld) + col("bucket"))
                .as("key"),
              col("vec_id"), col("embedding"))
          graft.sources.HiveBucketedIO.writeBucketed(
            rows, epoch0, IndexBuckets, Seq(col("key")),
            invRouteKey(col("key"), peOld))
          migrateLshIndexPeStep(spark, epoch0, dir, peOld)
          val out = fs.create(meta, true)
          out.write(s"r32,$tables,$planes,$fp,0,0".getBytes("UTF-8"))
          out.close()
          (dir, tables, planes)
      }
    }

  /** Fixture for the tombstoned-index serving query: the full-corpus
    * index with a delete batch (every 10th non-query vector) applied
    * as tombstone files — base files byte-untouched, O(delta) work
    * (`HiveBucketedIO.deleteBucketed`). The tombstone rows are the
    * deleted vectors' own (key, vec_id) index entries, recomputed from
    * their embeddings with the build geometry read back from the
    * meta, so each tombstone lands in exactly the bucket file holding
    * the row it retires and the probe path's pruning covers both
    * sides. Meta written LAST (after the delete) so a crash between
    * build and delete can never serve undeleted answers from cache. */
  private[graft] def lshIndexDeletedFixture(spark: SparkSession,
                                            sfDir: String): (String, Int, Int) =
    indexLock.synchronized {
      import org.apache.hadoop.fs.Path
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/lsh_index_del_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val meta = new Path(dir, "_LSH_META")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fp = embSourceFingerprint(spark, sfDir)
      val cached: Option[(Int, Int)] =
        if (fs.exists(new Path(dir, "_BUCKETS_OK")) && fs.exists(meta)) {
          val in = fs.open(meta)
          val line = scala.io.Source.fromInputStream(in).mkString.trim
          in.close()
          line.split(",") match {
            case Array("r32", t, p, f, "0", "0") if f == fp &&
                spark.conf.getOption("graft.ann.lshTables").isEmpty &&
                spark.conf.getOption("graft.ann.lshPlanes").isEmpty =>
              Some((t.toInt, p.toInt))
            case _ => None
          }
        } else None
      cached match {
        case Some((t, p)) => (dir, t, p)
        case None =>
          Tables.register(spark, sfDir)
          GraftFunctions.register(spark)
          val emb = spark.table("embeddings")
          val (tables, planes) = lshGeometry(spark, emb)
          def indexRows(part: DataFrame) = part
            .withColumn("bs",
              GraftFunctions.lsh_buckets(col("embedding"), tables, planes))
            .select(col("vec_id"), col("embedding"),
              posexplode(col("bs")).as(Seq("tbl", "bucket")))
            .select(
              (col("tbl").cast("long") * (1L << planes) + col("bucket"))
                .as("key"),
              col("vec_id"), col("embedding"))
          graft.sources.HiveBucketedIO.writeBucketed(
            indexRows(emb), dir, IndexBuckets, Seq(col("key")),
            invRouteKey(col("key"), planes))
          graft.sources.HiveBucketedIO.deleteBucketed(
            indexRows(emb.where(deletedVecs)).select(col("key"), col("vec_id")),
            dir, IndexBuckets, invRouteKey(col("key"), planes))
          val out = fs.create(meta, true)
          out.write(s"r32,$tables,$planes,$fp,0,0".getBytes("UTF-8"))
          out.close()
          (dir, tables, planes)
      }
    }

  /** Hive-bucket-file count of the persisted PQ code table (codes are
    * ~3 small ints per row — a fraction of the raw vectors' bytes,
    * which is the PQ deal; file grain scales with the corpus at
    * deployment just like IndexBuckets). */
  private val PqCodeBuckets = 16

  /** Builds (once per warehouse, fingerprint-gated like the LSH index)
    * the persisted PQ index: `codebook` (640 (s, cw, d, cv) rows — the
    * 40-entry ADC lookup's source, always broadcast) and `codes` (4
    * codes per vector) in Hive bucket layout KEYED BY COARSE CELL —
    * each vector's nearest full codebook row (argmin over the summed
    * per-subspace encode distances), the IVF-PQ inverted-list
    * discipline (Jégou PAMI'11 §IV): cell-pruned probes become file-
    * pruned reads. The exhaustive driver probe reads all cells (its
    * oracle is the exhaustive ADC), but never re-trains, re-encodes,
    * or touches raw corpus vectors — the build-time train/encode chain
    * is the same CTE text the batch query runs, so the persisted codes
    * are byte-identical to the recomputed ones. */
  private[graft] def pqIndexFixture(spark: SparkSession,
                                    sfDir: String): String =
    indexLock.synchronized {
      import org.apache.hadoop.fs.Path
      val base = spark.conf.get("spark.sql.warehouse.dir") + "/_graft_fixtures"
      val dir = s"$base/pq_index_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      val meta = new Path(dir, "_PQ_META")
      val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fp = embSourceFingerprint(spark, sfDir)
      val ok =
        fs.exists(new Path(s"$dir/codes", "_BUCKETS_OK")) &&
          fs.exists(meta) && {
            val in = fs.open(meta)
            val line = scala.io.Source.fromInputStream(in).mkString.trim
            in.close()
            line == s"pq1,$fp"
          }
      if (!ok) {
        Tables.register(spark, sfDir)
        spark.sql(s"WITH ${pqBaseCtes(spark = true)} SELECT s, cw, d, cv FROM cb")
          .write.mode("overwrite").parquet(s"$dir/codebook")
        val codes = spark.sql(s"""
          WITH ${pqBaseCtes(spark = true)},
          ${pqCellCtes}
          SELECT cell.cell, code.vec_id, code.s, code.code
          FROM code JOIN cell ON code.vec_id = cell.vec_id""")
        graft.sources.HiveBucketedIO.writeBucketed(
          codes, s"$dir/codes", PqCodeBuckets,
          Seq(col("vec_id"), col("s")), col("cell").cast("long"))
        val out = fs.create(meta, true)
        out.write(s"pq1,$fp".getBytes("UTF-8"))
        out.close()
      }
      dir
    }

  /** The probe-side ADC lookup table (s, cw, qdist — 40 rows at this
    * codebook size) from the ONE key-pruned query row and the
    * PERSISTED codebook: the only raw-embedding touch on any PQ
    * serving path. */
  private def pqQueryAdc(spark: SparkSession, dir: String): DataFrame = {
    val cb = spark.read.parquet(s"$dir/codebook")
    val qx = spark.table("embeddings").where(col("vec_id") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(expr("CAST(pos DIV 16 AS INT)").as("s"),
        expr("CAST(pos % 16 AS INT)").as("d"),
        floor(col("v").cast("double") * 1e6).cast("long").as("qv"))
    qx.join(broadcast(cb), Seq("s", "d"))
      .groupBy(col("s"), col("cw"))
      .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv")))
        .cast("long").as("qdist"))
  }

  /** Shared ADC scoring tail of the PQ serving paths: broadcast-join
    * the ADC table onto the (possibly cell-pruned) persisted codes,
    * sum to distances, top-k cut BEFORE the rank window
    * (TakeOrderedAndProject — the suite's standard guard, so the
    * unpartitioned window only ever sees 10 rows). */
  private def pqAdcTopK(codes: DataFrame, qd: DataFrame): DataFrame = {
    val adc = codes.where(col("vec_id") =!= 0)
      .join(broadcast(qd),
        codes("s") === qd("s") && col("code") === col("cw"))
      .groupBy(col("vec_id"))
      .agg(sum(col("qdist")).cast("long").as("adc_dist"))
      .select(col("vec_id").as("nid"), col("adc_dist"))
    val top = adc.orderBy(col("adc_dist"), col("nid")).limit(10)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("adc_dist"), col("nid"))).cast("int"))
      .select(col("rank"), col("nid"), col("adc_dist"))
      .orderBy(col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "link_blocking_metrics" -> gsql(blockingMetricsSql(spark = true)),
    "embed_hard_negatives" -> gsql(hardNegSql(spark = true)),
    "embed_quantile_norm" -> gsql(quantileNormSql(spark = true)),
    "eval_retrieval" -> gsql(evalRetrievalSql(spark = true)),
    "ann_pq_adc" -> gsql(pqAdcSql(spark = true)),
    "pipeline_rag" -> gsql(ragSql(spark = true)),
    "embed_pca_power" -> gsql(pcaSql(spark = true)),
    "ann_mmr_rerank" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      // row-scale work: the top-10 pool (TakeOrderedAndProject). The
      // greedy rerank runs on the COLLECTED pool — 10 rows of
      // (id, vec, rel), bounded like the k-means centroid state. The
      // driver cosine is the same three independent left folds in
      // index order as CosineSimD / the oracle's list_reduce chain,
      // so every comparison sees bit-identical doubles.
      val pool = spark.sql(mmrPoolSql(spark = true)).collect().map { r =>
        (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
      }
      def cosD(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        if (na * nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      // Spark's ROUND on doubles: BigDecimal HALF_UP at the given scale
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sel = scala.collection.mutable.ArrayBuffer(
        (pool.head._1, pool.head._2, pool.head._3, Option.empty[Double], 1))
      for (k <- 2 to 5) {
        val best = pool.iterator
          .filter(p => !sel.exists(_._1 == p._1))
          .map { p =>
            val msim = sel.iterator.map(s => cosD(p._2, s._2)).max
            (p, msim, 0.7 * p._3 - 0.3 * msim)
          }
          .toSeq.sortBy { case (p, _, mmr) => (-mmr, p._1) }.head
        sel += ((best._1._1, best._1._2, best._1._3, Some(best._2), k))
      }
      import spark.implicits._
      sel.toSeq
        .map { case (id, _, rel, msim, k) => (id, k, r6(rel), msim.map(r6)) }
        .toDF("vec_id", "pick_rank", "rel", "max_sim_sel")
    }),
    // Per-vector symmetric int8 quantization — the storage-prep step
    // before a vector store ships 4×-smaller embeddings: scale =
    // max|x|/127, q = clamp(round(x/scale), ±127), plus the
    // reconstruction MSE so a pipeline can gate on quantization loss.
    // Every value is a deterministic per-element function (max, divide,
    // floor — no accumulation except the index-order MSE fold the
    // oracle replicates with list_reduce), so the DuckDB compare is
    // exact. Narrow map work at any scale.
    // Johnson–Lindenstrauss sign random projection 64→16 (Achlioptas,
    // JCSS'03: ±1 entries preserve pairwise distances in expectation;
    // the standard cheap dimension reduction in front of an ANN
    // index). The "random" matrix is a deterministic sign function of
    // (i, j) — a quadratic-residue parity both engines compute in
    // exact BIGINT arithmetic — so the projection is reproducible
    // across engines AND across batches (a new batch projects into
    // the SAME space, the property an index depends on). Coordinates
    // quantize first (floor(x·1e6), the Clustering discipline), so the
    // signed sum is integer-valued-double exact and order-free; the
    // closing /1e6/√16 is deterministic per-row IEEE work. Fully
    // narrow — no shuffle at any scale; output exploded to
    // (vec_id, dim, val) rows (the compare hashes scalars, not
    // arrays).
    // JL sign projection via the SignRandProj kernel: one tight 16×64
    // loop per row over the precomputed ±1 matrix (the SQL spelling's
    // 1024 ELEMENT_AT references re-evaluated the interpreted quantize
    // lambda each — 42 s at sf10, now ~4 s). Values bit-identical to
    // the oracle by exact-integer order-freedom (see kernel doc).
    "embed_random_projection" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val q = spark.table("embeddings").select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000000.0)).cast("double")).as("qe"))
      q.select(col("vec_id"),
          posexplode(GraftFunctions.sign_rand_proj(col("qe"))).as(Seq("p", "pv")))
        .select(col("vec_id"), (col("p") + 1).cast("int").as("dim"),
          (col("pv") / lit(1000000.0) / lit(4.0)).as("val"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    "embed_quantize_int8" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val mse = aggregate(
        zip_with(col("ed"), col("q"), (x, qi) => {
          val e = x - qi.cast("double") * col("sc_raw"); e * e
        }),
        lit(0.0), (s, v) => s + v) / lit(64.0)
      quantized8(spark.table("embeddings"))
        .select(col("vec_id"), round(col("sc_raw"), 9).as("scale"),
          aggregate(col("q"), lit(0L), (s, v) => s + v).as("q_sum"),
          round(mse, 12).as("mse"))
        .orderBy(col("vec_id"))
    }),

    // ANN over the QUANTIZED store: the int8 codes from
    // embed_quantize_int8 reconstructed (q·scale — one IEEE multiply
    // per element, bit-deterministic) and scored with the codegen'd
    // double-cosine kernel. This is how a production vector store
    // actually serves: the 4×-smaller codes are what's resident, and
    // search runs on reconstructions. Same brute-force top-3 shape as
    // ann_cosine_topk so the recall cost of quantization is directly
    // measurable (pinned >= 14/15 in PipelineSpec). DuckDB replicates
    // the whole pipeline — quantize, reconstruct, fold-ordered cosine —
    // so the compare is exact, no tolerance.
    "ann_quantized_topk" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      // reconstruction over the SHARED quantize pipeline (quantized8)
      val rec = quantized8(spark.table("embeddings"))
        .select(col("vec_id"),
          transform(col("q"), x => x.cast("double") * col("sc_raw")).as("rd"))
      val qs = rec.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("rd").as("qrd"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      rec.select(col("vec_id").as("nid"), col("rd"))
        .join(broadcast(qs))
        .where(col("qid") =!= col("nid"))
        .withColumn("cos", round(GraftFunctions.cosine_sim_d(col("qrd"), col("rd")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("qid"), col("nid"), col("cos"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    }),

    // Hybrid search: reciprocal-rank fusion (Cormack et al., SIGIR'09;
    // k=60) of the dense ranking (cosine top-10 for the vec_id=0 query
    // embedding) and the lexical ranking (the text_bm25_topk scorer) —
    // the retrieval shape RAG pipelines actually deploy. A doc missing
    // from one ranking contributes 0 from that side; at sf0.1 the
    // corpus has MORE docs than embeddings, so partial dense coverage
    // is exercised for real. Scale shape: each ranking is top-k'd via
    // ORDER BY/LIMIT (TakeOrderedAndProject) BEFORE the rank window, so
    // the unpartitioned ROW_NUMBER only ever sees k=10 rows; the fusion
    // join is 10×10. Determinism: ranks are ints, 1/(60+rank) is one
    // correctly-rounded IEEE division, and the two-term sum adds in
    // fixed order — bit-exact, no tolerance.
    "search_hybrid_rrf" -> gsql(s"""
      WITH ${TextAnalysis.bm25Ctes(spark = true)},
      lex10 AS (
        SELECT doc_id, ROUND(${TextAnalysis.bm25Sum()}, 6) AS score
        FROM d CROSS JOIN st
        ORDER BY score DESC, doc_id
        LIMIT 10
      ), lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rn
        FROM lex10
      ), dense10 AS (
        SELECT e.vec_id AS doc_id,
               ROUND(COSINE_SIM(q.embedding, e.embedding), 6) AS cos
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY cos DESC, doc_id
        LIMIT 10
      ), dense AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS dense_rn
        FROM dense10
      )
      SELECT doc_id, dense_rn, lex_rn,
             COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense_rn), CAST(0.0 AS DOUBLE))
               + COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rn), CAST(0.0 AS DOUBLE)) AS rrf
      FROM dense FULL OUTER JOIN lex USING (doc_id)
      ORDER BY rrf DESC, doc_id"""),

    // Exact cosine top-3 for 5 query vectors against the whole corpus.
    "ann_cosine_topk" -> gsql("""
      WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS qid, e.vec_id AS nid,
               ROUND(COSINE_SIM(q.embedding, e.embedding), 6) AS cos
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
      ), ranked AS (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        FROM scored
      )
      SELECT qid, nid, cos, rn FROM ranked
      WHERE rn <= 3
      ORDER BY qid, rn"""),

    // IVF-style ANN: a deterministic coarse quantizer (the 32
    // lowest-vec_id vectors as pivots, broadcast), every vector assigned
    // to its nearest pivot cell, queries probe their nprobe=4 nearest
    // cells and exact-rerank within them. At 100 TB the assignment is a
    // broadcast-join map stage and the search shuffles only (cell, vec)
    // — the inverted-file structure, relationally.
    "ann_ivf_probe" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val emb = spark.table("embeddings")
      val pivots = emb.where(col("vec_id") < 32)
        .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
      // nearest pivot per vector = IVF cell
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("pcos").desc, col("pid"))
      val cells = emb.join(broadcast(pivots))
        .withColumn("pcos", GraftFunctions.cosine_sim(col("embedding"), col("pemb")))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("pid").as("cell"))
      // queries probe their 4 nearest cells
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy(col("pcos").desc, col("pid"))
      val probes = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        .join(broadcast(pivots))
        .withColumn("pcos", GraftFunctions.cosine_sim(col("qemb"), col("pemb")))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 4)
        .select(col("qid"), col("qemb"), col("pid").as("cell"))
      // search within probed cells, exact rerank
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      probes.join(cells, "cell")
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"),
          round(GraftFunctions.cosine_sim(col("qemb"), col("embedding")), 6).as("cos"))
        .distinct()
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") <= 3)
        .select(col("qid"), col("nid"), col("cos"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    }),

    // LSH-bucketed ANN: 50 query vectors, candidates from 16 hash tables
    // of pe-plane buckets, exact cosine re-rank within candidates.
    // 100 TB discipline: candidate generation (bucket equi-join +
    // DISTINCT) shuffles ONLY (tbl, bucket, qid, nid) ints — the wide
    // 64-float embeddings re-join AFTER the pair set is deduped, query
    // side broadcast. (Round-1 carried both vectors through the DISTINCT
    // shuffle — the per-round plan audit flagged it as a scale-killer.)
    "ann_lsh_bucketed" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val emb = spark.table("embeddings")
      // PLANES ARE ADAPTIVE — lshGeometry's pe = min p in [6,18] with
      // n ≤ 64·2^p, shared with dedup_embedding_lsh and the persisted
      // index. The oracle replicates it by masking an 18-plane bucket
      // to the low pe bits — valid because bucket bit p is plane p and
      // signs are seeded per (table, plane, dim) independent of the
      // plane count, so pe planes equal the first pe of any larger
      // family and pe=6 SFs (the driver fixtures) stay byte-stable vs
      // the old fixed-6 geometry.
      val (tables, planes) = lshGeometry(spark, emb)
      val bucketed = emb
        .withColumn("bs", GraftFunctions.lsh_buckets(col("embedding"), tables, planes))
        .select(col("vec_id"), posexplode(col("bs")).as(Seq("tbl", "bucket")))
      val candIds = bucketed.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
        .join(bucketed.withColumnRenamed("vec_id", "nid"), Seq("tbl", "bucket"))
        .where(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"))
        .distinct()
      val qemb = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      candIds
        .join(emb.select(col("vec_id").as("nid"), col("embedding")), "nid")
        .join(broadcast(qemb), "qid")
        .withColumn("cos", round(GraftFunctions.cosine_sim(col("qemb"), col("embedding")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("qid"), col("nid"), col("cos"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    }),

    // ANN serving path over the PERSISTED LSH index (build/probe
    // split — see lshIndexFixture): the same 50-query batch and the
    // same top-3 answer as ann_lsh_bucketed, but candidate generation
    // never recomputes corpus bucketing — probe keys (|batch|·tables
    // of them, bounded by the batch) are hashed on the driver to
    // exactly their bucket files, the key filter row-group-prunes
    // inside those files, and candidates arrive WITH their embeddings
    // (the index carries them), so the base table is touched only for
    // the 50 query vectors. Equality with the batch form is the
    // oracle; the file-pruning and within-file-sort contracts are
    // AnnIndexSpec's plan gates.
    "ann_lsh_probe_indexed" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      val (dir, tables, planes) = lshIndexFixture(spark, sfDir)
      probeIndexTopK(spark, dir, tables, planes)
    }),

    // The same serving answer from a MAINTAINED index: 3/4 of the
    // corpus built as generation 0, the remaining 1/4 APPENDED as
    // generation 1 (one delta-sized shuffle, base files untouched —
    // see lshIndexIncrFixture). Because the delta routes with the same
    // hash/sort/geometry, base⊕delta IS the full-corpus index, so the
    // top-3 must equal the batch form byte-for-byte — the oracle is
    // the identical replication. Pins that the serving path stays
    // correct BETWEEN re-bucketing epochs, the property a 100 TB
    // vector store actually relies on day to day.
    "ann_lsh_probe_incremental" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      val (dir, tables, planes) = lshIndexIncrFixture(spark, sfDir)
      probeIndexTopK(spark, dir, tables, planes)
    }),

    // The same serving answer across a RE-BUCKETING EPOCH: the index
    // is built at pe−1 (the geometry before the corpus crossed the
    // adaptive threshold), migrated to pe as 64 per-file local splits
    // — zero shuffle, one plane dot per row (lsh_plane_bit), files
    // never change identity thanks to the pe-invariant routing — and
    // then served. Migrated content equals a direct pe build
    // row-for-row, so the top-3 must byte-match the batch form; the
    // oracle is the identical replication. Completes the index
    // lifecycle: build (indexed) → maintain (incremental) → re-epoch
    // (this).
    "ann_lsh_probe_migrated" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      val (dir, tables, planes) = lshIndexMigratedFixture(spark, sfDir)
      probeIndexTopK(spark, dir, tables, planes)
    }),

    // The serving answer from a TOMBSTONED index (delete maintenance —
    // right-to-be-forgotten, re-embeddings): a delete batch lands as
    // per-bucket tombstone files (Hive ACID delete-delta analog), the
    // probe path anti-joins the HIT buckets' tombstones (pruned like
    // the data, probe-bounded broadcast), and the answer must equal an
    // index that never contained the deleted vectors — the oracle is
    // the batch replication with the delete set excluded from
    // candidacy. Physical reclamation is deferred to
    // HiveBucketedIO.foldTombstones (threshold-gated major compaction,
    // per-file local, zero shuffle), after which the same query serves
    // the same bytes with no anti-join — CompactorSpec pins that.
    "ann_lsh_probe_deleted" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      GraftFunctions.register(spark)
      val (dir, tables, planes) = lshIndexDeletedFixture(spark, sfDir)
      probeIndexTopK(spark, dir, tables, planes)
    }),

    // The PQ-ADC serving path (build/probe split — see pqIndexFixture):
    // the probe never re-trains the codebook or re-encodes the corpus.
    // It reads the 640-row persisted codebook (broadcast), builds the
    // query's 40-entry ADC table from the ONE query vector (the only
    // raw-embedding touch, key-pruned at the scan), then scans the
    // persisted CODES (3 small ints per row — never the 64-float
    // vectors) with the ADC lookup broadcast. At fixed codebook size
    // the per-batch cost is the code scan — a ~40x byte shrink vs raw
    // vectors, recomputation-free, which is the PQ serving deal.
    // Byte-identical to the batch form (persisted codes ARE the batch
    // chain's codes); oracle = the exhaustive ADC replication.
    "ann_pq_adc_indexed" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val dir = pqIndexFixture(spark, sfDir)
      val qd = pqQueryAdc(spark, dir)
      val codes = graft.sources.HiveBucketedIO.readAll(
        spark, s"$dir/codes", PqCodeBuckets)
      pqAdcTopK(codes, qd)
    }),

    // The cell-PRUNED IVF-PQ probe (Jégou PAMI'11 §IV — the production
    // serving shape the cell-keyed code layout exists for): score the
    // coarse cells with the query's own ADC table (cell distance =
    // Σ_s qdist(s, cell) — zero extra reads beyond the broadcast
    // codebook), probe only the nprobe nearest cells' bucket FILES
    // (driver-side hash, the bucket-lookup discipline), ADC-scan just
    // those cells' codes. The deliberate approximation is the
    // candidacy restriction; the oracle replicates it exactly (same
    // cells, same probe set, same tie order), so the compare stays
    // byte-exact. Deployment sizing: cells grow ~√n and nprobe with
    // the recall target — here cells are the codebook's 10 rows (fixed
    // by the shared train chain), so the probe scans ≤ 3/10 of the
    // corpus codes and opens ≤ 3 of the 16 code files at any n.
    "ann_pq_ivf_probe" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      val dir = pqIndexFixture(spark, sfDir)
      val qd = pqQueryAdc(spark, dir)
      // ≤ codebook-cells rows of driver state (10 here): the cell
      // scores come off the broadcast-sized ADC table, never the corpus
      val probeCells = qd.groupBy(col("cw"))
        .agg(sum(col("qdist")).cast("long").as("cdist"))
        .orderBy(col("cdist"), col("cw")).limit(PqNProbe)
        .collect().map(_.getInt(0)).toSeq
      val hit = probeCells
        .map(c => graft.sources.HiveBucketedIO.bucketIdOf(PqCodeBuckets, c.toLong))
        .distinct.sorted
      val codes = spark.read.parquet(hit.flatMap(n =>
          graft.sources.HiveBucketedIO.bucketGenFiles(spark, s"$dir/codes", n)): _*)
        .where(col("cell").isin(probeCells: _*))
      pqAdcTopK(codes, qd)
    }),

    // Per-dimension winsorization audit — the outlier-clipping feature
    // prep run before quantization or whitening: exact p05/p95 per
    // coordinate, how many values each side clips, and the post-clip
    // mean. 100 TB shape: the explode is narrow map work, then two
    // hash aggregates on the 64 dim keys (percentile state is per-dim,
    // bounded); the percentile table re-joins on the same key.
    // Determinism: thresholds are ROUNDed before use so both engines
    // clip on the identical boundary, and the post-clip mean goes
    // through floor-quantized integer-valued sums (the Clustering
    // discipline) so reduction order cannot leak.
    // Record linkage by TRUE Damerau-Levenshtein (adjacent-char-swap
    // corruption — the typo class DL prices at 1 edit where plain
    // Levenshtein needs 2): blocked candidates scored by the codegen'd
    // kernel, best match per dirty record by (dist, pid). Integer
    // distances -> exact oracle against DuckDB's same-recurrence
    // builtin. self_hit separates true recoveries from exact-name
    // doppelgangers (TPC-H part names repeat), deterministically.
    "link_fuzzy_match" -> gsql(linkFuzzySql),

    // Record linkage by Jaro-Winkler (dropped-char corruption): same
    // blocked shape with the length bucket shifted by one; ranking runs
    // on the ROUNDED score so tie-breaks are engine-independent even in
    // principle (the kernels are bit-identical anyway).
    "link_jaro_winkler" -> gsql(linkJaroSql("jaro_winkler")),

    "embed_winsorize" -> ((spark, sfDir) => {
      Tables.register(spark, sfDir)
      spark.sql("""
        WITH x AS (
          SELECT vec_id, CAST(pos + 1 AS INT) AS dim, CAST(v AS DOUBLE) AS x
          FROM embeddings LATERAL VIEW POSEXPLODE(embedding) pe AS pos, v
        ), p AS (
          SELECT dim, ROUND(PERCENTILE(x, 0.05), 6) AS p05,
                 ROUND(PERCENTILE(x, 0.95), 6) AS p95
          FROM x GROUP BY dim
        )
        SELECT x.dim AS dim, p.p05 AS p05, p.p95 AS p95,
               COUNT(CASE WHEN x.x < p.p05 THEN 1 END) AS n_lo,
               COUNT(CASE WHEN x.x > p.p95 THEN 1 END) AS n_hi,
               ROUND(CAST(SUM(FLOOR(GREATEST(p.p05, LEAST(p.p95, x.x)) * 1000000)) AS DOUBLE)
                     / (COUNT(*) * 1000000.0), 6) AS mean_clip
        FROM x JOIN p ON x.dim = p.dim
        GROUP BY x.dim, p.p05, p.p95
        ORDER BY dim""")
    })
  )

  import DuckHash.mulmod

  /** CTE chain replicating `LshBuckets(embedding, tables, planes)` over
    * the embeddings table, ending in `buckets(vec_id, t, bucket)` (plus
    * `e(vec_id, emb)` for reuse): the ±1 plane signs come from the same
    * seeded fmix64 stream (HUGEINT mod-2^64 arithmetic), and the dot
    * products accumulate in the same dimension order via list_reduce —
    * IEEE doubles: same order ⇒ bit-identical sums ⇒ identical sign bits
    * ⇒ identical buckets. Shared by every LSH-replication oracle.
    * Validated bit-for-bit against the Spark buckets at sf0.01. */
  private[operators] def lshBucketCtes(tables: Int, planes: Int): String = s"""
      sgn0 AS (
        SELECT t, p, d,
               xor((CAST(t AS UBIGINT) << 32) | (CAST(p AS UBIGINT) << 8),
                   ${mulmod("CAST(d AS UBIGINT)", "11400714819323198485")}) AS x0
        FROM range($tables) r1(t), range($planes) r2(p), range(64) r3(d)
      ), ${DuckHash.fmix64Ctes(from = "sgn0", carry = "t, p, d", in = "x0",
                               prefix = "fm", out = "fmo", outCol = "hv")},
      sgn AS (SELECT t, p, d,
              CASE WHEN (hv & 1) = 1 THEN 1.0 ELSE -1.0 END AS sign
              FROM fmo
      ), sgl AS (SELECT t, p, LIST(sign ORDER BY d) AS sg FROM sgn GROUP BY t, p
      ), e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ), dots AS (
        SELECT e.vec_id, s.t, s.p,
               list_reduce(list_prepend(0.0,
                 list_transform(range(1, 65), i -> s.sg[i] * e.emb[i])), (x, y) -> x + y) AS dot
        FROM e CROSS JOIN sgl s
      ), buckets AS (
        SELECT vec_id, t, CAST(SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
        FROM dots GROUP BY vec_id, t
      )"""

  /** The LSH top-3 replication shared by the batch query and the
    * indexed serving paths (which must return the identical answer).
    * `neighborPred` restricts the NEIGHBOR side only — the deleted-
    * index oracle excludes tombstoned vectors from candidacy while the
    * geometry (adaptive pe over the FULL corpus count) stays the
    * build-time geometry the index meta recorded, exactly the serving
    * semantics: logical deletes remove answers, not bucketing. */
  private def annLshTopkOracleSql(neighborPred: String): String = s"""
      WITH ${lshBucketCtes(16, 18)}, pe AS (
        SELECT COALESCE(MIN(p), 18) AS p
        FROM range(6, 19) r(p)
        WHERE (SELECT COUNT(*) FROM e) <= 64 * (CAST(1 AS BIGINT) << p)
      ), bkt AS (
        SELECT vec_id, t,
               bucket & ((1 << (SELECT p FROM pe)) - 1) AS bucket
        FROM buckets
      ), cand AS (
        SELECT DISTINCT q.vec_id AS qid, n.vec_id AS nid
        FROM bkt q JOIN bkt n ON q.t = n.t AND q.bucket = n.bucket
        WHERE q.vec_id < 50 AND q.vec_id <> n.vec_id$neighborPred
      ), scored AS (
        SELECT c.qid, c.nid,
               ROUND(LIST_COSINE_SIMILARITY(eq.emb, en.emb), 6) AS cos
        FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e en ON en.vec_id = c.nid
      )
      SELECT qid, nid, cos, rn FROM (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        FROM scored)
      WHERE rn <= 3 ORDER BY qid, rn"""

  private val AnnLshTopkOracleSql = annLshTopkOracleSql("")

  /** The delete set of the tombstoned-index fixture/oracle: every 10th
    * vector outside the query batch (queries stay live — the serving
    * semantics under test are "deleted vectors never come back as
    * NEIGHBORS"). */
  private val DeletedPredSql =
    " AND NOT (n.vec_id >= 50 AND n.vec_id % 10 = 3)"
  private def deletedVecs: Column =
    col("vec_id") >= 50 && col("vec_id") % 10 === 3

  val oracle: Map[String, String] = Map(
    "link_blocking_metrics" -> blockingMetricsSql(spark = false),
    "embed_hard_negatives" -> hardNegSql(spark = false),
    "embed_quantile_norm" -> quantileNormSql(spark = false),
    "eval_retrieval" -> evalRetrievalSql(spark = false),
    "ann_pq_adc" -> pqAdcSql(spark = false),
    "embed_pca_power" -> pcaSql(spark = false),
    // same statement, DuckDB spellings: list_transform quantize + the
    // Clustering.cosSql fold replication of CosineSimD — the greedy
    // pick sequence is bit-deterministic on both sides
    "ann_mmr_rerank" -> s"""
      WITH pool AS (${mmrPoolSql(spark = false)}),
      ${mmrStepsSql(spark = false, poolSrc = "pool")}""",
    // same per-element ops (max, divide, floor-half-up, clamp) and the
    // same index-order MSE fold — bit-identical, no tolerance
    "embed_random_projection" -> randProjSql(spark = false),

    "embed_quantize_int8" -> s"""
      WITH $QuantBaseCtes,
      qv AS (SELECT vec_id, ed, scale,
              list_transform(ed, x -> ${qElemSql("x")}) AS q
             FROM s)
      SELECT vec_id, ROUND(scale, 9) AS scale,
             CAST(list_sum(q) AS BIGINT) AS q_sum,
             ROUND(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
               i -> (ed[i] - q[i] * scale) * (ed[i] - q[i] * scale))),
               (x, y) -> x + y) / 64.0, 12) AS mse
      FROM qv ORDER BY vec_id""",

    // FULL INDEPENDENT REPLICATION of the LSH pipeline, not a recall
    // assumption — see lshBucketCtes; the rerank mirrors the Spark
    // query. Planes replicate the ADAPTIVE pe (same integer minimum
    // as the Spark side; the 18-plane bucket masked to its low pe
    // bits IS the pe-plane bucket — see dedup_embedding_lsh).
    "ann_lsh_bucketed" -> AnnLshTopkOracleSql,

    // the serving paths must return EXACTLY the batch form's top-k —
    // same candidate set by construction (the index stores the same
    // (tbl, bucket) memberships it would recompute; base⊕appended
    // delta is the full bucketing), same rerank — so the oracle is
    // the identical replication for both
    "ann_lsh_probe_indexed" -> AnnLshTopkOracleSql,
    "ann_lsh_probe_incremental" -> AnnLshTopkOracleSql,
    "ann_lsh_probe_migrated" -> AnnLshTopkOracleSql,
    // deleted vectors excluded from candidacy; geometry stays the
    // build-time (full-corpus) adaptive pe the meta recorded
    "ann_lsh_probe_deleted" -> annLshTopkOracleSql(DeletedPredSql),
    // the persisted codes are the batch chain's codes, so the serving
    // answer replicates against the same exhaustive ADC oracle
    "ann_pq_adc_indexed" -> pqAdcSql(spark = false),
    // cell-pruned probe: the oracle replicates the candidacy
    // restriction itself (shared cell CTEs + the same nprobe cut)
    "ann_pq_ivf_probe" -> pqIvfProbeSql,

    // independent IVF replication: same deterministic coarse quantizer
    // (pivots = vec_id < 32, nearest-pivot assignment with pid
    // tie-break), nprobe=4 probing, exact rerank. Assignment orders by
    // full-precision cosine on both sides — validated identical at
    // sf0.01 (no near-tie cells in the testdata).
    "ann_ivf_probe" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      piv AS (SELECT vec_id AS pid, emb AS pemb FROM e WHERE vec_id < 32),
      cells AS (
        SELECT vec_id, emb, pid AS cell FROM (
          SELECT e.vec_id, e.emb, p.pid,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY LIST_COSINE_SIMILARITY(e.emb, p.pemb) DESC, p.pid) AS rn
          FROM e CROSS JOIN piv p) WHERE rn = 1
      ), probes AS (
        SELECT qid, qemb, pid AS cell FROM (
          SELECT e.vec_id AS qid, e.emb AS qemb, p.pid,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY LIST_COSINE_SIMILARITY(e.emb, p.pemb) DESC, p.pid) AS rn
          FROM e CROSS JOIN piv p WHERE e.vec_id < 50) WHERE rn <= 4
      ), scored AS (
        SELECT DISTINCT pr.qid, c.vec_id AS nid,
               ROUND(LIST_COSINE_SIMILARITY(pr.qemb, c.emb), 6) AS cos
        FROM probes pr JOIN cells c USING (cell)
        WHERE pr.qid <> c.vec_id
      )
      SELECT qid, nid, cos, rn FROM (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        FROM scored)
      WHERE rn <= 3 ORDER BY qid, rn""",

    // quantize + reconstruct exactly as embed_quantize_int8's oracle,
    // then the Clustering.cosSql fold replication of CosineSimD —
    // identical IEEE op order end to end, bit-exact compare
    "ann_quantized_topk" -> s"""
      WITH $QuantBaseCtes,
      r AS (SELECT vec_id,
              list_transform(ed, x -> ${qElemSql("x")} * scale) AS rd
            FROM s),
      scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               ROUND(${Clustering.cosSql("a.rd", "b.rd")}, 6) AS cos
        FROM r a JOIN r b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
      )
      SELECT qid, nid, cos, rn FROM (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        FROM scored)
      WHERE rn <= 3 ORDER BY qid, rn""",

    // identical post-retrieval SQL to the Spark side (dialect split on
    // tokenize/cosine/explode spellings only)
    "pipeline_rag" -> ragSql(spark = false),

    // identical post-tokenization SQL to the Spark side; the dense leg
    // reuses ann_cosine_topk's validated LIST_COSINE_SIMILARITY compare
    "search_hybrid_rrf" -> s"""
      WITH ${TextAnalysis.bm25Ctes(spark = false)},
      lex10 AS (
        SELECT doc_id, ROUND(${TextAnalysis.bm25Sum()}, 6) AS score
        FROM d CROSS JOIN st
        ORDER BY score DESC, doc_id
        LIMIT 10
      ), lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rn
        FROM lex10
      ), dense10 AS (
        SELECT e.vec_id AS doc_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])), 6) AS cos
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY cos DESC, doc_id
        LIMIT 10
      ), dense AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS dense_rn
        FROM dense10
      )
      SELECT doc_id, dense_rn, lex_rn,
             COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense_rn), CAST(0.0 AS DOUBLE))
               + COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rn), CAST(0.0 AS DOUBLE)) AS rrf
      FROM dense FULL OUTER JOIN lex USING (doc_id)
      ORDER BY rrf DESC, doc_id""",

    // dialect-shared statements; DuckDB's builtins implement the same
    // true-DL recurrence / floored-transposition JW (validated pairwise)
    "link_fuzzy_match" -> linkFuzzySql,
    "link_jaro_winkler" -> linkJaroSql("jaro_winkler_similarity"),

    "ann_cosine_topk" -> """
      WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS qid, e.vec_id AS nid,
               ROUND(LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
      ), ranked AS (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        FROM scored
      )
      SELECT qid, nid, cos, rn FROM ranked
      WHERE rn <= 3
      ORDER BY qid, rn""",

    // same statement with DuckDB spellings: 1-based UNNEST(RANGE)
    // explode and QUANTILE_CONT for the exact percentile (linear
    // interpolation in both engines, agg_percentile precedent)
    "embed_winsorize" -> """
      WITH x AS (
        SELECT vec_id, CAST(r.i AS INT) AS dim, CAST(embedding[r.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(RANGE(1, 65)) AS r(i)
      ), p AS (
        SELECT dim, ROUND(QUANTILE_CONT(x, 0.05), 6) AS p05,
               ROUND(QUANTILE_CONT(x, 0.95), 6) AS p95
        FROM x GROUP BY dim
      )
      SELECT x.dim AS dim, p.p05 AS p05, p.p95 AS p95,
             COUNT(CASE WHEN x.x < p.p05 THEN 1 END) AS n_lo,
             COUNT(CASE WHEN x.x > p.p95 THEN 1 END) AS n_hi,
             ROUND(CAST(SUM(FLOOR(GREATEST(p.p05, LEAST(p.p95, x.x)) * 1000000)) AS DOUBLE)
                   / (COUNT(*) * 1000000.0), 6) AS mean_clip
      FROM x JOIN p ON x.dim = p.dim
      GROUP BY x.dim, p.p05, p.p95
      ORDER BY dim"""
  )
}
