package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over a co-occurrence graph — the link-analysis
  * counterpart of the Dedup module's connected components (Hive users
  * run exactly these via multi-join SQL; re-expressed so Catalyst plans
  * the joins; SURVEY.md §2.1#6 n-way joins exercised as graph ops).
  *
  * The graph: parts are nodes, an undirected edge links two parts that
  * co-occur in >= 2 orders (the support floor keeps the edge list
  * sparse — the raw co-occurrence graph on a dense catalog approaches
  * a clique and no triangle algorithm survives that at any scale).
  * Edges are stored once in (src < dst) orientation.
  *
  * The Spark side builds the edge list ONCE and persists it — a
  * SQL-CTE spelling re-runs the (incidence self-join + aggregate)
  * edge build at every reference because Catalyst inlines CTEs
  * (triangles reference e three times; three unrolled PageRank
  * iterations reference it transitively ~7×). The DuckDB oracle keeps
  * the pure-CTE spelling (DuckDB materializes CTEs) — same values.
  *
  * 100 TB design:
  *  - Edge build: one DISTINCT + one self-equi-join on the order key +
  *    a hash aggregate — all standard shuffles on (order, part) keys;
  *    materialized once per analysis session, exactly like a
  *    production pipeline would checkpoint it.
  *  - Triangles: the (src < dst) orientation makes each triangle count
  *    exactly once via two hash joins (e1.dst=e2.src, then closing
  *    edge lookup); the classic degree-ordered orientation (direct
  *    low-degree → high-degree) bounds the wedge intermediate by
  *    O(m^1.5) on skewed graphs — the key-ordered orientation used
  *    here is the same plan shape and the support floor keeps wedge
  *    counts bounded.
  *  - PageRank: three unrolled iterations; each is one edge⋈rank join
  *    + a hash aggregate on dst — the contribution shuffle is
  *    (node, integer) pairs only. Ranks live in integer-valued-double
  *    quantized units (1e-6) so every SUM is exact and
  *    order-independent (the Clustering.scala discipline) and the
  *    DuckDB oracle replicates the iteration bit-for-bit.
  */
object Graph {

  private type Q = (SparkSession, String) => DataFrame

  /** The support-filtered co-occurrence edge list in (src < dst)
    * orientation. Callers persist it for the duration of their query
    * (the harness clears the cache afterwards). */
  // The co-purchase edge list is the SHARED input of the whole graph
  // family (12 queries build the identical relation) — in production it
  // is a materialized table the analytics suite reads, not a per-query
  // derivation, so it is built and persisted ONCE per (session, sfDir).
  // Oracles keep the inline derivation (DuckDB's one-statement
  // protocol), so correctness still checks the full pipeline per query.
  private val edgesMemo =
    new scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()

  private def weightedEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val df = edgesMemo.getOrElseUpdate((System.identityHashCode(spark), sfDir), {
      Tables.register(spark, sfDir)
      val io = spark.table("lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val a = io.select(col("o"), col("p").as("src"))
      val b = io.select(col("o"), col("p").as("dst"))
      a.join(b, Seq("o")).where(col("src") < col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("src"), col("dst"),
          floor(lit(1000000.0) / col("w")).cast("bigint").as("cost"))
        .persist()
    })
    // deliberately NO re-persist here: an external cache clear (Bench
    // between timed passes) unpersists the shared DF, and re-marking it
    // made single-use queries pay a cache write per pass for reuse they
    // never get (kcore +1.9 s). Queries that loop over the edges
    // re-mark persist at their call site (MST); sequential multi-query
    // sessions (Verify: 285 queries, no clears) share the first build.
    df
  }

  private def edges(spark: SparkSession, sfDir: String): DataFrame =
    weightedEdges(spark, sfDir).select(col("src"), col("dst"))

  // ---- shared DuckDB-oracle CTE text ----

  // ORACLE-ONLY (DuckDB) — AS MATERIALIZED: the co-purchase self-join is
  // referenced 2-3x by most graph oracles and DuckDB's CTE inlining
  // re-evaluates it per reference; at sf1 the kcore peel chain compounded
  // that into a 78 GB temp spill (r13 sweep). Values unchanged.
  private val EdgeCte = """
      WITH io AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS MATERIALIZED (
        SELECT a.p AS src, b.p AS dst
        FROM io a JOIN io b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
        HAVING COUNT(*) >= 2
      )"""

  // one quantized PageRank iteration: contribution = floor(q/deg) in
  // 1e-6 units (exact integer-valued double), damping 0.85 = 17/20
  // applied as floor(17*sum/20) — 17*sum stays < 2^53 so the double
  // arithmetic is exact; dangling-safe via LEFT JOIN (a node with no
  // in-edges keeps the 0.15 teleport mass)
  /** PPR twin of prIter: restart mass returns to the seed only. */
  private def pprIter(k: Int): String = s"""
      , ppr$k AS (
        SELECT d2.node AS node,
               CASE WHEN d2.node = sd.s THEN 150000.0 ELSE 0.0 END
                 + FLOOR(17.0 * COALESCE(c.sm, 0.0) / 20.0) AS q
        FROM deg d2 CROSS JOIN seed sd LEFT JOIN (
          SELECT s.dst AS node,
                 CAST(SUM(FLOOR(CAST(p.q AS DOUBLE) / CAST(d.degree AS DOUBLE))) AS DOUBLE) AS sm
          FROM sym s JOIN ppr${k - 1} p ON s.src = p.node JOIN deg d ON s.src = d.node
          GROUP BY s.dst) c ON d2.node = c.node)"""

  private def prIter(k: Int): String = s"""
      , pr$k AS (
        SELECT d2.node AS node, 150000.0 + FLOOR(17.0 * COALESCE(c.s, 0.0) / 20.0) AS q
        FROM deg d2 LEFT JOIN (
          SELECT s.dst AS node,
                 CAST(SUM(FLOOR(CAST(p.q AS DOUBLE) / CAST(d.degree AS DOUBLE))) AS DOUBLE) AS s
          FROM sym s JOIN pr${k - 1} p ON s.src = p.node JOIN deg d ON s.src = d.node
          GROUP BY s.dst) c ON d2.node = c.node)"""

  // Directed association rules (support / confidence / lift — the
  // market-basket complement of text_pmi_bigrams' symmetric score):
  // rule a→b over order baskets, support floor 3, top-20 by lift.
  // All counts integer-exact; confidence and lift are single IEEE
  // divisions ROUNDed before the rank; (lift DESC, a, b) is total.
  // Same co-occurrence shuffle shape as the edge build.
  //
  // The directed pair counts come from the UNDIRECTED aggregate
  // (a.p < b.p) mirrored through a UNION ALL — cab is symmetric, so
  // the pair set is identical to the old `a.p <> b.p` spelling, at
  // half the aggregate. Found at the r15 sf10 sweep: DuckDB 1.0 plans
  // the `<>` conjunct as a CROSS_PRODUCT over io×io (~3.6e15 pairs;
  // the compare ran 4+ h without finishing), while `<` hash-joins on
  // o; with the mirror + a MATERIALIZED pin on the aggregate (DuckDB
  // inlines a twice-referenced CTE twice — the r13 lesson) the oracle
  // runs in 8.9 s at sf10. Spark plans BOTH spellings as a shuffle
  // hash join, so only the oracle needs the MATERIALIZED keyword
  // (Spark's parser rejects it — hence the twin spelling).
  private def assocSql(spark: Boolean): String = {
    val mat = if (spark) "" else "MATERIALIZED "
    s"""
      WITH io AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      n AS (SELECT COUNT(DISTINCT o) AS nb FROM io),
      ic AS (SELECT p, COUNT(*) AS c FROM io GROUP BY p),
      pc0 AS $mat(SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cab
             FROM io a JOIN io b ON a.o = b.o AND a.p < b.p
             GROUP BY a.p, b.p HAVING COUNT(*) >= 3),
      pc AS (SELECT pa, pb, cab FROM pc0
             UNION ALL
             SELECT pb AS pa, pa AS pb, cab FROM pc0)
      SELECT pc.pa AS antecedent, pc.pb AS consequent, pc.cab AS support_cnt,
             ROUND(CAST(pc.cab AS DOUBLE) / CAST(ca.c AS DOUBLE), 6) AS confidence,
             ROUND(CAST(pc.cab AS DOUBLE) * CAST(nb AS DOUBLE)
                   / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
      FROM pc JOIN ic ca ON pc.pa = ca.p JOIN ic cb ON pc.pb = cb.p CROSS JOIN n
      ORDER BY lift DESC, antecedent, consequent
      LIMIT 20"""
  }

  // Item-item collaborative-filtering similarity (the normalized
  // counterpart of AssocSql's directed confidence/lift): cosine
  // cab/√(ca·cb) and Jaccard cab/(ca+cb−cab) per co-occurring pair,
  // top-20 by cosine. Counts are exact; each score is one IEEE
  // division ROUNDed before the (cosine DESC, a, b) total order, so
  // the LIMIT cut is deterministic. Same bounded basket self-join as
  // the edge build — never all-pairs over the catalog.
  private val ItemSimSql = """
      WITH io AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      ic AS (SELECT p, COUNT(*) AS c FROM io GROUP BY p),
      pc AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cab
             FROM io a JOIN io b ON a.o = b.o AND a.p < b.p
             GROUP BY a.p, b.p HAVING COUNT(*) >= 3)
      SELECT pc.pa AS item_a, pc.pb AS item_b, pc.cab AS n_both,
             ROUND(CAST(pc.cab AS DOUBLE)
                   / SQRT(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS cosine,
             ROUND(CAST(pc.cab AS DOUBLE)
                   / CAST(ca.c + cb.c - pc.cab AS DOUBLE), 6) AS jaccard
      FROM pc JOIN ic ca ON pc.pa = ca.p JOIN ic cb ON pc.pb = cb.p
      ORDER BY cosine DESC, item_a, item_b
      LIMIT 20"""

  // one Bellman-Ford relaxation: the frontier joins the symmetric
  // weighted edge list and the union with the previous distances
  // re-minimizes per (seed, node) — integer costs, so MIN is exact and
  // join order cannot matter
  private def ssspIter(k: Int, symSrc: String): String = s"""
      , d$k AS (
        SELECT seed, node, MIN(d) AS d FROM (
          SELECT seed, node, d FROM d${k - 1}
          UNION ALL
          SELECT p.seed, s.dst AS node, p.d + s.cost AS d
          FROM d${k - 1} p JOIN $symSrc s ON p.node = s.src) x
        GROUP BY seed, node
      )"""

  // Weighted single-source shortest path, bounded to 3 hops (unrolled
  // Bellman-Ford — the khop BFS upgraded with edge costs): tie strength
  // inverts to an integer cost floor(1e6/w) so "well-co-purchased" is
  // "near", and every relaxation is a (seed, node, d) id-triple shuffle
  // + exact integer MIN — the plan a 1000-executor cluster runs
  // per-iteration regardless of graph size. 10 nearest per seed by
  // (d, node), fully deterministic; identical text runs in DuckDB.
  // The projection emits ONLY exact integers (dist_q is the micro-cost
  // distance itself): a d/1e6 double display column survived local
  // DuckDB 1.0.0 bit-exactly yet failed the driver build's hash two
  // rounds running (r06+r07) — float display columns are not
  // engine-version-proof, so none are oracled here.
  private def ssspCtes(symSrc: String): String = s"""
      seeds AS (SELECT DISTINCT src AS seed FROM $symSrc ORDER BY seed LIMIT 3),
      d0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS d FROM seeds)""" +
    ssspIter(1, symSrc) + ssspIter(2, symSrc) + ssspIter(3, symSrc) + """
      SELECT seed, node, d AS dist_q, rn
      FROM (SELECT seed, node, d,
                   ROW_NUMBER() OVER (PARTITION BY seed ORDER BY d, node) AS rn
            FROM d3 WHERE node <> seed) r
      WHERE rn <= 10
      ORDER BY seed, rn"""

  // oracle spelling: the full inline pipeline (DuckDB materializes the
  // CTE chain once). The SPARK side reads a PERSISTED symmetric view
  // instead — Catalyst inlines CTEs, so with the edge build as a CTE
  // each of the 3 relaxations re-derived the lineitem self-join (the
  // reach_recursive lesson); against the cached view it is one edge
  // build plus the id-triple joins.
  private val SsspSql = """
      WITH io AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      ew AS (
        SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
        FROM io a JOIN io b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
      ),
      sym AS (
        SELECT src, dst, CAST(FLOOR(1000000.0 / w) AS BIGINT) AS cost FROM ew
        UNION ALL
        SELECT dst AS src, src AS dst, CAST(FLOOR(1000000.0 / w) AS BIGINT) AS cost FROM ew
      ),""" + ssspCtes("sym")

  // Native WITH RECURSIVE (SQL:1999 linear recursion) — a statement-
  // surface capability Hive 1.2 lacks entirely (SURVEY §2.3: no
  // recursive CTE token) and Spark gained in 4.x (UnionLoopExec).
  // Reachability with hop distance from 3 seed nodes: the recursion
  // enumerates walks (UNION ALL is the only recursion mode Spark
  // supports — probed, UNION-distinct fixpoint raises
  // UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so termination comes from
  // the `depth < 3` guard, and MIN(depth) outside the recursion
  // collapses walks to distances. Each recursion step is one
  // frontier⋈edges hash join on id pairs — the same per-iteration plan
  // the unrolled khop/sssp spellings hand-build, now driven by the
  // engine's own loop operator. The support floor keeps the walk count
  // bounded (measured: ≤258 walks at sf0.01, ≤20 at sf0.1 —
  // co-occurrence sparsifies as the catalog grows).
  //
  // The recursion text is shared verbatim; only the edge source
  // differs: Spark reads a PERSISTED temp view (UnionLoopExec re-plans
  // its step every iteration, and Catalyst inlines CTEs — with the
  // edge build as a CTE each of the 3 iterations re-ran the full
  // lineitem self-join, 24 s at sf0.1; against the cached view it's
  // the one edge build plus id-pair joins), while DuckDB keeps the
  // pure-CTE spelling it materializes anyway.
  private def reachRecursiveSql(symSrc: String) = s"""
      WITH RECURSIVE
      seeds AS (SELECT DISTINCT src AS seed FROM $symSrc ORDER BY seed LIMIT 3),
      walk(seed, node, depth) AS (
        SELECT seed, seed AS node, 0 AS depth FROM seeds
        UNION ALL
        SELECT w.seed, s.dst AS node, w.depth + 1 AS depth
        FROM walk w JOIN $symSrc s ON w.node = s.src
        WHERE w.depth < 3
      )
      SELECT seed, node, CAST(MIN(depth) AS INT) AS dist, COUNT(*) AS n_walks
      FROM walk WHERE node <> seed
      GROUP BY seed, node
      ORDER BY seed, node"""

  /** One ALS half-step (Zhou et al., AAIM'08 — the distributed
    * matrix-factorization recommender): with the rank-2 ITEM factors
    * held fixed (deterministic integer init from the brand index, the
    * broadcast dimension every real ALS iteration ships), each user's
    * factor vector solves its own ridge normal equations
    * (XᵀX + λI)u = Xᵀr in closed 2×2 form. Everything before the solve
    * is one per-user aggregate of FIVE integer sufficient statistics
    * (a11,a12,a22,b1,b2 — map-side combinable; this shape iterated,
    * alternating sides, IS distributed ALS); the solve itself is
    * scalar Cramer arithmetic per user row, emitted exactly in micro
    * units via the sign-aware split divide (det > 0: the ridge term
    * makes A positive definite). The brand-index window runs on the
    * 25-row distinct-brand dimension, not the ratings. */
  private def alsStepSql(spark: Boolean): String = {
    val mdiv = Statistics.microDiv(_: String, _: String, spark)
    s"""
      WITH r AS (
        SELECT o.o_custkey AS u, p.p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS rating
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY o.o_custkey, p.p_brand
      ),
      bi AS (
        SELECT brand,
               CAST(DENSE_RANK() OVER (ORDER BY brand) - 1 AS BIGINT) AS idx
        FROM (SELECT DISTINCT brand FROM r) d
      ),
      f AS (SELECT brand, 1 + idx % 7 AS f1, 1 + idx % 5 AS f2 FROM bi),
      s AS (
        -- the 25-row factor table must broadcast: its window-derived
        -- lineage defeats size estimation and planned a sort-merge
        -- join of the ratings. The hint is a comment to DuckDB.
        SELECT /*+ BROADCAST(f) */ r.u,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(f.f1 * f.f1) AS BIGINT) + 1 AS a11,
               CAST(SUM(f.f1 * f.f2) AS BIGINT) AS a12,
               CAST(SUM(f.f2 * f.f2) AS BIGINT) + 1 AS a22,
               CAST(SUM(r.rating * f.f1) AS BIGINT) AS b1,
               CAST(SUM(r.rating * f.f2) AS BIGINT) AS b2
        FROM r JOIN f ON r.brand = f.brand
        GROUP BY r.u
      ),
      k AS (
        SELECT u, n_items,
               a11 * a22 - a12 * a12 AS det,
               a22 * b1 - a12 * b2 AS n1,
               a11 * b2 - a12 * b1 AS n2
        FROM s
      )
      SELECT u AS custkey, n_items,
             ${mdiv("n1", "det")} AS u1_micro,
             ${mdiv("n2", "det")} AS u2_micro,
             -- predicted affinity for the idx=16 brand (f = (3, 2)):
             -- u·f stays inside ONE exact division of the Cramer
             -- numerators, never a product of two truncated quotients
             ${mdiv("n1 * 3 + n2 * 2", "det")} AS pred_b16_micro
      FROM k
      ORDER BY custkey
      LIMIT 20"""
  }

  // User-user collaborative filtering — the customer-side twin of
  // ItemSimSql over the (user, part) incidence. The scale lever is the
  // POPULARITY CAP: a part bought by u users contributes u² pairs to
  // the inverted-index self-join, so super-popular items are dropped
  // from the index before pairing (standard CF practice — they carry
  // no signal and their pair blowup is what kills the join at 100 TB).
  // Degrees are computed over the SAME capped incidence as the pair
  // index, so cosine/jaccard are the exact similarities of the capped
  // vectors — one consistent vector space (mixing capped intersections
  // with uncapped degrees would systematically deflate users who buy
  // popular items). Counts are integers, and each score is one ROUNDed
  // IEEE division chain before the (cosine DESC, a, b) total order.
  private val UserCfSql = """
      WITH ui AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
                  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      pcap AS (SELECT p FROM ui GROUP BY p HAVING COUNT(*) <= 50),
      ui2 AS (SELECT ui.u, ui.p FROM ui JOIN pcap ON ui.p = pcap.p),
      uc AS (SELECT u, COUNT(*) AS c FROM ui2 GROUP BY u),
      pairs AS (
        SELECT a.u AS ua, b.u AS ub, CAST(COUNT(*) AS BIGINT) AS cab
        FROM ui2 a JOIN ui2 b ON a.p = b.p AND a.u < b.u
        GROUP BY a.u, b.u HAVING COUNT(*) >= 3)
      SELECT ua AS user_a, ub AS user_b, cab AS n_shared,
             ROUND(CAST(cab AS DOUBLE)
                   / SQRT(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS cosine,
             ROUND(CAST(cab AS DOUBLE)
                   / CAST(ca.c + cb.c - cab AS DOUBLE), 6) AS jaccard
      FROM pairs JOIN uc ca ON ua = ca.u JOIN uc cb ON ub = cb.u
      ORDER BY cosine DESC, user_a, user_b
      LIMIT 20"""

  // one k-core peeling round (k=3): drop nodes whose current degree is
  // below 3, keep only edges between survivors, recount degrees. Each
  // round is two semi-joins on node ids + one hash aggregate — the
  // per-iteration plan a 1000-executor cluster runs at any graph size.
  private def kcoreIter(k: Int): String = s"""
      , keep$k AS MATERIALIZED (SELECT node FROM deg${k - 1} WHERE degree >= 3)
      , sym$k AS MATERIALIZED (SELECT s.src, s.dst FROM sym${k - 1} s
                  JOIN keep$k a ON s.src = a.node
                  JOIN keep$k b ON s.dst = b.node)
      , deg$k AS MATERIALIZED (SELECT src AS node, COUNT(*) AS degree FROM sym$k GROUP BY src)"""

  /** 3-core decomposition, 3 unrolled peeling rounds; emits the
    * (round, nodes, edges) shrinkage trajectory — all exact integers.
    * ORACLE-ONLY spelling: DuckDB materializes the CTE chain once, so
    * the 8 scalar subqueries are cheap there; on Spark the same text
    * re-derived the whole peel chain per subquery under CTE inlining
    * (~50 planned joins, 16.5 s at sf0.1), so the query side runs the
    * equivalent persisted-round driver loop instead. */
  private def kcoreSql(pre: String): String = pre + """
      , deg0 AS MATERIALIZED (SELECT src AS node, COUNT(*) AS degree FROM sym0 GROUP BY src)""" +
    kcoreIter(1) + kcoreIter(2) + kcoreIter(3) + """
      SELECT r.round,
             CASE r.round WHEN 0 THEN (SELECT COUNT(*) FROM deg0)
                          WHEN 1 THEN (SELECT COUNT(*) FROM deg1)
                          WHEN 2 THEN (SELECT COUNT(*) FROM deg2)
                          ELSE (SELECT COUNT(*) FROM deg3) END AS n_nodes,
             CASE r.round WHEN 0 THEN (SELECT COUNT(*) FROM sym0 WHERE src < dst)
                          WHEN 1 THEN (SELECT COUNT(*) FROM sym1 WHERE src < dst)
                          WHEN 2 THEN (SELECT COUNT(*) FROM sym2 WHERE src < dst)
                          ELSE (SELECT COUNT(*) FROM sym3 WHERE src < dst) END AS n_edges
      FROM (SELECT 0 AS round UNION ALL SELECT 1
            UNION ALL SELECT 2 UNION ALL SELECT 3) r
      ORDER BY r.round"""

  /** Per-node local clustering coefficient: each (src<dst)-oriented
    * triangle from the wedge join credits its three corners once, then
    * coeff = 2·tri / (deg·(deg−1)) over the SYMMETRIC degree. Counts
    * are exact; the coefficient is one ROUNDed division. `eSrc`/`symSrc`
    * name the edge relations (Spark: persisted views — the triangle
    * CTE references the edge list three times; DuckDB: the e/sym CTEs). */
  private def localClusteringSql(eSrc: String, symSrc: String): String = s"""
      , t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              FROM $eSrc e1 JOIN $eSrc e2 ON e1.dst = e2.src
              JOIN $eSrc e3 ON e3.src = e1.src AND e3.dst = e2.dst)
      , tv AS (SELECT a AS node FROM t
               UNION ALL SELECT b FROM t
               UNION ALL SELECT c FROM t)
      , tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM tv GROUP BY node)
      , degl AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
                 FROM $symSrc GROUP BY src)
      SELECT d.node, d.degree, COALESCE(tc.n_tri, 0) AS n_triangles,
             ROUND(2.0E0 * CAST(COALESCE(tc.n_tri, 0) AS DOUBLE)
                   / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) AS clustering_coeff
      FROM degl d LEFT JOIN tc ON tc.node = d.node
      WHERE d.degree >= 2
      ORDER BY n_triangles DESC, clustering_coeff DESC, d.node
      LIMIT 20"""

  /** Harmonic centrality bounded to 3 hops (the k-hop truncation every
    * production graph system uses — exact closeness needs all-pairs):
    * per node, Σ 1/d(u,v) over distinct nodes within 3 hops. Distances
    * come from three frontier joins with per-hop DISTINCT (id pairs
    * only — the khop plan); 1/d is encoded as exact SIXTHS
    * (6/1, 6/2, 6/3 → 6,3,2 via CASE — no division at all), so the
    * centrality sum is an exact integer and the float display twin is
    * one raw IEEE division (q6/6.0 is off-grid, no ROUND trap).
    * `symSrc` names the symmetric edge relation: Spark passes a
    * PERSISTED view (the three hops + dedup reference it five times;
    * CTE inlining would re-run the edge build each time). */
  private def harmonicSql(symSrc: String): String = s"""
      , h1 AS (SELECT DISTINCT src AS u, dst AS v FROM $symSrc)
      , h2 AS (SELECT DISTINCT a.u, s.dst AS v
               FROM h1 a JOIN $symSrc s ON s.src = a.v WHERE s.dst <> a.u)
      , h3 AS (SELECT DISTINCT b.u, s.dst AS v
               FROM h2 b JOIN $symSrc s ON s.src = b.v WHERE s.dst <> b.u)
      , dist AS (
          SELECT u, v, MIN(d) AS d FROM (
            SELECT u, v, 1 AS d FROM h1
            UNION ALL SELECT u, v, 2 AS d FROM h2
            UNION ALL SELECT u, v, 3 AS d FROM h3) x
          WHERE u <> v
          GROUP BY u, v)
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS n_reach_3hop,
             CAST(SUM(CASE d WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END) AS BIGINT) AS harm_q6,
             SUM(CASE d WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END) / 6.0E0 AS harmonic
      FROM dist GROUP BY u
      ORDER BY harm_q6 DESC, node
      LIMIT 20"""

  /** Degree assortativity (Newman 2002): Pearson correlation of
    * endpoint degrees over the directed-both-ways edge list — do hubs
    * link to hubs? One row. Degrees are exact counts, every moment sum
    * routes through DECIMAL, the coefficient is one ROUNDed IEEE chain
    * (generic quotient, off-grid). Two id-keyed joins + one aggregate
    * at any scale. */
  private def assortativitySql(symSrc: String): String = s"""
      , adeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k
                 FROM $symSrc GROUP BY src)
      , ep AS (SELECT da.k AS ka, db.k AS kb
               FROM $symSrc s JOIN adeg da ON s.src = da.node
               JOIN adeg db ON s.dst = db.node)
      , mo AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(ka AS DECIMAL(18, 0))) AS DOUBLE) AS sa,
                 CAST(SUM(CAST(kb AS DECIMAL(18, 0))) AS DOUBLE) AS sb,
                 CAST(SUM(CAST(ka * kb AS DECIMAL(38, 0))) AS DOUBLE) AS sab,
                 CAST(SUM(CAST(ka * ka AS DECIMAL(38, 0))) AS DOUBLE) AS saa,
                 CAST(SUM(CAST(kb * kb AS DECIMAL(38, 0))) AS DOUBLE) AS sbb
          FROM ep)
      SELECT CAST(n AS BIGINT) AS n_edge_ends,
             ROUND((n * sab - sa * sb)
                   / (SQRT(n * saa - sa * sa) * SQRT(n * sbb - sb * sb)), 6)
               AS assortativity
      FROM mo"""

  // one Borůvka round r over labels l{r-1}: every component (= current
  // label) picks its minimum outgoing edge by the (cost, src, dst)
  // total order — both directions of each edge are candidates, keyed by
  // the component they leave — then labels merge by THREE min-label
  // propagations over the selected edges (bounded pointer-jumping: the
  // bulk-synchronous merge step). BOUNDED-ROUND CAVEAT: a merge tree
  // deeper than 3 jumps leaves labels unconverged after round 1, so
  // round 2 can select an edge between two sub-components of the same
  // tree — allsel may then contain a cycle, and the round-3
  // COUNT(DISTINCT lbl) can overcount true components. The round-2
  // edge total and round-3 component count are therefore BOUNDED-ROUND
  // ARTIFACTS of this exact (2-round, 3-jump) schedule, not MSF
  // invariants; full Borůvka would iterate rounds (with jump-to-
  // convergence) until no inter-component edge remains. Deterministic
  // and engine-identical either way — both engines run the identical
  // bounded text, which is what the oracle compare certifies.
  private def boruvkaRound(r: Int, ewSrc: String): String = {
    val prev = s"l${r - 1}"
    def jump(from: String, to: String) = s"""
      , $to AS MATERIALIZED (
        SELECT node, MIN(lbl) AS lbl FROM (
          SELECT node, lbl FROM $from
          UNION ALL
          SELECT s.src AS node, f.lbl FROM sel$r s JOIN $from f ON f.node = s.dst
          UNION ALL
          SELECT s.dst AS node, f.lbl FROM sel$r s JOIN $from f ON f.node = s.src
        ) x GROUP BY node)"""
    s"""
      , cand$r AS MATERIALIZED (
        SELECT la.lbl AS comp, e.src, e.dst, e.cost
        FROM $ewSrc e JOIN $prev la ON e.src = la.node
                      JOIN $prev lb ON e.dst = lb.node
        WHERE la.lbl <> lb.lbl
        UNION ALL
        SELECT lb.lbl AS comp, e.src, e.dst, e.cost
        FROM $ewSrc e JOIN $prev la ON e.src = la.node
                      JOIN $prev lb ON e.dst = lb.node
        WHERE la.lbl <> lb.lbl
      ),
      sel$r AS MATERIALIZED (
        SELECT DISTINCT src, dst, cost FROM (
          SELECT comp, src, dst, cost,
                 ROW_NUMBER() OVER (PARTITION BY comp
                   ORDER BY cost, src, dst) AS rn
          FROM cand$r) p
        WHERE rn = 1
      )""" + jump(prev, s"j${r}a") + jump(s"j${r}a", s"j${r}b") +
      jump(s"j${r}b", s"l$r")
  }

  /** Minimum spanning forest by TWO bulk-synchronous Borůvka rounds
    * (Borůvka 1926; the standard distributed MST — each round is
    * per-component argmin edge selection + bounded label merging, all
    * id/cost equi-joins and aggregates). Costs are the sssp integer
    * weights (floor(1e6/w)), the per-component pick uses a total
    * order, so the selected forest is deterministic; two rounds merge
    * components of merge-diameter ≤ 3 each (the bounded-round variant —
    * remaining merges would take further identical rounds). Output:
    * per-round selected-edge count + exact total cost, and the final
    * component count under the round-2 labels (all bounded-round
    * artifacts of the fixed 2-round/3-jump schedule — see the caveat on
    * boruvkaRound). `ewSrc` is the weighted (src<dst) edge relation:
    * Spark passes a persisted view (each round references it twice). */
  private def mstSql(pre: String, ewSrc: String): String = pre + """
      , n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM (
          SELECT src FROM """ + ewSrc + """
          UNION ALL SELECT dst AS src FROM """ + ewSrc + """) u)
      , l0 AS MATERIALIZED (SELECT node, node AS lbl FROM n0)""" +
    boruvkaRound(1, ewSrc) + boruvkaRound(2, ewSrc) + """
      , allsel AS MATERIALIZED (
        SELECT DISTINCT src, dst, cost FROM (
          SELECT src, dst, cost FROM sel1
          UNION ALL SELECT src, dst, cost FROM sel2) u
      )
      SELECT r.round,
             CASE r.round WHEN 1 THEN (SELECT CAST(COUNT(*) AS BIGINT) FROM sel1)
                          WHEN 2 THEN (SELECT CAST(COUNT(*) AS BIGINT) FROM allsel)
                          ELSE (SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) FROM l2) END AS n,
             CASE r.round WHEN 1 THEN (SELECT CAST(SUM(cost) AS BIGINT) FROM sel1)
                          WHEN 2 THEN (SELECT CAST(SUM(cost) AS BIGINT) FROM allsel)
                          ELSE CAST(0 AS BIGINT) END AS total_cost_q
      FROM (SELECT 1 AS round UNION ALL SELECT 2 UNION ALL SELECT 3) r
      ORDER BY r.round"""

  val queries: Map[String, Q] = Map(
    // Driver loop with persisted rounds (the kcore lesson, only more
    // so: the single-statement spelling's scalar subqueries re-derive
    // TWO rounds of cand/sel/jump chains under CTE inlining and did
    // not finish at sf0.01). Semantics mirror mstSql step for step —
    // same (cost, src, dst) argmin, same three bounded min-label
    // jumps — and the oracle compare proves the equivalence.
    "graph_mst_boruvka" -> ((spark, sfDir) => Dedup.withReliableCheckpointDir(spark, "mst") {
      Tables.register(spark, sfDir)
      // the shared weighted co-purchase edge table. persist() is
      // RE-MARKED per call: the memo survives across queries but a
      // cache clear between bench passes silently unpersists the DF,
      // and the MST loop touches ew once per round — unpersisted that
      // is a full lineitem self-join per action (measured +2.3 s).
      val ew = weightedEdges(spark, sfDir).persist()
      // Reliable checkpoint() truncates the label lineage each jump:
      // every jump references the previous labels THREE times, so the
      // un-truncated logical plan grows 3^jumps copies per round (~729
      // subtrees by round 2's last jump — analyzed to driver OOM, the
      // same explosion that killed the single-statement spelling).
      // Reliable (warehouse-FS) checkpoints, not localCheckpoint: on a
      // cluster an executor loss mid-loop replays from the checkpoint
      // FILE, where executor-local blocks would kill the job with
      // unrecomputable truncated lineage — the same fault-tolerance
      // contract as Dedup.connectedComponents, via the shared
      // withReliableCheckpointDir wrapper (per-call dir, janitor-
      // deleted at JVM exit).
      var lbl = ew.select(col("src").as("node"))
        .union(ew.select(col("dst").as("node")))
        .distinct().withColumn("lbl", col("node")).checkpoint()
      val sels = scala.collection.mutable.ArrayBuffer[DataFrame]()
      for (_ <- 1 to 2) {
        val lab = ew
          .join(lbl.select(col("node").as("src"), col("lbl").as("la")), Seq("src"))
          .join(lbl.select(col("node").as("dst"), col("lbl").as("lb")), Seq("dst"))
          .where(col("la") =!= col("lb"))
        val cand = lab.select(col("la").as("comp"), col("src"), col("dst"), col("cost"))
          .union(lab.select(col("lb").as("comp"), col("src"), col("dst"), col("cost")))
        // per-component argmin via struct-min hash aggregate: struct
        // comparison is lexicographic on (cost, src, dst) — the same
        // total order as the oracle's rank window, without the sort
        val sel = cand
          .groupBy(col("comp"))
          .agg(min(struct(col("cost"), col("src"), col("dst"))).as("m"))
          .select(col("m.src").as("src"), col("m.dst").as("dst"),
            col("m.cost").as("cost")).distinct().persist()
        sels += sel
        var l = lbl
        for (_ <- 1 to 3) {
          l = l.select(col("node"), col("lbl"))
            .union(sel.join(l.select(col("node").as("dst"), col("lbl")), Seq("dst"))
              .select(col("src").as("node"), col("lbl")))
            .union(sel.join(l.select(col("node").as("src"), col("lbl")), Seq("src"))
              .select(col("dst").as("node"), col("lbl")))
            .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
            // checkpoint EVERY jump, not just every round: each jump
            // references its predecessor 3×, so an un-truncated round
            // tree holds 3^3 = 27 copies — and Spark's plan analysis
            // over that tree, not the data, was the entire 14-16 s
            // runtime (sf0.001 and sf0.1 cost the same). Per-jump
            // truncation keeps every analyzed tree a handful of nodes.
            .checkpoint()
        }
        lbl = l
      }
      val allsel = sels(0).union(sels(1)).distinct()
      // one fused job for all three summary rows (separate actions per
      // row paid a full job-scheduling round-trip each)
      def summarize(df: DataFrame, r: Int): DataFrame =
        df.agg(count(lit(1)).as("n"),
            coalesce(sum(col("cost")), lit(0L)).as("total_cost_q"))
          .select(lit(r).as("round"), col("n"), col("total_cost_q"))
      summarize(sels(0), 1)
        .union(summarize(allsel, 2))
        .union(lbl.agg(countDistinct(col("lbl")).as("n"))
          .select(lit(3).as("round"), col("n"), lit(0L).as("total_cost_q")))
        .orderBy(col("round"))
    }),
    "graph_harmonic_centrality" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir)
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist().createOrReplaceTempView("harm_sym")
      spark.sql("WITH z AS (SELECT 1)" + harmonicSql("harm_sym"))
    }),
    "graph_assortativity" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir)
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist().createOrReplaceTempView("asso_sym")
      spark.sql("WITH z AS (SELECT 1)" + assortativitySql("asso_sym"))
    }),
    "recsys_user_cf" -> Tables.sql(UserCfSql),
    "recsys_als_step" -> Tables.sql(alsStepSql(spark = true)),
    // Iterative driver loop over PERSISTED rounds: each peel is two
    // semi-joins + one aggregate on the previous round's cached edges,
    // and the 8 trajectory numbers are driver-side counts (the
    // graph_triangles pattern — a 4-row result is not a row-scale
    // collect). The single-statement spelling (8 scalar subqueries
    // each re-deriving the full peel chain) planned ~50 joins and ran
    // 16.5 s at sf0.1 — 10× this loop; the oracle keeps it (DuckDB
    // materializes CTEs, so its chain evaluates once).
    "graph_kcore" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir)
      var sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      var deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")).persist()
      val rows = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
      rows += ((0, deg.count(), sym.where(col("src") < col("dst")).count()))
      for (k <- 1 to 3) {
        val keep = deg.where(col("degree") >= 3).select(col("node"))
        val symN = sym
          .join(keep.select(col("node").as("src")), Seq("src"))
          .join(keep.select(col("node").as("dst")), Seq("dst"))
          .select(col("src"), col("dst")).persist()
        val degN = symN.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("degree")).persist()
        rows += ((k, degN.count(), symN.where(col("src") < col("dst")).count()))
        sym = symN; deg = degN
      }
      import spark.implicits._
      rows.toSeq.toDF("round", "n_nodes", "n_edges")
    }),
    "graph_local_clustering" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      e.createOrReplaceTempView("lcc_e")
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .createOrReplaceTempView("lcc_sym")
      spark.sql("WITH x AS (SELECT 1)" +
        localClusteringSql("lcc_e", "lcc_sym"))
    }),
    "graph_assoc_rules" -> Tables.sql(assocSql(spark = true)),
    "recsys_item_sim" -> Tables.sql(ItemSimSql),
    // sssp keeps the single-statement spelling on BOTH sides: unlike
    // reach_recursive (UnionLoopExec re-plans its step each iteration),
    // the unrolled relaxations sit in one plan where ReuseExchange
    // already dedupes the repeated edge-build subtree — a persisted-view
    // spelling measured SLOWER (7.2 s vs 3.3 s at sf0.1: cache-write
    // overhead for no reuse the optimizer wasn't already getting).
    "graph_sssp" -> Tables.sql(SsspSql),
    "graph_reach_recursive" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir)
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist().createOrReplaceTempView("reach_sym")
      spark.sql(reachRecursiveSql("reach_sym"))
    }),
    // global triangle census (+ node/edge counts): two-hash-join wedge
    // closure on the once-stored (src < dst) orientation. The three
    // counts are driver-side scalars over the persisted edge list
    // (1-row result — not a row-scale collect).
    "graph_triangles" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      val nNodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().count()
      val nEdges = e.count()
      val e1 = e.select(col("src").as("a"), col("dst").as("b"))
      val e2 = e.select(col("src").as("b"), col("dst").as("c"))
      val e3 = e.select(col("src").as("a"), col("dst").as("c"))
      val nTri = e1.join(e2, Seq("b")).join(e3, Seq("a", "c")).count()
      import spark.implicits._
      Seq((nNodes, nEdges, nTri)).toDF("n_nodes", "n_edges", "n_triangles")
    }),

    // degree histogram — the shape-of-the-graph diagnostic run before
    // any join-heavy graph op (skew detection for the salting decision)
    "graph_degree_stats" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("degree"))
    }),

    // Bounded-depth BFS (friend-of-friend counts): 1-hop and ≤2-hop
    // neighborhood sizes for the 10 lowest-id nodes, via two hash
    // joins over the symmetric edge list. The seed set broadcasts, the
    // frontier shuffles are (seed, node) id pairs only, and depth is
    // fixed — the plan holds at any graph size (iterated-join BFS, the
    // same shape each extra hop adds one join to).
    "graph_khop" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val seeds = sym.select(col("src").as("seed")).distinct()
        .orderBy(col("seed")).limit(10)
      val h1 = seeds.join(sym, col("seed") === col("src"))
        .select(col("seed"), col("dst").as("nb")).distinct().persist()
      val h2 = h1.select(col("seed"), col("nb").as("mid"))
        .join(sym.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .select(col("seed"), col("dst").as("nb"))
      val reach = h1.union(h2).where(col("nb") =!= col("seed")).distinct()
      val d1 = h1.groupBy(col("seed")).agg(count(lit(1)).as("n_1hop"))
      val d2 = reach.groupBy(col("seed")).agg(count(lit(1)).as("n_2hop"))
      d1.join(d2, Seq("seed")).orderBy(col("seed"))
    }),

    // Synchronous label propagation (Raghavan et al. 2007), 3 unrolled
    // iterations with the deterministic (count DESC, label ASC) vote —
    // community detection as pure joins+aggregates. Each iteration is
    // one edge⋈label join (node-keyed shuffle of id pairs) plus a
    // per-node argmax window; the oracle replays the identical
    // iteration so communities match exactly. Top-20 communities.
    "graph_label_prop" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = edges(spark, sfDir).persist()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      var lp = sym.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 3) {
        val nl = sym.join(lp.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("node").orderBy(col("c").desc, col("lbl"))
        lp = nl.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).select("node", "lbl")
      }
      lp.groupBy(col("lbl").as("community")).agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community")).limit(20)
    }),

    // Link prediction (Liben-Nowell & Kleinberg 2003): for node pairs
    // at distance 2 (NOT already linked), common-neighbor count,
    // Adamic–Adar Σ_z 1/ln(deg z), and neighborhood Jaccard — the
    // "which products will co-occur next" primitive. The wedge join is
    // the triangles plan (bounded by the support floor, never
    // all-pairs); each Adamic–Adar term quantizes to an exact 1e-6
    // integer BEFORE the sum (the geomean discipline — both engines'
    // ln agree far inside the quantum), so the SUM is order-independent
    // and the (aa_q DESC, a, b) top-20 cut is total. Existing edges
    // drop via LEFT ANTI against the (src < dst) store.
    "graph_adamic_adar" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")).persist()
      // a common neighbor has >= 2 neighbors by construction; the
      // degree>=2 guard keeps ln(1)=0 out of the division anyway
      val zw = deg.where(col("degree") >= 2)
        .select(col("node").as("z"),
          round(lit(1000000.0) / log(col("degree").cast("double")))
            .cast("bigint").as("wq"))
      val za = sym.select(col("src").as("z"), col("dst").as("a"))
      val zb = sym.select(col("src").as("z"), col("dst").as("b"))
      val cand = za.join(zb, Seq("z")).where(col("a") < col("b"))
        .join(zw, Seq("z"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("common_nbrs"), sum(col("wq")).as("aa_q"))
      cand
        .join(e.select(col("src").as("a"), col("dst").as("b")),
          Seq("a", "b"), "left_anti")
        .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
        .select(col("a").as("node_a"), col("b").as("node_b"),
          col("common_nbrs"), col("aa_q"),
          round(col("aa_q").cast("double") / lit(1000000.0), 6).as("adamic_adar"),
          round(col("common_nbrs").cast("double")
            / (col("da") + col("db") - col("common_nbrs")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("aa_q").desc, col("node_a"), col("node_b"))
        .limit(20)
    }),

    // Modularity of the 3-round LPA communities (Newman–Girvan Q):
    // per community c, contribution = e_c/m − (d_c/2m)² over intra-edge
    // count e_c, degree mass d_c, edge total m. Completes the
    // community-detection story with its quality score. Counts are all
    // exact integers off two label equi-joins (the membership join on
    // each edge endpoint — id-pair shuffles only); each contribution is
    // one IEEE chain on exact counts (squared via multiply, not POW —
    // no libm), ROUNDed before the (size DESC, community) total order.
    // m is a driver-side scalar (one count over the persisted edges).
    "graph_modularity" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val e = edges(spark, sfDir).persist()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      var lp = sym.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 3) {
        val nl = sym.join(lp.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("node").orderBy(col("c").desc, col("lbl"))
        lp = nl.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).select("node", "lbl")
      }
      lp = lp.persist()
      val m = e.count().toDouble
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
      val dc = deg.join(lp, Seq("node"))
        .groupBy(col("lbl"))
        .agg(sum(col("degree")).as("d_c"), count(lit(1)).as("size"))
      val ein = e
        .join(lp.select(col("node").as("src"), col("lbl").as("la")), Seq("src"))
        .join(lp.select(col("node").as("dst"), col("lbl").as("lb")), Seq("dst"))
        .where(col("la") === col("lb"))
        .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_c"))
      val r = col("d_c").cast("double") / lit(2.0 * m)
      dc.join(ein, Seq("lbl"), "left")
        .select(col("lbl").as("community"), col("size"), col("d_c"),
          coalesce(col("e_c"), lit(0L)).as("e_c"),
          // + 0.0 normalizes a rounded −0.0 (a tiny negative contribution
          // rounding to zero keeps its sign bit, and the engines disagree
          // on which zero to print — surfaced at sf0.1)
          (round(coalesce(col("e_c"), lit(0L)).cast("double") / lit(m) - r * r, 6)
            + lit(0.0)).as("contribution"))
        .orderBy(col("size").desc, col("community"))
        .limit(20)
    }),

    // 3 unrolled quantized-PageRank iterations, top-20 nodes; the
    // oracle replays the identical iteration, so values match exactly
    // Personalized PageRank (Jeh & Widom WWW'03; the recommendation /
    // local-ranking variant): the restart mass returns to the SEED
    // node instead of spreading uniformly, so scores measure proximity
    // to the seed. Same exact integer-grid iteration discipline as
    // graph_pagerank (quantized contributions, FLOOR'd 17/20 damping —
    // both engines replay bit-for-bit); the seed (MIN node id) is one
    // collected scalar — driver state, as in any PPR service. Sparsity
    // IS the plan: mass starts one-hot and stays concentrated near the
    // seed, so each round joins only the FRONTIER (q > 0 rows) against
    // the edge list — round-1 cost is O(deg(seed)), not O(E). The
    // filter is result-invariant: a zero-mass node contributes
    // floor(0/degree) = 0, exactly what the coalesce(s, 0) on the
    // receive side already supplies for absent rows.
    "graph_ppr" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      val sym = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")).persist()
      // seed at the max-degree hub (tie-break min id): a one-hot start
      // from a degree-1 leaf reaches 2 nodes in 3 rounds — the hub
      // neighborhood is what a PPR recommendation query looks like
      val seed = deg.orderBy(col("degree").desc, col("node")).first().getLong(0)
      var pr = deg.select(col("node"),
        when(col("node") === seed, lit(1000000.0)).otherwise(lit(0.0)).as("q"))
      for (_ <- 1 to 3) {
        val contrib = sym
          .join(pr.where(col("q") > 0).withColumnRenamed("node", "src"),
            Seq("src"))
          .join(deg.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("cnode"))
          .agg(sum(floor(col("q") / col("degree"))).cast("double").as("s"))
        pr = deg.select(col("node"))
          .join(contrib, col("node") === col("cnode"), "left")
          .select(col("node"),
            (when(col("node") === seed, lit(150000.0)).otherwise(lit(0.0)) +
              floor(lit(17.0) * coalesce(col("s"), lit(0.0)) / lit(20.0))).as("q"))
      }
      pr.select(col("node"), col("q").cast("bigint").as("ppr_q"))
        .where(col("ppr_q") > 0)
        .orderBy(col("ppr_q").desc, col("node"))
        .limit(20)
    }),

    "graph_pagerank" -> ((spark, sfDir) => {
      val e = edges(spark, sfDir).persist()
      val sym = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")).persist()
      var pr = deg.select(col("node"), lit(1000000.0).as("q"))
      for (_ <- 1 to 3) {
        val contrib = sym
          .join(pr.withColumnRenamed("node", "src"), Seq("src"))
          .join(deg.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("cnode"))
          .agg(sum(floor(col("q") / col("degree"))).cast("double").as("s"))
        pr = deg.select(col("node"))
          .join(contrib, col("node") === col("cnode"), "left")
          .select(col("node"),
            (lit(150000.0) +
              floor(lit(17.0) * coalesce(col("s"), lit(0.0)) / lit(20.0))).as("q"))
      }
      // exact-integer projection only: pr_q IS the score on the 1e-6
      // grid. The display-double ROUND twin was dropped in round 9 —
      // the int-over-1e6 quotient class cost two earlier rounds
      // (graph_sssp) to engine-divergent decimal/double division, and
      // a consumer can always divide at presentation time.
      pr.select(col("node"), col("q").cast("bigint").as("pr_q"))
        .orderBy(col("pr_q").desc, col("node"))
        .limit(20)
    })
  )

  // one synchronous LPA iteration (vote = count DESC, label ASC)
  private def lpIter(k: Int): String = s"""
      , nl$k AS (
        SELECT s.dst AS node, p.lbl AS lbl, COUNT(*) AS c
        FROM sym s JOIN lp${k - 1} p ON s.src = p.node
        GROUP BY s.dst, p.lbl
      ), lp$k AS (
        SELECT node, lbl FROM (
          SELECT node, lbl,
                 ROW_NUMBER() OVER (PARTITION BY node
                                    ORDER BY c DESC, lbl) AS rn
          FROM nl$k) x
        WHERE rn = 1
      )"""

  private val SymCte = """
      , sym AS MATERIALIZED (SELECT src, dst FROM e
                UNION ALL SELECT dst AS src, src AS dst FROM e)"""

  val oracle: Map[String, String] = Map(
    "graph_mst_boruvka" -> mstSql("""
      WITH io AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      ew AS MATERIALIZED (
        SELECT a.p AS src, b.p AS dst,
               CAST(FLOOR(1000000.0 / COUNT(*)) AS BIGINT) AS cost
        FROM io a JOIN io b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2)""", "ew"),
    "graph_harmonic_centrality" -> (EdgeCte + SymCte + harmonicSql("sym")),
    "graph_assortativity" -> (EdgeCte + SymCte + assortativitySql("sym")),
    "recsys_user_cf" -> UserCfSql,
    "recsys_als_step" -> alsStepSql(spark = false),
    "graph_kcore" -> kcoreSql(EdgeCte + """
      , sym0 AS MATERIALIZED (SELECT src, dst FROM e
                 UNION ALL SELECT dst AS src, src AS dst FROM e)"""),
    "graph_local_clustering" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e
                UNION ALL SELECT dst AS src, src AS dst FROM e)""" +
      localClusteringSql("e", "sym")),
    "graph_assoc_rules" -> assocSql(spark = false),
    "recsys_item_sim" -> ItemSimSql,
    "graph_sssp" -> SsspSql,
    "graph_reach_recursive" -> ("WITH RECURSIVE" +
      EdgeCte.replaceFirst("\\s*WITH", "") + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
      """ + reachRecursiveSql("sym").replaceFirst("\\s*WITH RECURSIVE\\s*", "")),
    "graph_label_prop" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , lp0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)""" +
      lpIter(1) + lpIter(2) + lpIter(3) + """
      SELECT lbl AS community, COUNT(*) AS size
      FROM lp3 GROUP BY lbl
      ORDER BY size DESC, community LIMIT 20"""),

    "graph_modularity" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , lp0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym)""" +
      lpIter(1) + lpIter(2) + lpIter(3) + """
      , m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e)
      , deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src)
      , dc AS (SELECT p.lbl, CAST(SUM(d.degree) AS BIGINT) AS d_c,
                      CAST(COUNT(*) AS BIGINT) AS size
               FROM deg d JOIN lp3 p ON d.node = p.node GROUP BY p.lbl)
      , ein AS (SELECT a.lbl, CAST(COUNT(*) AS BIGINT) AS e_c
                FROM e JOIN lp3 a ON e.src = a.node JOIN lp3 b ON e.dst = b.node
                WHERE a.lbl = b.lbl GROUP BY a.lbl)
      SELECT dc.lbl AS community, dc.size, dc.d_c,
             COALESCE(ein.e_c, 0) AS e_c,
             ROUND(CAST(COALESCE(ein.e_c, 0) AS DOUBLE) / m.m
                   - (CAST(dc.d_c AS DOUBLE) / (2.0 * m.m))
                     * (CAST(dc.d_c AS DOUBLE) / (2.0 * m.m)), 6) + 0.0 AS contribution
      FROM dc LEFT JOIN ein ON dc.lbl = ein.lbl CROSS JOIN m
      ORDER BY dc.size DESC, community LIMIT 20"""),
    "graph_triangles" -> (EdgeCte + """
      SELECT (SELECT COUNT(*) FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e) n) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT COUNT(*) FROM e e1 JOIN e e2 ON e1.dst = e2.src
                               JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst) AS n_triangles"""),

    "graph_degree_stats" -> (EdgeCte + """
      , d AS (SELECT node, COUNT(*) AS degree
              FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e) n
              GROUP BY node)
      SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree ORDER BY degree"""),

    "graph_khop" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , seeds AS (SELECT DISTINCT src AS seed FROM sym ORDER BY seed LIMIT 10)
      , h1 AS (SELECT DISTINCT s.seed, y.dst AS nb FROM seeds s JOIN sym y ON y.src = s.seed)
      , h2 AS (SELECT h1.seed, y.dst AS nb FROM h1 JOIN sym y ON y.src = h1.nb)
      , reach AS (SELECT DISTINCT seed, nb
                  FROM (SELECT seed, nb FROM h1 UNION ALL SELECT seed, nb FROM h2) u
                  WHERE nb <> seed)
      SELECT d1.seed, d1.n_1hop, d2.n_2hop
      FROM (SELECT seed, COUNT(*) AS n_1hop FROM h1 GROUP BY seed) d1
      JOIN (SELECT seed, COUNT(*) AS n_2hop FROM reach GROUP BY seed) d2
        ON d1.seed = d2.seed
      ORDER BY d1.seed"""),

    "graph_adamic_adar" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src)
      , zw AS (SELECT node AS z,
                      CAST(ROUND(1000000.0 / LN(CAST(degree AS DOUBLE))) AS BIGINT) AS wq
               FROM deg WHERE degree >= 2)
      , cand AS (
          SELECT za.dst AS a, zb.dst AS b,
                 COUNT(*) AS common_nbrs, CAST(SUM(w.wq) AS BIGINT) AS aa_q
          FROM sym za JOIN sym zb ON za.src = zb.src AND za.dst < zb.dst
          JOIN zw w ON w.z = za.src
          GROUP BY za.dst, zb.dst)
      , ne AS (
          SELECT c.a, c.b, c.common_nbrs, c.aa_q
          FROM cand c LEFT JOIN e ON e.src = c.a AND e.dst = c.b
          WHERE e.src IS NULL)
      SELECT ne.a AS node_a, ne.b AS node_b, ne.common_nbrs, ne.aa_q,
             ROUND(CAST(ne.aa_q AS DOUBLE) / 1000000.0, 6) AS adamic_adar,
             ROUND(CAST(ne.common_nbrs AS DOUBLE)
                   / CAST(da.degree + db.degree - ne.common_nbrs AS DOUBLE), 6) AS jaccard
      FROM ne JOIN deg da ON da.node = ne.a JOIN deg db ON db.node = ne.b
      ORDER BY ne.aa_q DESC, node_a, node_b
      LIMIT 20"""),

    "graph_ppr" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src)
      , seed AS (SELECT node AS s FROM deg ORDER BY degree DESC, node LIMIT 1)
      , ppr0 AS (SELECT d.node, CASE WHEN d.node = sd.s THEN CAST(1000000 AS DOUBLE)
                                     ELSE CAST(0 AS DOUBLE) END AS q
                 FROM deg d CROSS JOIN seed sd)""" +
      pprIter(1) + pprIter(2) + pprIter(3) + """
      SELECT node, CAST(q AS BIGINT) AS ppr_q
      FROM ppr3 WHERE CAST(q AS BIGINT) > 0
      ORDER BY ppr_q DESC, node LIMIT 20"""),

    "graph_pagerank" -> (EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src)
      , pr0 AS (SELECT node, CAST(1000000 AS DOUBLE) AS q FROM deg)""" +
      prIter(1) + prIter(2) + prIter(3) + """
      SELECT node, CAST(q AS BIGINT) AS pr_q
      FROM pr3 ORDER BY pr_q DESC, node LIMIT 20""")
  )
}
