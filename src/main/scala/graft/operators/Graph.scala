package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * 100 TB design:
  *  - Edge build: one DISTINCT + one self-equi-join on the order key +
  *    a hash aggregate — all standard shuffles on (order, part) keys.
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

  // shared edge-build CTE: distinct (order, part) incidence, self-join
  // in (src < dst) orientation, support floor at 2 co-occurrences
  private val EdgeCte = """
      WITH io AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (
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
  private def prIter(k: Int): String = s"""
      , pr$k AS (
        SELECT d2.node AS node, 150000.0 + FLOOR(17.0 * COALESCE(c.s, 0.0) / 20.0) AS q
        FROM deg d2 LEFT JOIN (
          SELECT s.dst AS node,
                 CAST(SUM(FLOOR(CAST(p.q AS DOUBLE) / CAST(d.degree AS DOUBLE))) AS DOUBLE) AS s
          FROM sym s JOIN pr${k - 1} p ON s.src = p.node JOIN deg d ON s.src = d.node
          GROUP BY s.dst) c ON d2.node = c.node)"""

  private val TriSql = EdgeCte + """
      SELECT (SELECT COUNT(*) FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e) n) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT COUNT(*) FROM e e1 JOIN e e2 ON e1.dst = e2.src
                               JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst) AS n_triangles"""

  private val DegSql = EdgeCte + """
      , d AS (SELECT node, COUNT(*) AS degree
              FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e) n
              GROUP BY node)
      SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree ORDER BY degree"""

  private val PrSql = EdgeCte + """
      , sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)
      , deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src)
      , pr0 AS (SELECT node, CAST(1000000 AS DOUBLE) AS q FROM deg)""" +
    prIter(1) + prIter(2) + prIter(3) + """
      SELECT node, CAST(q AS BIGINT) AS pr_q, ROUND(CAST(q AS DOUBLE) / 1000000.0, 6) AS pr
      FROM pr3 ORDER BY pr_q DESC, node LIMIT 20"""

  val queries: Map[String, Q] = Map(
    // global triangle census (+ node/edge counts): two-hash-join wedge
    // closure on the once-stored (src < dst) orientation
    "graph_triangles" -> Tables.sql(TriSql),
    // degree histogram — the shape-of-the-graph diagnostic run before
    // any join-heavy graph op (skew detection for the salting decision)
    "graph_degree_stats" -> Tables.sql(DegSql),
    // 3 unrolled quantized-PageRank iterations, top-20 nodes; the
    // oracle replays the identical iteration, so values match exactly
    "graph_pagerank" -> Tables.sql(PrSql)
  )

  val oracle: Map[String, String] = Map(
    "graph_triangles" -> TriSql,
    "graph_degree_stats" -> DegSql,
    "graph_pagerank" -> PrSql
  )
}
