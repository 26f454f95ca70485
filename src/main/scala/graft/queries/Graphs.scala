package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Graph

/** Graph/sequence analytics: PageRank over a co-occurrence graph and
  * Markov transition counts over per-user event sequences. Both are
  * extensions (the reference has no graph or sequence surface); both
  * are exact-integer / window constructions the DuckDB oracle replays
  * bit-for-bit.
  */
object Graphs {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  private val Iters = 3
  private val Scale = 1000000L
  private val Damp = 85

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q130: PageRank on the part<->supplier bipartite graph ----
    // Edges: every distinct (part, supplier) supply relation, both
    // directions, id spaces interleaved (part*2, supp*2+1). 3 power
    // iterations in exact scaled-BIGINT arithmetic (per-edge
    // rank DIV deg, damping via *85 DIV 100), each iteration
    // lineage-cut — the link-authority signal crawl curation weights
    // documents by. Edge generation is LINEAR in the supply relation
    // (the co-supply projection would be quadratic per part — this
    // corpus' parts share so many suppliers that the co-graph is
    // near-complete); per iteration the broadcast rank table keeps the
    // edge side shuffle-free, leaving one contribution hash-agg.
    "q130_pagerank" -> ((s, d) => {
      val edges = Graph.bipartiteEdges(
        t(s, d, "lineitem").select("l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey")
      Graph.pageRank(edges, "src", "dst", Iters, Scale, Damp)
        .select(col("node"), col("rank"))
    }),

    // ---- q153: bounded BFS distances ----
    // Hop distance from supplier 1 (node 3 in the interleaved id
    // space) to every part/supplier within 4 hops of the supply graph
    // — the reachability/locality primitive (supply-chain blast
    // radius, link-distance features). Iterative min-relaxation with
    // the same lineage-cut + broadcast-distance discipline as q130;
    // the oracle replays it as a depth-bounded recursive CTE.
    "q153_bfs_hops" -> ((s, d) => {
      val edges = Graph.bipartiteEdges(
        t(s, d, "lineitem").select("l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey")
      Graph.bfsDistances(edges, "src", "dst", Seq(3L), maxHops = 4)
    }),

    // ---- q136: Markov transition counts over event sequences ----
    // Per user, order events by (ts, event_id) and count each
    // (from_type -> to_type) adjacency — the user-journey/session-flow
    // primitive. ONE window pass partitioned by user (shuffle on
    // user_id only; key cardinality grows with data, so partitions
    // stay balanced at 100 TB) + one hash agg on the tiny type-pair
    // domain.
    "q136_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
    })
  )

  private def contribRank(prev: String, c: String, r: String): String =
    s"""$c AS (SELECT e.dst, CAST(SUM(r.rank // od.deg) AS BIGINT) AS s
       |  FROM e JOIN $prev r ON r.node = e.src
       |  JOIN od ON od.src = e.src GROUP BY 1),
       | $r AS (SELECT n.node, CAST(${Scale * (100 - Damp) / 100}
       |     + ($Damp * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
       |  FROM n LEFT JOIN $c c ON c.dst = n.node)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q130_pagerank" ->
      s"""WITH ps AS (SELECT DISTINCT l_partkey * 2 AS src,
        |   l_suppkey * 2 + 1 AS dst FROM lineitem),
        | e AS (SELECT src, dst FROM ps
        |   UNION ALL SELECT dst, src FROM ps),
        | n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        | od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        | r0 AS (SELECT node, CAST($Scale AS BIGINT) AS rank FROM n),
        | ${contribRank("r0", "c1", "r1")},
        | ${contribRank("r1", "c2", "r2")},
        | ${contribRank("r2", "c3", "r3")}
        |SELECT node, rank FROM r3""".stripMargin,

    "q153_bfs_hops" ->
      s"""WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey * 2 AS src,
        |   l_suppkey * 2 + 1 AS dst FROM lineitem),
        | e AS (SELECT src, dst FROM ps
        |   UNION ALL SELECT dst, src FROM ps),
        | r AS (SELECT CAST(3 AS BIGINT) AS node, 0 AS d
        |   UNION SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.node
        |     WHERE r.d < 4)
        |SELECT node, MIN(d) AS d FROM r GROUP BY 1""".stripMargin,

    "q136_markov_transitions" ->
      """SELECT from_type, to_type, count(*) AS n FROM (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        | FROM events)
        |WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin
  )
}
