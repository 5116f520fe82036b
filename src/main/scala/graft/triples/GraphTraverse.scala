package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-depth graph traversal over a materialized (subj, obj) edge
  * table — the "expand the neighborhood of this concept" query every
  * KG consumer runs (the reference serves it with ad-hoc Cypher
  * variable-length patterns like `(c)-[*1..3]-(x)` against Neo4j;
  * here it is a frontier-limited iterative join over the same edge
  * tables [[Triples.writeGraph]] lands, so it runs wherever the
  * parquet lives).
  *
  * Frontier BFS, not transitive closure: each round joins ONLY the
  * newly-reached nodes (the frontier) against the edge table, then
  * anti-joins the visited set — so per-round work is proportional to
  * the frontier's edge fan-out, never to the set of all paths (a
  * closure-style self-join doubles path count per round and dies on
  * any graph with cycles). `localCheckpoint` per round truncates the
  * iterative-join lineage.
  *
  * 100 TB shape: each round is one shuffle hash join keyed on node id
  * plus one distinct + left-anti — all keyed, all AQE-coalesced; a
  * supernode frontier (one hub reaching millions) is ordinary join
  * skew handled by AQE skew-split. k is small by construction (KG
  * neighborhoods; k ≤ 6 covers any serving query), so the round count
  * is bounded, and an exhausted frontier exits early.
  */
object GraphTraverse {

  /** Min-hop BFS from `seeds` over `edges`, up to `maxHops`.
    *
    * @param edges    (subj, obj) string pairs; traversed subj→obj, or
    *                 both ways when `directed = false`
    * @param seeds    one string column of start nodes (hop 0)
    * @param maxHops  inclusive depth bound (≥ 1)
    * @return (node, hop) — every node reachable within maxHops, hop =
    *         its MINIMUM distance from any seed (seeds themselves at
    *         hop 0, even if they also appear downstream)
    */
  def kHop(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
           maxHops: Int, directed: Boolean = false): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    import spark.implicits._
    val fwd = edges.select(col("subj").cast("string").as("src"),
      col("obj").cast("string").as("dst"))
    val adj = (if (directed) fwd
               else fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst"))))
      .filter($"src" =!= $"dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var visited = seeds.select(seeds.columns.head).toDF("node")
        .distinct().withColumn("hop", lit(0)).localCheckpoint()
      var frontier = visited.select("node")
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = frontier.join(adj, frontier("node") === adj("src"))
          .select($"dst".as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("hop", lit(h))
          .localCheckpoint() // truncate per-round lineage
        if (next.isEmpty) exhausted = true
        else {
          visited = visited.unionByName(next).localCheckpoint()
          frontier = next.select("node")
        }
        h += 1
      }
      visited
    } finally { adj.unpersist(): Unit }
  }
}
