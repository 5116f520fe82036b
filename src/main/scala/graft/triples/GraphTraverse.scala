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
        // frontier emptiness rides the checkpoint job as an observe()
        // metric — the per-round `next.isEmpty` probe job is gone
        val obs = new org.apache.spark.sql.Observation()
        val next = frontier.join(adj, frontier("node") === adj("src"))
          .select($"dst".as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("hop", lit(h))
          .observe(obs, count(lit(1)).as("n"))
          .localCheckpoint() // truncate per-round lineage
        if (obs.get("n").asInstanceOf[Long] == 0L) exhausted = true
        else {
          visited = visited.unionByName(next).localCheckpoint()
          frontier = next.select("node")
        }
        h += 1
      }
      visited
    } finally { adj.unpersist(): Unit }
  }

  /** Single-source (or multi-source) shortest paths over a weighted
    * directed edge table — distributed Bellman–Ford with semi-naive
    * (delta-driven) relaxation: each round joins ONLY the nodes whose
    * distance improved last round against the edge table, takes the
    * per-node min of the candidate costs, and keeps the rows that beat
    * the current distance. Weights are integers and all arithmetic is
    * 64-bit exact, so the result is reduction-order independent and
    * bit-portable to a SQL oracle (no float accumulation).
    *
    * Cycle-safe: a relaxation round can only DECREASE a node's
    * distance, and non-negative integer costs are bounded below, so
    * the delta empties in ≤ (longest shortest path in hops) rounds —
    * the classic Bellman–Ford bound — regardless of cycles.
    *
    * 100 TB shape: per round one shuffle join keyed on node + one
    * node-keyed min-aggregation; work is proportional to the improved
    * frontier's fan-out, never to all paths. `localCheckpoint` per
    * round truncates the iterative lineage. `maxIters` bounds the
    * rounds; hitting it raises rather than returning wrong distances.
    *
    * @param edges (subj, obj, w) — w a non-negative integral cost
    * @param seeds one string column of source nodes (distance 0)
    * @return (node, cost) — minimum cost from any seed, reachable only
    */
  def shortestPaths(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
                    maxIters: Int = 30): DataFrame = {
    import spark.implicits._
    val adj = edges.select(col("subj").cast("string").as("src"),
        col("obj").cast("string").as("dst"), col("w").cast("long").as("w"))
      .filter($"src" =!= $"dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = seeds.select(seeds.columns.head).toDF("node")
        .distinct().withColumn("cost", lit(0L)).localCheckpoint()
      var delta = dist
      // NO per-round emptiness probe job: the improved-row count rides
      // each round's checkpoint materialization as an observe() metric,
      // and the same boolean serves the loop condition, the dist-update
      // guard and the convergence check.
      var frontier = delta.limit(1).count() > 0
      var i = 0
      while (i < maxIters && frontier) {
        val cand = delta.join(adj, delta("node") === adj("src"))
          .select($"dst".as("node"), ($"cost" + $"w").as("cost"))
          .groupBy($"node").agg(min($"cost").as("cost"))
        val obs = new org.apache.spark.sql.Observation()
        val improved = cand.join(dist.select($"node", $"cost".as("cur")),
            Seq("node"), "left")
          .filter($"cur".isNull || $"cost" < $"cur")
          .select($"node", $"cost")
          .observe(obs, count(lit(1)).as("n"))
          .localCheckpoint() // truncate per-round lineage
        frontier = obs.get("n").asInstanceOf[Long] > 0
        if (frontier) {
          dist = dist.join(improved.select($"node"), Seq("node"), "left_anti")
            .unionByName(improved).localCheckpoint()
        }
        delta = improved
        i += 1
      }
      require(!frontier,
        s"shortestPaths did not converge in $maxIters rounds — raise maxIters")
      dist
    } finally { adj.unpersist(): Unit }
  }

  /** Transitive closure of a directed edge set — the "materialized
    * ancestors table" of KG serving (subsumption hierarchies, is-a
    * chains): every (src, dst) with a directed path src→…→dst of
    * length ≥ 1. Cycle-safe (self-pairs are dropped; a strongly
    * connected pair closes in both directions and then stops growing).
    *
    * Semi-naive evaluation: each round extends only the LAST round's
    * new pairs (`delta ⋈ edges`), then anti-joins everything already
    * known — per-round work is proportional to the NEW pairs, not to
    * the closure so far, and the round count is the graph's longest
    * shortest-path (≤ hierarchy depth, single digits for real
    * ontologies). `localCheckpoint` per round truncates lineage.
    *
    * Scale contract: output size is the closure itself — on an n-node,
    * depth-d hierarchy that is O(n·d), fine at 100 TB; on a dense
    * cyclic graph it is O(n²) and THIS is the wrong operator (use
    * [[kHop]] from the nodes actually queried). `maxIters` bounds the
    * rounds; hitting it raises rather than silently truncating.
    */
  def closure(spark: SparkSession, edges: DataFrame, maxIters: Int = 20): DataFrame = {
    import spark.implicits._
    val base = edges.select(col("subj").cast("string").as("src"),
        col("obj").cast("string").as("dst"))
      .filter($"src" =!= $"dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var acc = base.localCheckpoint()
      var delta = acc
      // new-pair count rides each round's checkpoint job (observe) —
      // no per-round isEmpty probe jobs; nDelta serves the loop
      // condition, the acc-update guard and the convergence require
      var nDelta = delta.limit(1).count()
      var i = 0
      while (i < maxIters && nDelta > 0) {
        val obs = new org.apache.spark.sql.Observation()
        val next = delta.join(base.select($"src".as("dst"), $"dst".as("dst2")), "dst")
          .select($"src", $"dst2".as("dst")).filter($"src" =!= $"dst")
          .distinct()
          .join(acc, Seq("src", "dst"), "left_anti")
          .observe(obs, count(lit(1)).as("n"))
          .localCheckpoint() // truncate per-round lineage
        nDelta = obs.get("n").asInstanceOf[Long]
        if (nDelta > 0) acc = acc.unionByName(next).localCheckpoint()
        delta = next
        i += 1
      }
      require(nDelta == 0,
        s"closure did not converge in $maxIters rounds — graph deeper than expected")
      acc
    } finally { base.unpersist(): Unit }
  }
}
