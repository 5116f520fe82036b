package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural statistics over a materialized edge table — the
  * graph-health checks a KG-construction pipeline runs after every
  * merge (reference operators never compute these; Neo4j's browser
  * did it ad hoc). Input anywhere a (subj, obj) pair set lives:
  * [[Triples]] edge tables, SIMILAR kNN edges, near-dup pair sets.
  *
  * All ops first canonicalize to the simple undirected graph —
  * symmetrize, drop self-loops, orient min<max, distinct — so
  * directed duplicates (A→B plus B→A) count once.
  */
object GraphStats {

  /** (src, dst) distinct undirected edges with src < min-oriented. */
  private def simple(edges: DataFrame): DataFrame =
    edges.select(col("subj").as("a"), col("obj").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()

  /** Degree histogram: one row per distinct degree, (degree,
    * n_nodes). Two map-side-combined aggregations — corpus-scale
    * safe; nodes of degree 0 are by definition absent. */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val und = simple(edges)
    val deg = und.select(col("src").as("node"))
      .unionByName(und.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** Fixed-iteration PageRank in pure 64-bit integer fixed-point —
    * rank mass is carried as BIGINT units of 1/`scale`, so every
    * arithmetic step (integer division by out-degree, the 85/100
    * damping, the commutative integer sum of in-contributions) is
    * exactly reproducible on any engine, any partitioning, any
    * reduction order. Floating-point PageRank cannot be oracle-pinned
    * across engines: double summation order differs between Spark's
    * partial aggregation tree and a single-node engine's sequential
    * fold. The cost of the integer form is sub-ulp truncation per
    * division (bounded mass loss, identically truncated on both
    * engines) — pinned semantics, not an approximation contract.
    *
    * Dangling nodes (no out-edges) leak their damped mass — the
    * simple "mass-loss" PageRank variant, documented and pinned by
    * the oracle. Iteration shape at scale: per round, one join of the
    * rank table against the edge table keyed on src (co-partitioned
    * if `edges` is pre-partitioned by src) and one map-side-combined
    * sum keyed on dst; `localCheckpoint` truncates the iterative
    * lineage. Fixed `iters` (no convergence test) keeps the job DAG
    * static and the result deterministic.
    *
    * @param edges directed (subj, obj); duplicates and self-loops
    *              dropped
    * @return (node, rank) — rank in fixed-point units of 1/scale;
    *         Σ rank ≤ scale (mass lost to truncation + dangling)
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1,50], got $iters")
    val spark = edges.sparkSession
    import spark.implicits._
    val fwd = edges.select(col("subj").cast("string").as("src"),
        col("obj").cast("string").as("dst"))
      .filter($"src" =!= $"dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = fwd.select($"src".as("node"))
        .unionByName(fwd.select($"dst".as("node"))).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // loop-invariant: attach each src's outdegree to its edges ONCE
      // (was a per-iteration join — 5 avoidable shuffles at iters=5)
      val fwdDeg = fwd
        .join(fwd.groupBy($"src").agg(count(lit(1)).as("outdeg")), "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = nodes.count() // scalar action; node count, never corpus rows
      require(n > 0, "pageRank needs a non-empty graph")
      val r0 = scale / n
      val tele = (15L * scale / 100) / n
      var ranks = nodes.withColumn("r", lit(r0)).localCheckpoint()
      var i = 0
      while (i < iters) {
        val contrib = fwdDeg
          .join(ranks, fwdDeg("src") === ranks("node"))
          .select($"dst".as("node"),
            expr("((r div outdeg) * 85) div 100").as("c"))
          .groupBy($"node").agg(sum($"c").as("c"))
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select($"node", (lit(tele) + coalesce($"c", lit(0L))).as("r"))
          .localCheckpoint()
        i += 1
      }
      val out = ranks.select($"node", $"r".as("rank"))
      fwdDeg.unpersist()
      nodes.unpersist()
      out
    } finally { fwd.unpersist(): Unit }
  }

  /** Exact triangle count + basic sizes, ONE row
    * (n_nodes, n_edges, n_triangles).
    *
    * Edges are oriented low-(degree, id) → high before the two-hop
    * join — the standard compact-forward trick: every triangle is
    * generated exactly once from its smallest-degree corner, and the
    * join fan-out per node is bounded by its FORWARD degree, which
    * the orientation caps at O(√|E|) even on power-law graphs (a
    * hub's edges mostly point INTO it). Two shuffles on node ids;
    * no cartesian anywhere.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = simple(edges)
    val deg = und.select($"src".as("node"))
      .unionByName(und.select($"dst".as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = und
      .join(deg.select($"node".as("src"), $"deg".as("dsrc")), "src")
      .join(deg.select($"node".as("dst"), $"deg".as("ddst")), "dst")
    val fwd = withDeg.select(
      when(struct($"dsrc", $"src") < struct($"ddst", $"dst"),
        struct($"src".as("u"), $"dst".as("v")))
        .otherwise(struct($"dst".as("u"), $"src".as("v"))).as("e"))
      .select($"e.u", $"e.v")
    // wedges u->v, u->w (v<w in oriented order) closed by v->w
    val e1 = fwd.select($"u", $"v")
    val e2 = fwd.select($"u".as("u2"), $"v".as("w"))
    val wedges = e1.join(e2, $"u" === $"u2").filter($"v" =!= $"w")
      .select($"v", $"w")
    val closed = wedges.join(fwd.select($"u".as("v"), $"v".as("w")),
      Seq("v", "w"), "left_semi")
    // each triangle appears twice in `wedges∩closed` (v,w) + (w,v)?
    // no: wedges emit BOTH (v,w) and (w,v); the closing edge exists
    // in exactly one orientation, so the semi-join keeps one. Count
    // is exact.
    val nTri = closed.agg(count(lit(1)).as("n_triangles"))
    val nE = und.agg(count(lit(1)).as("n_edges"))
    val nN = deg.agg(count(lit(1)).as("n_nodes"))
    nN.crossJoin(nE).crossJoin(nTri)
  }
}
