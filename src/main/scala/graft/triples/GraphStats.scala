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
