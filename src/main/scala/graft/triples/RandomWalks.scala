package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation over a (subj, obj)
  * edge set — the node2vec/DeepWalk input step of training KG
  * embeddings from the materialized graph (walk sequences become the
  * "sentences" a skip-gram embedder consumes). The reference stores
  * pre-computed `openai_embedding` vectors on every node (reference
  * README.md:127-133); this operator is the scale path for producing
  * the training corpus that replaces that external dependency.
  *
  * Determinism contract: there is no `rand()` anywhere. The step-t
  * choice out of node v on walk (start, w) is
  * `nbrs[ (hash64(start|w|t|v) & 0xffffffff) % degree(v) ]` over the
  * SORTED neighbor list — a pure function of the walk identity, so
  * corpora are reproducible across runs, engines, partitionings and
  * task retries, and an external engine can replay every step (the
  * low-32-bit mask keeps the modulus identical under signed JVM longs
  * and unsigned HUGEINT arithmetic).
  *
  * Scale shape: the adjacency build is one groupBy keyed on node
  * (persisted, reused by every step); each of the `walkLen` steps is
  * one equi-join of the walk state (O(nodes × walksPerNode) rows)
  * against it — keyed, AQE-coalesced, hub-node skew split by AQE.
  * Walk state carries (start, walk, cur) only — never the path — so
  * per-row width is constant; the corpus is emitted incrementally as
  * (start, walk, step, node) rows. `localCheckpoint` per step
  * truncates the iterative-join lineage.
  */
object RandomWalks {

  /** @param edges        (subj, obj) pairs; symmetrized when
    *                     `directed = false`
    * @param walksPerNode walks started from every non-isolated node
    * @param walkLen      steps per walk (rows emitted: walkLen + 1 per
    *                     walk, fewer if a directed walk hits a sink)
    * @return (start, walk, step, node) — step 0 is the start itself
    */
  def walks(spark: SparkSession, edges: DataFrame, walksPerNode: Int,
            walkLen: Int, directed: Boolean = false): DataFrame = {
    require(walksPerNode >= 1 && walkLen >= 1,
      s"need walksPerNode/walkLen >= 1, got $walksPerNode/$walkLen")
    import spark.implicits._
    val fwd = edges.select(col("subj").cast("string").as("src"),
      col("obj").cast("string").as("dst"))
    val und = (if (directed) fwd
               else fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst"))))
      .filter($"src" =!= $"dst").distinct()
    val adj = und.groupBy($"src")
      .agg(sort_array(collect_set($"dst")).as("nbrs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var state = adj.select($"src".as("start"))
        .withColumn("walk", explode(sequence(lit(0), lit(walksPerNode - 1))))
        .withColumn("cur", $"start")
        .localCheckpoint()
      var out = state.withColumn("step", lit(0))
      for (t <- 1 to walkLen) {
        state = state.join(adj, state("cur") === adj("src"))
          .withColumn("idx",
            (graft.Functions.hash64_str(
              concat_ws("|", $"start", $"walk", lit(t), $"cur"))
              .bitwiseAND(lit(0xffffffffL)) % size($"nbrs")).cast("int"))
          .select($"start", $"walk", element_at($"nbrs", $"idx" + 1).as("cur"))
          .localCheckpoint()
        out = out.unionByName(state.withColumn("step", lit(t)))
      }
      out.select($"start", $"walk", $"step", $"cur".as("node"))
    } finally { adj.unpersist(): Unit }
  }

  /** Skip-gram (center, context) co-occurrence counts over a walk
    * corpus — the final corpus-side step before embedding training:
    * each walk is a "sentence", each pair of nodes within `window`
    * steps of each other is one training co-occurrence.
    *
    * Built as an offset-explode + equi-join, NOT a self-join with an
    * |Δstep| ≤ w band predicate: each walk row fans out to exactly 2w
    * (offset, expected-step) probes joined back on the full (start,
    * walk, step) key — work is O(rows × window) regardless of walk
    * length, where the band self-join degenerates to per-walk
    * quadratic comparison and (on range-join-less engines) a skew
    * hazard on the (start, walk) key alone. Out-of-range probes
    * (before step 0 / past the walk end) drop out of the inner join
    * naturally.
    *
    * @param walkRows (start, walk, step, node) — [[walks]] output
    * @param window   max |step distance| counted as context (≥ 1)
    * @return (center, context, n_pairs) — directional (both orders
    *         emitted, as skip-gram training consumes them)
    */
  def skipGramPairs(walkRows: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = walkRows.select(col("start"), col("walk"),
      col("step").cast("int").as("step"), col("node"))
    val offsets = (-window to window).filter(_ != 0)
    val probes = w
      .withColumn("off", explode(lit(offsets.toArray)))
      .select(col("start"), col("walk"),
        (col("step") + col("off")).as("step"), col("node").as("center"))
    probes
      .join(w.withColumnRenamed("node", "context"),
        Seq("start", "walk", "step"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
