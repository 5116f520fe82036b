package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Deterministic corrupted-tail negative sampling over an edge table —
  * the training-data op that turns a materialized KG into
  * contrastive-learning input (TransE-family embedding training needs
  * k corrupted (s, p, o′) per true (s, p, o); the reference stops at
  * serving the graph, but a pipeline FEEDING KG-embedding training is
  * the natural downstream of everything this engine materializes).
  *
  * The usual implementations don't distribute: `rand()` sampling is
  * irreproducible across retries/partitionings (poison for resumable
  * lineage), and indexing vertices 0..n−1 for uniform draws needs a
  * GLOBAL row_number — a single-partition window at corpus scale.
  * This sampler is the bucket-uniform rewrite: hash-assign every
  * vertex to one of B buckets and rank it WITHIN its bucket (window
  * partitioned by bucket — parallel, bounded state); each (edge, slot)
  * derives one 64-bit hash, picks bucket b from its low bits and
  * intra-bucket rank r = (h >> bBits) mod |bucket b| from the rest,
  * and an equi-join on (bucket, rank) fetches the corrupted tail.
  * P(vertex) = (1/B)·(1/|bucket|) — uniform up to hash balance — and
  * every draw is a pure function of (edge, slot), so partitioning,
  * retries and resume replays produce byte-identical negatives.
  *
  * Cost at scale: one bucket-partitioned window over vertices, one
  * broadcast of the B-row bucket-count table, one shuffle equi-join of
  * k·|edges| probe rows against the ranked vertex table, one left-anti
  * join against the true edge set (the standard "filtered negatives"
  * discipline: a corrupted triple that happens to be true is dropped,
  * as is the no-op o′ = o).
  *
  * The probe key joins its fields with a U+0001 separator — a bare
  * concatenation would alias distinct edges whose field boundaries
  * shift (("ab","c") vs ("a","bc")), silently correlating their
  * draws. The DuckDB oracle uses chr(1) to match.
  */
object NegativeSample {

  /** @param edges (subj, pred, obj) string triples
    * @param k     corruption slots per edge (slot column in output)
    * @param bBits log2 of the vertex bucket count
    * @return (subj, pred, obj, neg_obj, slot) — at most k rows per
    *         input edge; slots whose draw collided with the true obj
    *         or with an existing edge are dropped, not re-drawn
    *         (pinned semantics; re-draw loops are not reproducible
    *         under a changing edge set) */
  def corruptTails(edges: DataFrame, k: Int, bBits: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k in [1,64], got $k")
    require(bBits >= 1 && bBits <= 20, s"bBits in [1,20], got $bBits")
    val spark = edges.sparkSession
    import spark.implicits._
    val bMask = (1L << bBits) - 1

    val verts = edges.select($"subj".as("v"))
      .unionByName(edges.select($"obj".as("v"))).distinct()
    val vh = verts.select($"v", Functions.hash64_str($"v").as("vh"))
      .select($"v", $"vh".bitwiseAND(lit(bMask)).as("bucket"), $"vh")
    val ranked = vh.select($"v", $"bucket",
      (row_number().over(Window.partitionBy($"bucket")
        .orderBy($"vh", $"v")) - 1).as("rank"))
    val counts = ranked.groupBy($"bucket").agg(count(lit(1)).as("cnt"))

    val probes = edges
      .select($"subj", $"pred", $"obj",
        explode(array((0 until k).map(lit): _*)).as("slot"))
      .withColumn("h", Functions.hash64_str(
        concat_ws("\u0001", $"subj", $"pred", $"obj", $"slot")))
      .withColumn("bucket", $"h".bitwiseAND(lit(bMask)))
      .join(broadcast(counts), "bucket")
      .withColumn("rank", pmod(shiftrightunsigned($"h", bBits), $"cnt"))
    probes
      .join(ranked.select($"bucket", $"rank", $"v".as("neg_obj")),
        Seq("bucket", "rank"))
      .filter($"neg_obj" =!= $"obj") // no-op corruption
      .join(edges.select($"subj", $"pred", $"obj".as("neg_obj")),
        Seq("subj", "pred", "neg_obj"), "left_anti") // filtered negatives
      .select($"subj", $"pred", $"obj", $"neg_obj", $"slot")
  }
}
