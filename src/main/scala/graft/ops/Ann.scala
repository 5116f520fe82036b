package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions
import graft.link.BroadcastKnn

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - [[bruteForceTopK]]: exact top-k; corpus broadcast, per-row heap
  *    scan inside flatMap (no shuffle, no materialized cross join).
  *    The baseline and the right call whenever the CORPUS side fits
  *    in a broadcast (dictionaries, centroid tables).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; only vectors
  *    sharing a bucket are compared. The scale path when both sides
  *    are large: the cross product is replaced by a bucket-keyed
  *    shuffle join. Recall < 1 by construction; `tables` independent
  *    hash tables trade compute for recall.
  */
object Ann {

  /** Hard ceiling on the corpus rows [[bruteForceTopK]] will broadcast
    * — the broadcastability contract made executable. ~2M x 64-float
    * vectors ≈ 600 MB of broadcast, already past comfortable; a corpus
    * beyond it must go through [[lshTopK]] / [[ivfTopK]] instead. */
  val MaxBroadcastCorpus = 2000000L

  /** Exact cosine top-k of `queries` against broadcast `corpus`.
    * Inputs: (id, vec) DataFrames. Output: (query_id, rank, id, cos).
    * Cosine is computed in full double precision per pair (no float
    * pre-normalization) so scores are bit-stable and oracle-exact.
    * Per query the scored corpus goes through a bounded heap —
    * O(C log k), not a full O(C log C) sort of all C scores. */
  def bruteForceTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                     k: Int, excludeSelf: Boolean = true,
                     maxBroadcast: Long = MaxBroadcastCorpus): DataFrame = {
    import spark.implicits._
    // limit-bounded guard: counts at most maxBroadcast+1 rows instead
    // of scanning the full corpus lineage a second time before collect
    val nCorpus = corpus.limit((maxBroadcast + 1).toInt).count()
    require(nCorpus <= maxBroadcast,
      s"bruteForceTopK corpus exceeds $maxBroadcast rows: " +
        "too large to broadcast — use Ann.lshTopK or Ann.ivfTopK")
    val corpusArr: Array[(String, Array[Float])] = corpus
      .select(col("id").cast("string"), col("vec"))
      .as[(String, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpusArr)
    val kk = k
    val ex = excludeSelf
    queries.select(col("id").cast("string"), col("vec"))
      .as[(String, Array[Float])]
      .flatMap { case (qid, qv) =>
        // min-heap of size k, worst candidate on top; ties prefer
        // evicting the LARGER id so the surviving set and its
        // (cos DESC, id ASC) order match the oracle's row_number
        val heap = new java.util.PriorityQueue[(String, Double)](kk + 1,
          (a: (String, Double), b: (String, Double)) => {
            val c = java.lang.Double.compare(a._2, b._2)
            if (c != 0) c else b._1.compareTo(a._1)
          })
        val arr = bc.value
        var i = 0
        while (i < arr.length) {
          val (cid, cv) = arr(i)
          if (!ex || cid != qid) {
            val s = graft.functions.VectorMath.cosine(qv, cv)
            heap.add((cid, s))
            if (heap.size > kk) heap.poll()
          }
          i += 1
        }
        val top = new Array[(String, Double)](heap.size)
        var j = heap.size - 1
        while (j >= 0) { top(j) = heap.poll(); j -= 1 }
        top.zipWithIndex.map { case ((cid, s), r) => (qid, r + 1, cid, s) }
      }
      .toDF("query_id", "rank", "id", "cos")
  }

  /** LSH-bucketed ANN: sign-bit signatures from `nBits` deterministic
    * random hyperplanes per table; exact cosine within buckets, then
    * global top-k per query across tables. Signatures are computed in
    * a typed map over broadcast hyperplanes — an expression-tree
    * formulation (tables x bits x dim nested columns) explodes
    * codegen and planned 200x slower. */
  def lshTopK(spark: SparkSession, vecs: DataFrame, k: Int,
              nBits: Int = 12, tables: Int = 4, dim: Int = 64): DataFrame = {
    import spark.implicits._
    val bcPlanes = spark.sparkContext.broadcast(hyperplanes(tables, nBits, dim))
    val nb = nBits; val nt = tables
    val withSigs = vecs.select(col("id").cast("string"), col("vec"))
      .as[(String, Array[Float])]
      .map { case (id, v) =>
        val planes = bcPlanes.value
        val sigs = Array.tabulate(nt) { t =>
          var sig = 0L
          var i = 0
          while (i < nb) {
            val p = planes(t)(i)
            var dot = 0.0
            var d = 0
            val n = math.min(p.length, v.length)
            while (d < n) { dot += v(d).toDouble * p(d); d += 1 }
            if (dot >= 0) sig |= (1L << i)
            i += 1
          }
          sig
        }
        (id, v, sigs)
      }.toDF("id", "vec", "sigs")
    val bucketed = withSigs.select(col("id"), col("vec"),
      posexplode(col("sigs")).as(Seq("table", "sig")))
    val a = bucketed.select(col("id").as("query_id"), col("vec").as("vec_a"),
      col("table"), col("sig"))
    val b = bucketed.select(col("id").as("id"), col("vec").as("vec_b"),
      col("table"), col("sig"))
    val pairs = a.join(b, Seq("table", "sig"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        Functions.cosine_sim(col("vec_a"), col("vec_b")).as("cos"))
      .groupBy("query_id", "id").agg(max("cos").as("cos")) // dedupe across tables
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * of `nCentroids` coarse centroids (one shuffle keyed by centroid
    * id — the "inverted lists"); a query probes only its `nProbe`
    * closest centroids' lists. The scale path when the corpus is too
    * large to broadcast AND LSH recall is insufficient: list sizes
    * are corpus/nCentroids on average, so compared pairs shrink by
    * ~nCentroids/nProbe.
    *
    * Centroids are seeded by a deterministic hash-ordered take: the
    * nCentroids rows with the smallest hash64(id) — a uniform
    * pseudo-random sample that plans as TakeOrderedAndProject, so
    * only nCentroids (vector) rows EVER reach the driver (no
    * corpus-sized collect; a real deployment would add a few Lloyd
    * iterations, which changes assignment quality, not the operator's
    * shape). */
  /** @param nAssign replicate each corpus vector into its `nAssign`
    *   nearest lists (multi-assignment): recall on weakly-clustered
    *   data improves at the cost of an nAssign-times-larger index —
    *   the standard redundancy/recall dial of inverted-file ANN. */
  def ivfTopK(spark: SparkSession, vecs: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, nAssign: Int = 1): DataFrame = {
    import spark.implicits._
    val corpus = vecs.select(col("id").cast("string"), col("vec"))
      .as[(String, Array[Float])]
    // deterministic coarse centroids: distributed top-N by id hash
    // (driver sees exactly nCentroids rows, never the corpus).
    // hash64 (engine-portable FNV+splitmix) rather than xxhash64 so
    // the seeding order is reproducible by the external oracle.
    val centroids: Array[(Int, Array[Float])] = corpus.toDF("id", "vec")
      .orderBy(Functions.hash64_str(col("id")).asc, col("id").asc)
      .limit(nCentroids)
      .select(col("id"), col("vec")).as[(String, Array[Float])]
      .collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val bcCent = spark.sparkContext.broadcast(centroids)

    def nearestCentroids(v: Array[Float], n: Int): Seq[Int] =
      bcCent.value.map { case (cid, cv) =>
        (cid, graft.functions.VectorMath.cosine(v, cv))
      }.sortBy { case (cid, s) => (-s, cid) }.take(n).map(_._1).toSeq

    // inverted lists: each vector in its nAssign nearest centroids' lists
    val na = nAssign
    val assigned = corpus.flatMap { case (id, v) =>
      nearestCentroids(v, na).map(c => (c, id, v))
    }.toDF("centroid", "id", "vec")
    // queries probe nProbe lists
    val probes = corpus.flatMap { case (qid, qv) =>
      nearestCentroids(qv, nProbe).map(c => (c, qid, qv))
    }.toDF("centroid", "query_id", "qvec")
    val scored = probes.join(assigned, "centroid")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        graft.Functions.cosine_sim(col("qvec"), col("vec")).as("cos"))
    // with nAssign == 1 every (query, id) pair occurs at most once (a
    // corpus vector lives in exactly one list) — skip the dedupe shuffle
    val pairs = if (nAssign == 1) scored
      else scored.groupBy("query_id", "id").agg(max("cos").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed). */
  private def hyperplanes(tables: Int, nBits: Int, dim: Int): Array[Array[Array[Float]]] =
    Array.tabulate(tables, nBits, dim) { (t, b, d) =>
      val h = graft.functions.Hashing.mix64(
        (t.toLong << 42) ^ (b.toLong << 21) ^ d.toLong ^ 0x1234abcdL)
      // map to [-1, 1)
      (h.toDouble / Long.MaxValue.toDouble).toFloat
    }

}
