package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Large-scale training-data deduplication operators. Every variant
  * returns a DataFrame (no driver-side loops) and is designed around
  * the shuffle it actually needs:
  *
  *  - exact: one hash-groupBy (map-side partial agg -> tiny shuffle);
  *  - MinHash+LSH: shingle -> signature (narrow) -> band explode ->
  *    bucket self-join (shuffle bounded by bucket sizes, the point of
  *    banding: candidate pairs only, never all-pairs);
  *  - SimHash: 4x16-bit chunk blocking (a pair within hamming<=3 of a
  *    64-bit sketch shares at least one exact chunk — pigeonhole);
  *  - n-gram Jaccard: inverted-index join on rare shingles;
  *  - embedding cosine: blocked pairwise scoring.
  *
  * All pair outputs are canonical (id_a < id_b) and deterministic as
  * SETS. Operators do NOT impose a global output order: a total sort
  * is a range-partition exchange the production consumer (CC
  * clustering, a survivor filter, a sink) almost never needs at
  * 100 TB pair volume — callers that require a stable row order (the
  * oracle-compared catalog entries) add their own `orderBy`, exactly
  * like every other determinism device lives in the wrappers.
  */
object Dedup {

  /** Exact dedup: survivor (min id) + duplicate count per content hash. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Near-dup candidate pairs via MinHash + LSH banding, verified by
    * full-signature agreement >= `threshold`. */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = docs.select(col(idCol).as("id"),
      Functions.minhash_sig(col(textCol), numHashes).as("sig"))
    // band key = (band index, hash of the band's rows)
    val banded = sig.select(col("id"), col("sig"),
        posexplode(bandArray(col("sig"), bands, rowsPerBand)).as(Seq("band", "band_sig")))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_sig"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sigAgreement(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** The production near-dup pipeline shape at 100 TB: LSH-then-verify.
    * MinHash banding proposes candidate pairs (bucket self-join —
    * never all-pairs), the signature estimate prunes them at
    * `estThreshold`, and the EXACT distinct-token Jaccard is computed
    * only on the survivors, keeping pairs >= `threshold`. Compared to
    * [[ngramJaccard]] (exact, prefix-filtered inverted index), this
    * trades a bounded recall loss (a true pair all bands miss) for
    * candidate generation that scales with bucket collisions instead
    * of document-frequency lists — the variant that wins when the
    * corpus shares a heavy vocabulary. Output: (id_a, id_b,
    * est_jaccard, jaccard), canonical id_a < id_b. */
  def lshVerified(docs: DataFrame, idCol: String, textCol: String,
                  numHashes: Int = 64, bands: Int = 16,
                  estThreshold: Double = 0.5, threshold: Double = 0.7): DataFrame = {
    val cand = minHashLsh(docs, idCol, textCol, numHashes, bands, estThreshold)
    verifyJaccard(cand, explodedTokens(docs, idCol, textCol), threshold,
        carryCols = Seq("est_jaccard"))
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** (id, ntok, token): distinct normalized tokens exploded per doc —
    * the single definition of "token set" every exact-Jaccard verify
    * (and its DuckDB twin) agrees on. The token travels as its
    * xxhash64 (guide §2.3 narrow keys: 8-byte fixed join/groupBy keys
    * instead of strings on every shuffle side of the inverted index
    * and the verify join; set cardinalities — ntok, intersections, df
    * — are unchanged absent a 64-bit collision, which needs ~2^32
    * distinct tokens for even birthday-50%; value-verified against
    * the exact-string DuckDB oracles). */
  private def explodedTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      array_distinct(split(Functions.norm_text(col(textCol)), " ")).as("toks"))
      .select(col("id"), size(col("toks")).as("ntok"),
        explode(col("toks")).as("_tok"))
      .select(col("id"), col("ntok"), xxhash64(col("_tok")).as("token"))

  /** Exact token-set Jaccard on candidate pairs only: join the token
    * table on both sides, count shared tokens (row-based codegen hash
    * agg — no array payloads in the shuffle), keep >= threshold.
    * `carryCols` ride from `cand` through the groupBy. */
  private def verifyJaccard(cand: DataFrame, toks: DataFrame, threshold: Double,
                            carryCols: Seq[String] = Seq.empty): DataFrame = {
    val a = toks.select(col("id").as("id_a"), col("ntok").as("ntok_a"), col("token"))
    val b = toks.select(col("id").as("id_b"), col("ntok").as("ntok_b"), col("token"))
    cand.join(a, "id_a").join(b, Seq("id_b", "token"))
      .groupBy((Seq("id_a", "id_b", "ntok_a", "ntok_b") ++ carryCols).map(col): _*)
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("ntok_a") + col("ntok_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
  }

  /** Split a signature array into `bands` arrays of `rows` elements,
    * hashing each band to one long (xxhash64 over the slice). */
  private def bandArray(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { bIdx =>
      xxhash64(concat_ws(":", slice(sig, bIdx * rows + 1, rows)))
    }: _*)

  /** Fraction of agreeing signature positions = unbiased Jaccard
    * estimate. */
  private def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** SimHash near-dup pairs with hamming distance <= maxHamming.
    * Blocking: 4 chunks of 16 bits; hamming<=3 implies one identical
    * chunk (pigeonhole), so the self-join runs per chunk bucket. */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is exact only for hamming<=3")
    val sh = docs.select(col(idCol).as("id"),
      Functions.simhash64(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = chunked.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("chunk"), col("chunk_val"))
    val b = chunked.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Functions.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Token-set Jaccard >= threshold via PREFIX-FILTERED inverted-index
    * join (exact — no candidate with jaccard >= threshold is missed):
    *
    * Prefix-filter argument: order all tokens globally by ascending
    * document frequency (rarest first; ties by token). If
    * jaccard(A,B) >= t then |A∩B| >= t/(1+t)·(|A|+|B|) > |A| - p where
    * p = floor((1-t)·|A|) + 1, so A and B must share at least one
    * token among the p RAREST tokens of A (its "prefix") — indexing
    * only prefixes finds every qualifying pair. A ubiquitous token
    * (stopword) lands in a doc's prefix only when nearly all of the
    * doc's tokens are ubiquitous, so the O(df²) pair explosion of a
    * naive inverted index is structurally avoided; candidate pairs are
    * then verified with the exact Jaccard over full token sets. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8): DataFrame = {
    val toks = explodedTokens(docs, idCol, textCol)
    val cand = prefixCandidates(toks, threshold).select("id_a", "id_b")
    verifyJaccard(cand, toks, threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Candidate pairs (id_a, id_b, ntok_a, ntok_b) from the
    * prefix-filtered inverted index — a guaranteed superset of all
    * pairs with jaccard >= threshold (exposed so tests can assert the
    * candidate count stays bounded on stopword-heavy corpora).
    * Input: (id, ntok, token) exploded distinct tokens. */
  def prefixCandidates(toks: DataFrame, threshold: Double): DataFrame = {
    val df = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("token").asc)
    val prefix = toks.join(df, "token")
      .withColumn("pos", row_number().over(w))
      // +1e-9: fp guard so (1-t)*n just below an integer still rounds
      // UP to the exact ⌊(1-t)n⌋ (a larger prefix is always safe)
      .filter(col("pos") <= floor((lit(1.0) - threshold) * col("ntok") + 1e-9) + 1)
      .select(col("id"), col("ntok"), col("token"))
    val a = prefix.select(col("id").as("id_a"), col("ntok").as("ntok_a"), col("token"))
    val b = prefix.select(col("id").as("id_b"), col("ntok").as("ntok_b"), col("token"))
    a.join(b, "token")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ntok_a", "ntok_b")
      .distinct()
  }

  /** Back-compat shim: candidates from (id, toks:array) input. */
  def ngramJaccardCandidates(tokSets: DataFrame, threshold: Double): DataFrame =
    prefixCandidates(
      tokSets.select(col("id"), size(col("toks")).as("ntok"),
        explode(col("toks")).as("token")),
      threshold).select("id_a", "id_b")

  /** Hard ceiling on rows per block in [[embeddingCosine]] — the
    * "blocked, never all-pairs" contract made executable (the same
    * device as [[graft.ops.Ann.MaxBroadcastCorpus]]): within a block
    * the scoring IS deliberately pairwise, so one degenerate block (an
    * empty-text cluster, a near-constant embedding bucket) would go
    * quadratic silently. 100k rows ≈ 5e9 pairs in one block, already
    * far past where Ann.lshTopK/ivfTopK is the right operator. */
  val MaxBlockRows = 100000L

  /** Embedding near-dup pairs: cosine >= threshold, blocked by a
    * coarse partition key (`blockCol`, e.g. a cluster/label id or LSH
    * bucket) so the pairwise join never goes all-pairs global.
    * Guarded: any block larger than `maxBlockRows` fails fast (one
    * cheap two-stage count aggregate over the block keys — never a
    * pair is generated) instead of silently exploding quadratically. */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String,
                      blockCol: String, threshold: Double = 0.95,
                      maxBlockRows: Long = MaxBlockRows): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("vec"), col(blockCol).as("blk"))
    // limit-bounded guard (mirrors Ann.bruteForceTopK): the count job
    // aggregates (blk, n) map-side and stops at the first offender
    val oversized = e.groupBy(col("blk")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockRows).limit(1).collect()
    require(oversized.isEmpty,
      s"embeddingCosine block '${oversized.headOption.map(_.get(0)).orNull}' " +
        s"exceeds $maxBlockRows rows (${oversized.headOption.map(_.get(1)).orNull}): " +
        "within-block scoring is pairwise — use Ann.lshTopK or Ann.ivfTopK " +
        "for blocks this large")
    val a = e.select(col("id").as("id_a"), col("vec").as("vec_a"), col("blk"))
    val b = e.select(col("id").as("id_b"), col("vec").as("vec_b"), col("blk"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Functions.cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** The step every production dedup actually ends with: turn near-dup
    * PAIRS into CLUSTERS and keep one representative per cluster.
    * Near-duplicate similarity is not transitive, so pairs alone
    * under-delete (A~B, B~C but A!~C must still collapse to one kept
    * doc); the standard resolution is connected components over the
    * pair graph (the same large-star/small-star O(log n) rounds the
    * KG canonicalizer uses — [[graft.canon.ConnectedComponents]]).
    *
    * @param pairs (id_a, id_b) near-dup pairs from any upstream
    *              detector ([[lshVerified]], [[ngramJaccard]], ...).
    * @return one row per input doc: (doc_id, canonical_id,
    *         cluster_size, is_canonical) where canonical_id = the
    *         numerically smallest doc id of the component (docs in no
    *         pair are their own singleton cluster). Downstream keeps
    *         `is_canonical` rows and drops the rest.
    *
    * Scale shape: CC runs over near-dup EDGES only (sparse — bounded
    * by detector output, never corpus²). The joins are left unhinted
    * on purpose: at low dup rates AQE converts them to broadcasts, but
    * web corpora routinely carry 30-50% near-dup membership, where the
    * correct plan is a shuffle hash join keyed on doc_id / component —
    * forcing broadcast here would OOM exactly when dedup matters most. */
  def clusterCanonical(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                       idCol: String, pairs: DataFrame): DataFrame = {
    import graft.canon.ConnectedComponents
    val edges = pairs.select(col("id_a").cast("string").as("src"),
      col("id_b").cast("string").as("dst"))
    // component labels are lexicographic-min strings — used only as
    // opaque grouping keys; the canonical id is re-derived numerically.
    // Adaptive CC: near-dup pair sets are tiny next to the corpus
    // (sub-threshold -> driver union-find, one job instead of ~15);
    // past the threshold the O(log n) distributed alternation runs
    val member = ConnectedComponents.runAdaptive(spark, edges)
      .select(col("node").cast("long").as("doc_id"), col("component"))
    // cluster stats derive from the edge-sized membership alone;
    // the corpus is touched by exactly ONE left join (singletons =
    // the null side), never re-aggregated
    val clusters = member.groupBy("component")
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("cluster_size"))
    val enriched = member.join(clusters, "component")
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(enriched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (col("doc_id") === coalesce(col("canonical_id"), col("doc_id")))
          .as("is_canonical"))
  }
}
