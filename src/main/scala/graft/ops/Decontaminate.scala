package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions

/** Benchmark decontamination — the training-data operator that keeps
  * eval sets out of the corpus: flag every corpus document sharing
  * word n-gram shingles with any document of a (small) benchmark set.
  * This is the standard n-gram-overlap decontamination used by
  * large-corpus pipelines; exact-match variants are a special case
  * (n = document length).
  *
  * Scale shape: the benchmark side is tiny by construction (eval sets
  * are thousands of docs vs a 10^12-doc corpus), so its distinct
  * shingle set is explicitly `broadcast()` — the corpus-side scan
  * stays map-only (shingle explode + broadcast semi-ish inner join),
  * and only the matched slice (rare) reaches the per-doc aggregation
  * shuffle. Nothing here is ever corpus×corpus.
  */
object Decontaminate {

  /** Distinct word n-gram shingles of a normalized text column.
    * Documents shorter than n tokens produce no shingles (they cannot
    * contain an n-gram; callers wanting short-doc protection lower n).
    *
    * Native single-pass expression. The original pure-builtin tree —
    * `array_distinct(transform(sequence(1, size(toks)-(n-1)),
    * i => array_join(slice(toks, i, n), " ")))` — re-evaluated the
    * normalize+split subtree once PER LAMBDA ELEMENT (higher-order
    * functions don't cache outer subexpressions in interpreted eval)
    * and again inside the join-key null filter Catalyst pushes below
    * the explode: ~3 tree evaluations × O(tokens) regex+split each ⇒
    * O(tokens²) regex work per row (measured 9.4 s for 5k docs; the
    * native form is two orders cheaper, byte-identical output —
    * parity pinned in FunctionsSpec, same DuckDB oracle). */
  def shingles(text: Column, n: Int): Column =
    Functions.word_shingles(text, n)

  /** Per-corpus-doc contamination report against `bench`.
    *
    * @param docs   corpus (idCol, textCol)
    * @param bench  benchmark/eval set (same columns; typically tiny)
    * @param n      shingle width in tokens
    * @param minShared report a doc once it shares at least this many
    *                  distinct shingles with the benchmark union
    * @return (doc_id, n_shingles, n_shared, contamination) —
    *         contamination = n_shared / n_shingles, rounded to 4dp;
    *         only docs with n_shared >= minShared are returned (the
    *         quarantine list, not a full-corpus report). Unordered:
    *         the quarantine consumer (an anti-join against the
    *         corpus) never needs a total sort — oracle-compared
    *         callers add their own `orderBy`.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, n: Int = 3, minShared: Int = 1): DataFrame = {
    // shingles travel as xxhash64 (guide §2.3 narrow keys): the
    // broadcast bench set and the probe join carry 8-byte fixed keys
    // instead of ~30-byte strings — per-doc shared counts unchanged
    // absent a 64-bit collision (needs ~2^32 distinct shingles for
    // birthday-50%; value-verified against the exact-string oracle)
    val corpusShingles = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("_sh"))
      .select(col("doc_id"), col("n_shingles"), xxhash64(col("_sh")).as("shingle"))
    val benchShingles = bench
      .select(explode(shingles(col(textCol), n)).as("_sh"))
      .select(xxhash64(col("_sh")).as("shingle")).distinct()
    // corpus shingles are per-doc distinct and the bench set is
    // distinct, so post-join rows are unique (doc_id, shingle) pairs:
    // a plain count (map-side partial agg) equals countDistinct
    corpusShingles.join(broadcast(benchShingles), "shingle")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_shingles"), 4))
      .select("doc_id", "n_shingles", "n_shared", "contamination")
  }

  /** Bloom-filter contamination PREfilter: the shape [[report]] takes
    * when the benchmark shingle set is too large to broadcast as
    * strings but its BIT SET still fits everywhere — k hash probes
    * into an m-bit filter, a candidate shingle "hits" iff all k of
    * its bit positions are set. One-sided by construction: every true
    * match hits (no false negatives), a false-positive rate of
    * ~(occupancy)^k lets through a few extras — so the cheap bloom
    * pass quarantines candidates and the exact [[report]] join runs
    * only on the survivors. Returned per doc: bloom hits alongside
    * exact hits, so the false-positive overshoot is observable (and
    * oracle-pinned: the k positions are disjoint log2(m)-bit slices
    * of the shingle's 64-bit hash, bit-exact in DuckDB HUGEINT).
    *
    * The filter is materialized RELATIONALLY as its ≤ m distinct set
    * positions — a DataFrame Catalyst broadcasts like any dimension —
    * keeping the probe join inside whole-stage codegen; packing the
    * same positions into Array[Long] words for a closure-side test is
    * the constant-factor variant of the identical plan.
    *
    * @param mBits log2 of filter size (positions in [0, 2^mBits));
    *              k·mBits ≤ 64 so slices stay disjoint
    * @return (doc_id, n_shingles, n_bloom_hits, n_exact_hits) for
    *         docs with ≥ 1 bloom hit; n_bloom_hits ≥ n_exact_hits
    */
  def bloomReport(docs: DataFrame, idCol: String, textCol: String,
                  bench: DataFrame, n: Int = 3,
                  mBits: Int = 16, k: Int = 3): DataFrame = {
    require(k >= 1 && mBits >= 1 && k * mBits <= 64,
      s"need k*mBits <= 64, got k=$k mBits=$mBits")
    val mask = (1L << mBits) - 1
    def positions(shingleCol: Column): Column = {
      val h = Functions.hash64_str(shingleCol)
      array((0 until k).map(j =>
        shiftrightunsigned(h, j * mBits).bitwiseAND(lit(mask))): _*)
    }
    val benchSh = bench
      .select(explode(shingles(col(textCol), n)).as("shingle")).distinct()
    // the filter: distinct set bit positions (<= min(2^mBits, k*|bench|))
    val filterBits = benchSh
      .select(explode(positions(col("shingle"))).as("bit")).distinct()
    val corpus = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("shingle"))
    // bloom hit = ALL k probe positions present in the filter. The
    // probe POSITIONS are pinned over hash64_str of the original
    // shingle string (oracle-replayed cells), but once computed, the
    // per-shingle grouping and the exact-side join only need shingle
    // IDENTITY — carried as xxhash64 (guide §2.3 narrow keys; counts
    // unchanged absent a 64-bit collision, value-verified vs the
    // exact-string oracle).
    val bloomHits = corpus
      .select(col("doc_id"), col("n_shingles"),
        xxhash64(col("shingle")).as("shingle_h"),
        explode(positions(col("shingle"))).as("bit"))
      .join(broadcast(filterBits), "bit")
      .groupBy(col("doc_id"), col("n_shingles"), col("shingle_h"))
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === k)
    val exact = corpus
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle_h"))
      // distinct AFTER hashing (mirrors report()): two bench shingles
      // colliding on xxhash64 must not double-join a corpus shingle —
      // that could inflate n_exact_hits past n_bloom_hits
      .join(broadcast(benchSh.select(xxhash64(col("shingle")).as("shingle_h"))
        .distinct()), "shingle_h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_exact_hits"))
    bloomHits
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_bloom_hits"))
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
        coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"))
  }
}
