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
    *         quarantine list, not a full-corpus report).
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, n: Int = 3, minShared: Int = 1): DataFrame = {
    val corpusShingles = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("shingle"))
    val benchShingles = bench
      .select(explode(shingles(col(textCol), n)).as("shingle")).distinct()
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
      .orderBy("doc_id")
  }
}
