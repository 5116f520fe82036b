package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, DocFingerprint, Hash64Str, HashEmbed, MinHashSig, RepetitionStats, SimHash64, WordShingles}

/** Column-level API + SQL registration for graft's native
  * Catalyst expressions. Everything here is deterministic and
  * codegen-friendly; prefer these over Scala UDFs (SURVEY.md §2.10).
  */
object Functions {

  /** Cosine similarity of two array<float> columns; nulls -> 0.0
    * (reference semantic_retrievers.py:37-42). Native codegen path. */
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Pure-builtin cosine via zip_with + aggregate — the
    * cross-validation twin of [[cosine_sim]] (same semantics,
    * allocates an intermediate array; kept for tests + as the
    * form usable from plain SQL strings). */
  def cosine_sim_sql(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v * v)
    when(a.isNull || b.isNull, lit(0.0))
      .otherwise(when(na === 0.0 || nb === 0.0, lit(0.0))
        .otherwise(dot / (sqrt(na) * sqrt(nb))))
  }

  /** MinHash signature (array<bigint>) of word-3-gram shingles. */
  def minhash_sig(text: Column, numHashes: Int = 64): Column =
    column(MinHashSig(expression(text), numHashes))

  /** 64-bit SimHash of the token stream. */
  def simhash64(text: Column): Column = column(SimHash64(expression(text)))

  /** Deterministic feature-hashing embedding (array<float>). */
  def hash_embed(text: Column, dim: Int = graft.functions.Vectorizer.DefaultDim): Column =
    column(HashEmbed(expression(text), dim))

  /** Order-sensitive rolling-hash document fingerprint. */
  def doc_fingerprint(text: Column): Column = column(DocFingerprint(expression(text)))

  /** Distinct word n-gram shingles (array<string>) of the
    * SQL-normalized token stream; < n tokens -> empty. Native
    * single-pass twin of the `transform(sequence(...))` formulation
    * (byte-identical output, same DuckDB oracle — FunctionsSpec pins
    * the parity). */
  def word_shingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  /** Single-pass line-repetition quality signals:
    * struct(n_lines, dup_line_frac, dup_line_char_frac). */
  def repetition_stats(text: Column): Column =
    column(RepetitionStats(expression(text)))

  /** Engine-portable 64-bit string hash (FNV-1a + splitmix64). Use
    * instead of xxhash64 wherever the hash participates in an
    * externally-verifiable contract (oracle checks, cross-engine
    * reproducibility) — Spark's xxhash64 is not reproducible outside
    * the JVM without reimplementing its UTF8String layout hashing. */
  def hash64_str(text: Column): Column = column(Hash64Str(expression(text)))

  /** RLIKE with a per-task compiled-pattern cache — for non-foldable
    * pattern columns over a small pattern domain (Spark's `RLike`
    * recompiles per row when the pattern isn't a literal). */
  def rlike_cached(text: Column, pattern: Column): Column =
    column(graft.functions.RegexLikeCached(
      expression(text), expression(pattern)))

  /** Ordered word-bounded containment: text has occurrences of every
    * part in order — the linear-scan twin of `\bp₁\b.*\bp₂\b…`. */
  def ordered_terms(text: Column, parts: Column): Column =
    column(graft.functions.OrderedTerms(
      expression(text), expression(parts)))

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Normalized surface form: lower + trim + collapse whitespace —
    * the join key used throughout the match ladder (mirrors
    * reference exact_match.py:76,80 normalization). */
  def norm_text(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Register the expressions for SQL use on a live session — the
    * programmatic twin of the `spark.sql.extensions` config path;
    * both consume the same builder tuples ([[GraftExtensions]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }
}
