package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, DocFingerprint, Hash64Str, HashEmbed, MinHashSig, OrderedTerms, RegexLikeCached, RepetitionStats, SimHash64, Vectorizer, WordShingles}

/** `spark.sql.extensions` entry point: registers graft's native
  * Catalyst expressions as SQL functions at session build time —
  * the spark-submit configuration surface
  * (`--conf spark.sql.extensions=graft.GraftExtensions`,
  * wired in `tools/submit.sh`), so a cluster job can use
  * `cosine_sim` / `minhash_sig` / ... from plain `spark.sql(...)`
  * strings without any programmatic setup. The same builder tuples
  * back [[Functions.register]] for sessions created without the
  * config (single source of truth; `ExtensionsSpec` runs SQL through
  * them and `graft.SqlCheck` proves the config path under a real
  * spark-submit).
  *
  * Unlike `createOrReplaceTempFunction`, `injectFunction` carries an
  * [[ExpressionInfo]], so `DESCRIBE FUNCTION cosine_sim` and
  * `SHOW FUNCTIONS` work — the discoverability contract a SQL user
  * of the reference's Cypher procedures would expect.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type Builder = Seq[Expression] => Expression

  /** Static int parameters (signature width, embedding dim) must be
    * literals: they shape the output TYPE and the broadcast plan, so
    * a per-row value is meaningless. */
  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def arity(fn: String, expected: String, got: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn expects $expected argument(s), got $got")

  private def entry(name: String, cls: Class[_], usage: String)(b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, null, name, usage, ""),
      b)

  /** Every graft SQL function: (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    entry("cosine_sim", classOf[CosineSimilarity],
      "_FUNC_(a, b) - cosine similarity of two array<float> vectors; null/zero-norm -> 0.0") {
      case Seq(a, b) => CosineSimilarity(a, b)
      case other     => arity("cosine_sim", "2", other.size)
    },
    entry("simhash64", classOf[SimHash64],
      "_FUNC_(text) - 64-bit SimHash of the token stream") {
      case Seq(t) => SimHash64(t)
      case other  => arity("simhash64", "1", other.size)
    },
    entry("doc_fingerprint", classOf[DocFingerprint],
      "_FUNC_(text) - order-sensitive polynomial rolling-hash fingerprint") {
      case Seq(t) => DocFingerprint(t)
      case other  => arity("doc_fingerprint", "1", other.size)
    },
    entry("hash64", classOf[Hash64Str],
      "_FUNC_(text) - engine-portable FNV-1a + splitmix64 64-bit hash") {
      case Seq(t) => Hash64Str(t)
      case other  => arity("hash64", "1", other.size)
    },
    entry("minhash_sig", classOf[MinHashSig],
      "_FUNC_(text[, k]) - MinHash signature (array<bigint>, default k=64) of word-3-gram shingles") {
      case Seq(t)    => MinHashSig(t, 64)
      case Seq(t, k) => MinHashSig(t, intLit("minhash_sig", "k", k))
      case other     => arity("minhash_sig", "1 or 2", other.size)
    },
    entry("repetition_stats", classOf[RepetitionStats],
      "_FUNC_(text) - struct(n_lines, dup_line_frac, dup_line_char_frac) line-repetition quality signals") {
      case Seq(t) => RepetitionStats(t)
      case other  => arity("repetition_stats", "1", other.size)
    },
    entry("word_shingles", classOf[WordShingles],
      "_FUNC_(text, n) - distinct word n-gram shingles (array<string>) of the normalized token stream") {
      case Seq(t, n) => WordShingles(t, intLit("word_shingles", "n", n))
      case other     => arity("word_shingles", "2", other.size)
    },
    entry("hash_embed", classOf[HashEmbed],
      s"_FUNC_(text[, dim]) - deterministic feature-hashing embedding (array<float>, default dim=${Vectorizer.DefaultDim})") {
      case Seq(t)    => HashEmbed(t, Vectorizer.DefaultDim)
      case Seq(t, d) => HashEmbed(t, intLit("hash_embed", "dim", d))
      case other     => arity("hash_embed", "1 or 2", other.size)
    },
    entry("rlike_cached", classOf[RegexLikeCached],
      "_FUNC_(text, pattern) - RLIKE with a per-task compiled-pattern cache for non-foldable small-domain patterns") {
      case Seq(t, p) => RegexLikeCached(t, p)
      case other     => arity("rlike_cached", "2", other.size)
    },
    entry("ordered_terms", classOf[OrderedTerms],
      "_FUNC_(text, array(p1..pn)) - true iff text contains word-bounded occurrences of p1..pn in order") {
      case Seq(t, p) => OrderedTerms(t, p)
      case other     => arity("ordered_terms", "2", other.size)
    })
}
