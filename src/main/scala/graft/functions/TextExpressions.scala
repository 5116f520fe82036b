package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar expressions for the dedup / fingerprint operators. These
  * are single-pass native expressions (no Scala UDF boxing); they use
  * CodegenFallback because each is called once per row on a string —
  * the surrounding joins/aggregations stay in whole-stage codegen.
  */

/** minhash_sig(text, k): MinHash signature (array<bigint>) of the
  * document's word 3-gram shingle set. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(Hashing.minHash(Hashing.wordShingles(text, 3).iterator, numHashes))
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** simhash64(text): 64-bit SimHash of the token stream. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Hashing.simHash64(Hashing.tokenize(input.asInstanceOf[UTF8String].toString).iterator)
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** hash_embed(text, dim): deterministic feature-hashing embedding
  * (array<float>), the local stand-in for the reference's ada-002
  * call (reference semantic_retrievers.py:23-35). */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hash_embed expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Vectorizer.vectorize(input.asInstanceOf[UTF8String].toString, dim))
  override protected def withNewChildInternal(c: Expression): HashEmbed = copy(child = c)
  override def prettyName: String = "hash_embed"
}

/** hash64(text): FNV-1a 64-bit + splitmix64 finalizer over UTF-8
  * bytes — the engine-portable deterministic hash (reproducible in
  * any engine with 64-bit modular arithmetic, unlike xxhash64 whose
  * Spark flavor hashes internal representations). Used wherever a
  * hash value is part of an externally-checkable contract: IVF
  * centroid seeding order, synthetic media dimensions. */
case class Hash64Str(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hash64 expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Hashing.hash64(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Hash64Str = copy(child = c)
  override def prettyName: String = "hash64"
}

/** word_shingles(text, n): distinct word n-gram shingles of the
  * SQL-normalized token stream (array<string>), first-occurrence
  * order; < n tokens -> empty array. One pass per row — replaces a
  * higher-order-function Column tree whose lambda re-evaluated the
  * normalize+split subtree per element (see Hashing.sqlWordShingles).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"word_shingles expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Hashing.sqlWordShingles(input.asInstanceOf[UTF8String].toString, n)
        .map(UTF8String.fromString))
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** repetition_stats(text): single-pass line-repetition quality
  * signals (the Gopher-rules family — Rae et al. 2021, "Scaling
  * Language Models", table A1 — is public knowledge):
  * struct(n_lines, dup_line_frac, dup_line_char_frac) where
  *  - n_lines          = count of '\n'-split lines (raw, untrimmed);
  *  - dup_line_frac    = 1 - distinct_lines / n_lines;
  *  - dup_line_char_frac = chars in repeat occurrences beyond each
  *    line's first / total line chars (0.0 when total is 0).
  * Map-only by construction: a per-doc signal must never shuffle the
  * corpus; one hash map over the doc's own lines replaces an
  * explode + (doc_id, line) groupBy.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"repetition_stats expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val lines = input.asInstanceOf[UTF8String].toString.split("\n", -1)
    val counts = new java.util.HashMap[String, Int]
    var totalChars = 0L
    var dupChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      totalChars += l.length
      val seen = counts.merge(l, 1, Integer.sum)
      if (seen > 1) dupChars += l.length
      i += 1
    }
    val n = lines.length
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n,
      1.0 - counts.size.toDouble / n,
      if (totalChars == 0L) 0.0 else dupChars.toDouble / totalChars))
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** rlike_cached(text, pattern): RLIKE for NON-FOLDABLE pattern
  * columns drawn from a SMALL domain. Spark's own `RLike` compiles
  * the regex per ROW when the pattern isn't a literal — for a
  * pattern-table join (relation extraction: |dict|² × |keywords|
  * distinct patterns over millions of candidate rows) that is >95%
  * of the operator's cost. This twin keeps a per-task compiled-
  * pattern cache (the expression deserializes per task, so the map
  * is task-local — no sharing, no locks) and matches `RLike`'s
  * semantics exactly (`Pattern.matcher(str).find(0)`).
  *
  * The cache clears if it ever exceeds [[RegexLikeCached.MaxCache]]
  * distinct patterns — a task fed genuinely unbounded pattern
  * strings degrades to compile-per-row instead of leaking memory. */
case class RegexLikeCached(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rlike_cached expects (string, string), got (${l.catalogString}, ${r.catalogString})")
    }
  // ConcurrentHashMap: tasks normally deserialize their own instance,
  // but nothing guarantees single-threaded evaluation (subexpression
  // reuse, driver-side constant folding in local mode) — a plain
  // HashMap could be corrupted by a concurrent put/clear. Compiled
  // Patterns are immutable and thread-safe to share.
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  override protected def nullSafeEval(text: Any, pattern: Any): Any = {
    val ps = pattern.asInstanceOf[UTF8String].toString
    var p = cache.get(ps)
    if (p == null) {
      if (cache.size >= RegexLikeCached.MaxCache) cache.clear()
      p = java.util.regex.Pattern.compile(ps)
      cache.putIfAbsent(ps, p)
    }
    p.matcher(text.asInstanceOf[UTF8String].toString).find(0)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RegexLikeCached = copy(left = l, right = r)
  override def prettyName: String = "rlike_cached"
}

object RegexLikeCached {
  val MaxCache = 10000
}

/** ordered_terms(text, array(p₁..pₙ)): true iff some newline-free
  * SEGMENT of text contains word-bounded occurrences of p₁..pₙ in
  * order (occurrence i+1 starts at or after the end of occurrence i)
  * — the linear-scan equivalent of `\bp₁\b.*\bp₂\b…` whose
  * backtracking makes the regex O(n²) per candidate (measured >70%
  * of relation-extraction cost at sf0.1). Regex `.` matches no
  * newline (Java and RE2 alike), so a regex witness lies entirely
  * within one line — the scan therefore restarts at every '\n',
  * matching `rlike` on multi-line text too (parity property-tested
  * with embedded newlines in FunctionsSpec). Known residual
  * divergences, both outside the operator's domain: parts containing
  * '\n' (dictionary terms never do; here they return false), and
  * Java's extra line terminators (CR, NEL, LS, PS) which
  * RE2 does not treat specially either. Empty parts are rejected
  * (false) rather than trivially accepted. Greedy leftmost
  * occurrences are complete for existence within a segment: the
  * first occurrence of pᵢ ends earliest, so any witness sequence can
  * be shifted left part by part. Word boundary = regex `\b`:
  * [a-zA-Z0-9_] on one side only. */
case class OrderedTerms(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ordered_terms expects (string, array<string>), got (${l.catalogString}, ${r.catalogString})")
    }
  @inline private def w(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  /** Leftmost word-bounded occurrence of `term` in text[from, limit),
    * or -1. `limit` is the current segment's end ('\n' or EOS). */
  private def findBounded(text: String, from: Int, limit: Int, term: String): Int = {
    var i = text.indexOf(term, from)
    while (i >= 0 && i + term.length <= limit) {
      // \b = XOR of word-ness across the edge (string edges non-word)
      val okL = (i > 0 && w(text.charAt(i - 1))) != w(term.charAt(0))
      val e = i + term.length
      val okR = (e < text.length && w(text.charAt(e))) != w(term.charAt(term.length - 1))
      if (okL && okR) return i
      i = text.indexOf(term, i + 1)
    }
    -1
  }
  /** Greedy ordered scan within one newline-free segment. */
  private def matchSegment(t: String, segStart: Int, segEnd: Int,
                           parts: Array[String]): Boolean = {
    var pos = segStart
    var k = 0
    while (k < parts.length) {
      val i = findBounded(t, pos, segEnd, parts(k))
      if (i < 0) return false
      pos = i + parts(k).length
      k += 1
    }
    true
  }
  override protected def nullSafeEval(text: Any, parts: Any): Any = {
    val t = text.asInstanceOf[UTF8String].toString
    val arr = parts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ps = new Array[String](arr.numElements())
    var k = 0
    while (k < ps.length) {
      if (arr.isNullAt(k)) return null
      val p = arr.getUTF8String(k).toString
      if (p.isEmpty) return false // rejected: `\b\b` has no clean analog
      ps(k) = p
      k += 1
    }
    // a regex witness never crosses '\n' (`.` excludes it): try each
    // newline-delimited segment independently
    var segStart = 0
    while (segStart <= t.length) {
      val nl = t.indexOf('\n', segStart)
      val segEnd = if (nl < 0) t.length else nl
      if (matchSegment(t, segStart, segEnd, ps)) return true
      if (nl < 0) return false
      segStart = nl + 1
    }
    false
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): OrderedTerms = copy(left = l, right = r)
  override def prettyName: String = "ordered_terms"
}

/** doc_fingerprint(text): order-sensitive polynomial rolling hash. */
case class DocFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"doc_fingerprint expects string, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Hashing.rollingFingerprint(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(child = c)
  override def prettyName: String = "doc_fingerprint"
}
