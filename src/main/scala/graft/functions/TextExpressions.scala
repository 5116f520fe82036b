package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
