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
