package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two
  * `array<float>` columns, with whole-stage codegen.
  *
  * Semantics match the reference's client-side cosine
  * (reference semantic_retrievers.py:37-42): a null vector on either
  * side yields 0.0 (lines 38-39), zero-norm vectors yield 0.0, and
  * mismatched lengths score over the common prefix. Never null.
  *
  * This is the perf path for broadcast brute-force KNN (the Spark
  * replacement for Neo4j `db.index.vector.queryNodes`,
  * reference semantic_retrievers.py:63-64): the single-pass fused
  * dot/norm loop stays inside WholeStageCodegen, unlike the
  * `zip_with`+`aggregate` SQL form which allocates an intermediate
  * array per row (kept in [[Functions.cosineSimSql]] for
  * cross-validation).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0.0d
    else CosineSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val cls = CosineSimilarity.getClass.getName.stripSuffix("$") + "$"
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.value} = $cls.MODULE$$.compute(${leftGen.value}, ${rightGen.value});
        }
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarity {
  /** Single fused pass: dot product + both norms. Called from both
    * interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // include tail of the longer vector in its own norm
    var j = n
    val an = a.numElements()
    while (j < an) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    j = n
    val bn = b.numElements()
    while (j < bn) { val y = b.getFloat(j).toDouble; nb += y * y; j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
