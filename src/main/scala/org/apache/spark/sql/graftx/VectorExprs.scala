package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float vectors.
  *
  * Lives under `org.apache.spark.sql` because the required extension
  * surface (`AbstractDataType`, `ExpressionUtils.column`) is
  * `private[sql]` — the usual pattern for Spark extension libraries.
  *
  * Why a custom expression (SURVEY.md §5 preference order): the composable
  * HOF form (`zip_with` + `aggregate`) allocates an intermediate array per
  * row pair and dispatches a lambda per element — measured ~10× slower than
  * DuckDB's tight loop on the knn self-join at sf0.1. This expression
  * participates in whole-stage codegen: one fused loop over both
  * `ArrayData` buffers computing dot and both norms, no allocation.
  *
  * Semantics: elements promoted float→double before multiply (matches
  * DuckDB `list_cosine_similarity(list_transform(e, x -> CAST(x AS
  * DOUBLE)), ...)`), sequential accumulation, dot/(‖a‖·‖b‖). Mismatched
  * vector lengths, null elements, and zero-norm inputs yield NULL — a
  * malformed embedding must not produce a silently-wrong similarity
  * (DuckDB errors on length mismatch; NULL is the non-aborting analog a
  * 100 TB scan needs).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // a null element is malformed input — NULL, not a silent 0 score
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean ${i}_hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${i}_hasNull = true; break; }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (${i}_hasNull || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product over two long-array columns — the coarse
  * scoring loop of the scalar-quantized ANN path (q_baseline_ann_sq). The HOF
  * form (`zip_with` + `aggregate`) is CodegenFallback (lambda dispatch +
  * an intermediate array per pair); this is one fused codegen loop over
  * both buffers, exact 64-bit arithmetic, no allocation — on the pair-join
  * hot path that's the difference between the quantized scan being
  * memory-bandwidth-bound (the point of int8) and lambda-bound.
  *
  * Length mismatch or a null element yields NULL (same contract as
  * [[CosineSimilarityExpr]]: a malformed code must not produce a
  * silently-wrong score). */
case class IntDotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var i = 0
    while (i < n) {
      // a null element is malformed input — NULL, not a silent 0 term
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  boolean ${i}_hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${i}_hasNull = true; break; }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (${i}_hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-API entry point for [[CosineSimilarityExpr]]. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API entry point for [[IntDotProductExpr]]. */
  def intDot(a: Column, b: Column): Column =
    ExpressionUtils.column(IntDotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
