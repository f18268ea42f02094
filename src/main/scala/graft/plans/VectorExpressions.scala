package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/**
 * Native Catalyst expressions for the embedding hot path. The composable
 * `aggregate(zip_with(...))` formulation is semantically identical but each
 * higher-order lambda is interpreted per element per row; these generate a
 * tight primitive loop inside whole-stage codegen instead — the
 * "custom Expression beats UDF beats everything else" tier for operators
 * Spark's built-ins can't express efficiently.
 *
 * Semantics mirror the composable forms exactly (verified in PlansSpec):
 *  - null input → null; mismatched lengths or null element → null result
 *    (zip_with pads with null, null poisons the sum);
 *  - quantization = floor(float→double * 1e7) as long, per element.
 */
case class DotProductQ(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  // introduces nulls beyond input nullability (length mismatch, null
  // element) — without this override a non-nullable schema would surface
  // the folded null as 0
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var s = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  // every local goes through ctx.freshName: with two instances in one
  // codegen scope and non-nullable children, nullSafeCodeGen splices the
  // blocks unbraced — fixed names would declare duplicate Java locals,
  // fail janino, and silently fall back to interpreted evaluation
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("sum")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}

/**
 * The ADC inner loop — `sum over s of lut[s][codes[s]]` — as one tight
 * codegen'd loop. This is THE hot expression of the PQ/IVFPQ probes: a
 * batch-dedup night evaluates it corpus×queries/cells times (billions at
 * 1M docs — SCALE.md round-14), and the composable form
 * `aggregate(zip_with(lut, codes, (l, c) => element_at(l, c + 1)), …)`
 * interprets three lambdas per subspace per evaluation.
 *
 * Null semantics mirror that composable form for null and NON-NEGATIVE
 * inputs (PlansSpec-pinned): null lut/codes → null; length mismatch, null
 * subspace table, null code, or null table entry → null (zip_with pads
 * with null and a null poisons the sum); a code past the table's end →
 * null. The forms INTENTIONALLY diverge on a NEGATIVE code: the HOF's
 * `element_at(lut[s], c + 1)` throws at index 0 (c = -1) and indexes from
 * the END of the table for c <= -2 (a wrong non-null score), while this
 * expression returns null — the safer total behavior. Codes outside
 * [0, ksub) only occur on a corrupted or drift-bypassed index, and the
 * drift markers are the guard that THROWS; the scorer stays total so one
 * bad row cannot kill a billion-row probe (the negative case is pinned in
 * PlansSpec as a documented divergence).
 */
case class AdcScoreQ(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<double>>, array<int>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null beyond input nullability
  override def prettyName: String = "adc_score_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = lut.numElements()
    if (n != codes.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (lut.isNullAt(i) || codes.isNullAt(i)) return null
      val table = lut.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= table.numElements() || table.isNullAt(c)) return null
      s += table.getDouble(c)
      i += 1
    }
    s
  }

  // locals via ctx.freshName — with non-nullable children nullSafeCodeGen
  // splices the block unbraced, so two adc_score_q instances in one scope
  // with fixed names would duplicate Java locals, fail janino compilation,
  // and silently fall back to interpreted evaluation on the very
  // expression this class exists to speed up
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = classOf[ArrayData].getName
    val n = ctx.freshName("n")
    val s = ctx.freshName("sum")
    val i = ctx.freshName("i")
    val t = ctx.freshName("table")
    val c = ctx.freshName("code")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $ad $t = $a.getArray($i);
         |    int $c = $b.getInt($i);
         |    if ($c < 0 || $c >= $t.numElements() || $t.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $t.getDouble($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreQ =
    copy(left = newLeft, right = newRight)
}

/** floor(x * 1e7) per float component, as long — `Vectors.quantize` native. */
case class QuantizeVector(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> input, got ${other.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_vector"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (x.isNullAt(i)) null
        else Math.floor(x.getFloat(i).toDouble * 1.0e7).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  // ctx.freshName locals — same unbraced-splice duplicate-declaration
  // hazard as AdcScoreQ when two instances share a codegen scope
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1.0E7);
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}
