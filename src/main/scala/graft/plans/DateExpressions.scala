package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, LongType}

/**
 * Native closed-form working-days count between two dates (inclusive,
 * Mon–Fri; 0 when end < start) — the Catalyst-expression form of
 * `functions.Dates.workingDaysBetween`, used to register the SQL name
 * `fm_workingdaysbetween` (ref: the external warehouse UDF called at
 * sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active_detail.sql:121).
 *
 * A registry builder cannot return the composed Column form (Column→
 * Expression yields unresolved ColumnNode wrappers that never re-enter
 * analysis), so the closed form lives here as one O(1) codegen'd call —
 * NOT the naive O(days) iterate-and-count loop.
 */
case class WorkingDaysBetween(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DateType && right.dataType == DateType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (date, date) inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "working_days_between"

  override def nullSafeEval(a: Any, b: Any): Any =
    WorkingDaysBetween.compute(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, e) => s"graft.plans.WorkingDaysBetween.compute($s, $e)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WorkingDaysBetween =
    copy(left = newLeft, right = newRight)
}

object WorkingDaysBetween {
  /** Same algebra as Dates.workingDaysBetween, over epoch-day ints:
    * full weeks contribute 5 days; the residual window of `rem` days
    * starting on ISO weekday `w` loses one day per weekend day it covers. */
  def compute(s: Int, e: Int): Long = {
    if (e < s) return 0L
    val total = (e - s + 1).toLong
    val weeks = total / 7
    val rem = total % 7
    val w = Math.floorMod(s + 3, 7) + 1 // epoch day 0 = Thursday = ISO 4
    val hitsSat = if (rem > ((6 - w + 7) % 7)) 1L else 0L
    val hitsSun = if (rem > ((7 - w + 7) % 7)) 1L else 0L
    weeks * 5 + rem - hitsSat - hitsSun
  }
}
