package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Date/business-calendar column functions.
 *
 * `workingDaysBetween` re-expresses the reference's external
 * `FM_WORKINGDAYSBETWEEN(start, end)` scalar UDF
 * (ref: sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active_detail.sql:121)
 * as a *closed-form expression* over built-in functions — no UDF, fully
 * codegen'd, and reproducible in any ANSI engine. Semantics: the number of
 * Mon–Fri days in the inclusive range [start, end]; 0 when end < start.
 */
object Dates {

  /** ISO day-of-week 1=Mon..7=Sun (from dayofweek's 1=Sun..7=Sat). */
  def isoDow(d: Column): Column = ((dayofweek(d) + lit(5)) % lit(7)) + lit(1)

  def workingDaysBetween(start: Column, end: Column): Column = {
    val s = start.cast("date")
    val e = end.cast("date")
    val total = datediff(e, s) + lit(1) // inclusive day count
    val weeks = floor(total / lit(7)).cast("long")
    val rem = (total % lit(7)).cast("long")
    val w = isoDow(s).cast("long") // 1..7 of the first residual day
    // the residual window covers ISO days w .. w+rem-1 (mod 7, 1-based);
    // it contains Saturday(6) iff rem > (6 - w mod 7), similarly Sunday(7)
    val hitsSat = (rem > ((lit(6L) - w + 7L) % 7L)).cast("long")
    val hitsSun = (rem > ((lit(7L) - w + 7L) % 7L)).cast("long")
    when(e < s, lit(0L)).otherwise(weeks * 5L + rem - hitsSat - hitsSun)
  }

  /** End-of-period timestamp with the reference's 23:59:59.997 convention
   *  (ref: sql/.../report_period_config.sql:7-8). */
  def endOfDay997(d: Column): Column =
    timestamp_millis(unix_millis(d.cast("timestamp")) + lit(86399997L))
}
