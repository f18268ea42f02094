package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-accounting result mirroring the reference's MERGE result row
 *  (ref: connector/snowpark_connector.py:880-908, models/custom_models.py:158-209).
 *  Call `cleanup()` after persisting `result` — the classified intermediate
 *  frame is cached so counts and rewrite share one materialization. */
final case class UpsertResult(
    inserted: Long, updated: Long, deleted: Long, result: DataFrame,
    private val cached: Option[DataFrame] = None) {
  def cleanup(): Unit = cached.foreach(_.unpersist())
}

/**
 * M1 — MERGE/upsert on immutable storage, re-expressed as a single
 * full-outer join + per-row classification
 * (ref: connector/snowpark_connector.py:607-688 upsert,
 *  :919-1004 merge-SQL builder, tools/datamart_utils.py:128-180).
 *
 * Semantics carried over:
 *  - ON keys; WHEN MATCHED [AND cond] THEN UPDATE (update columns default to
 *    non-key source∩target columns, ref: connector/snowpark_connector.py:841-852);
 *    conditions reference columns via `Upsert.source("c")` / `Upsert.target("c")`
 *    (both sides carry every column, so bare names would be ambiguous);
 *  - WHEN NOT MATCHED [AND cond] THEN INSERT (insert columns default to
 *    source∩target columns);
 *  - optional WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE;
 *  - exact inserted/updated/deleted counts returned.
 *
 * Scale notes: one shuffle on the merge keys (sort-merge join); AQE handles
 * skew. The classified frame is computed once and reused for both the counts
 * and the rewritten table (caller persists `result`; the reference stages the
 * source the same way, ref: connector/snowpark_connector.py:646-665).
 * No driver-side row handling at any size.
 */
object Upsert {

  /** Reference a SOURCE column inside a merge condition
    * (`matchedCondition = Some(Upsert.source("m") > 15)`). */
  def source(c: String): Column = col("__s_" + c)

  /** Reference a TARGET column inside a merge condition. */
  def target(c: String): Column = col("__t_" + c)

  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Option[Seq[String]] = None,
      insertCols: Option[Seq[String]] = None,
      matchedCondition: Option[Column] = None,
      notMatchedCondition: Option[Column] = None,
      deleteNotMatchedBySource: Option[Column] = None): UpsertResult = {

    val common = target.columns.toSet.intersect(source.columns.toSet)
    val upCols = updateCols.getOrElse((common -- keys).toSeq.sorted)
    val inCols = insertCols.getOrElse(common.toSeq.sorted)
    val targetCols = target.columns.toSeq

    // constant-true markers, NOT key nullability, detect side presence after
    // the full outer join: an all-null-key row would otherwise look absent
    // from its own side and fall through to the wrong branch. Marker names
    // live OUTSIDE the __t_*/__s_* rename namespace — a real column named
    // "present" renames to __t_present, which a marker of the same name
    // would silently overwrite
    val t = targetCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, "__t_" + c))
      .withColumn("__present_t", lit(true))
    val s = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, "__s_" + c))
      .withColumn("__present_s", lit(true))
    // SQL-MERGE key semantics (`ON t.k = s.k`, ref:
    // connector/snowpark_connector.py:950-954): NULL keys never match, so a
    // null-keyed source row INSERTS rather than updating a null-keyed target
    // row, and a null-keyed target row is "not matched by source"
    val joinExpr = keys.map(k => t("__t_" + k) === s("__s_" + k)).reduce(_ && _)
    val joined = t.join(s, joinExpr, "full_outer")

    val tPresent = col("__present_t").isNotNull
    val sPresent = col("__present_s").isNotNull
    val matchedCond = matchedCondition.getOrElse(lit(true))
    val notMatchedCond = notMatchedCondition.getOrElse(lit(true))

    // row classes: update / insert / delete / keep / skip-source-only
    val classified = joined.withColumn("__class",
      when(tPresent && sPresent && matchedCond, "update")
        .when(tPresent && sPresent, "keep") // matched but condition false
        .when(!tPresent && sPresent && notMatchedCond, "insert")
        .when(!tPresent && sPresent, "skip")
        .when(tPresent && !sPresent &&
          deleteNotMatchedBySource.getOrElse(lit(false)), "delete")
        .otherwise("keep"))
      .persist()

    val counts = classified.groupBy("__class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val kept = classified.filter(col("__class").isin("update", "insert", "keep"))
    val result = kept.select(targetCols.map { c =>
      if (!common.contains(c)) col("__t_" + c).as(c) // target-only column
      else {
        val fromSource =
          (col("__class") === "update" && lit(upCols.contains(c))) ||
          (col("__class") === "insert" && lit(inCols.contains(c) || keys.contains(c)))
        when(fromSource, col("__s_" + c)).otherwise(col("__t_" + c)).as(c)
      }
    }: _*)

    UpsertResult(
      inserted = counts.getOrElse("insert", 0L),
      updated = counts.getOrElse("update", 0L),
      deleted = counts.getOrElse("delete", 0L),
      result = result,
      cached = Some(classified))
  }
}
