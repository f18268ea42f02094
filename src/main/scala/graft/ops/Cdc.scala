package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC / effective-dating operator family — the workhorse operators of the
 * reference's warehouse queries (ref: SURVEY.md §2.4).
 *
 * All helpers are single-shuffle window operators: one exchange on the
 * partition keys, then a sorted scan per partition. At 100 TB the shuffle is
 * the cost; none of these ever build a cross product or collect to the
 * driver.
 */
object Cdc {

  /**
   * W1 — "latest version per business key": Snowflake
   * `QUALIFY ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ord...) = 1`
   * (ref: sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active_detail.sql:32,47-50
   *  and docs/KIMBALL_CDC_DATA_DESIGN.md:237). Spark has no QUALIFY, so this
   * is the reusable helper.
   *
   * The ordering must be total per key (e.g. desc(sequenced_at),
   * desc(sequence_no)) or results are nondeterministic.
   */
  def latestVersion(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Common CDC form: version columns (ts desc, seqno desc). */
  def latestVersion(df: DataFrame, keys: Seq[String], versionTs: String, versionNo: String): DataFrame =
    latestVersion(df, keys, Seq(col(versionTs).desc, col(versionNo).desc))

  /**
   * W3 — effective/expiry interval construction from an event sequence:
   * `LEAD(eventTime - gap, 1, '9999-12-31') OVER (PARTITION BY key ORDER BY eventTime)`
   * (ref: ...detail.sql:19-20,302-304). Adds `effCol` = event time and
   * `expCol` = next event time minus `gap`, with the open-ended sentinel for
   * the latest row.
   */
  val SentinelHighDate = "9999-12-31 00:00:00"

  def effectiveIntervals(
      df: DataFrame,
      keys: Seq[String],
      eventTime: String,
      tiebreak: Seq[Column] = Seq.empty,
      effCol: String = "eff_dt",
      expCol: String = "exp_dt",
      gap: String = "INTERVAL 1 MINUTE",
      sentinel: String = SentinelHighDate): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(eventTime).asc +: tiebreak: _*)
    df.withColumn(effCol, col(eventTime))
      .withColumn(expCol,
        coalesce(lead(col(eventTime) - expr(gap), 1).over(w),
          lit(sentinel).cast("timestamp")))
  }

  /**
   * P8 — point-in-time validity predicate with the '9999-12-31' open-end
   * convention (ref: ...detail.sql:78-80): rows valid at `asOf`.
   */
  def validAt(asOf: Column, eff: Column, exp: Column, obsolete: Column = lit(null)): Column = {
    val hi = lit(SentinelHighDate).cast("timestamp")
    (asOf >= eff) &&
      (asOf < coalesce(exp, hi)) &&
      (asOf < coalesce(obsolete, hi))
  }

  /**
   * J10 — as-of join (Kimball Subsystem 16 late-arriving-data matching,
   * ref: docs/KIMBALL_CDC_DATA_DESIGN.md:100-104): for every left row, the
   * most recent right row with the same key and rightTime <= leftTime.
   *
   * Implemented with the union+last_value trick rather than an
   * equi-join + range filter + re-rank: tag both sides, union on a conformed
   * schema, and carry the right payload forward with
   * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time, side)`.
   * One shuffle on the key, no candidate-pair blowup — an equi-join first
   * would materialize |left| × |versions-per-key| rows before re-ranking,
   * which at 100 TB is the difference between a sort and an explosion.
   *
   * Right rows sort before left rows at equal timestamps, so a right row
   * with rightTime == leftTime matches (inclusive as-of).
   */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct so every output column comes from the
    // SAME matched right row — per-column last(ignoreNulls) would replace a
    // genuinely-null payload field with a stale older version's value and
    // could stitch together columns from different versions
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val lSel = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((Seq("__k", "__t", "__side", "__p") ++ leftCols).map(col): _*)
    val rSel = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payloadCols.map(col): _*))
      .select(Seq("__k", "__t", "__side", "__p").map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSel.unionByName(rSel)
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__f").getField(c).as(c)): _*)
  }

  /**
   * J5/J6 — anti-join helpers. SQL `NOT IN (subquery)` returns zero rows when
   * the subquery yields any NULL; `left_anti` does not. We deliberately use
   * anti-join semantics (the reference's evident intent — its NOT IN keys are
   * non-null business keys, ref: ...detail.sql:142) and document the
   * divergence here.
   */
  def antiIn(df: DataFrame, sub: DataFrame, joinExpr: Column): DataFrame =
    df.join(sub, joinExpr, "left_anti")

  def semiIn(df: DataFrame, sub: DataFrame, joinExpr: Column): DataFrame =
    df.join(sub, joinExpr, "left_semi")

  /**
   * Gap-based sessionization: a new session starts when the gap since the
   * previous event of the same key exceeds `gapMinutes`. Single shuffle on
   * the key (lag + running sum share one window partitioning); session ids
   * are (key, session_no) — deterministic, no state beyond the sort.
   */
  def sessionize(
      df: DataFrame, key: String, eventTime: String,
      gapMinutes: Int, tiebreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(eventTime).asc +: tiebreak: _*)
    // epoch seconds via an intermediate cast to (zoned) timestamp: NTZ
    // columns reject a direct long cast, and the session zone is pinned
    // UTC so the gap arithmetic is identical for TIMESTAMP and
    // TIMESTAMP_NTZ inputs (the driver's parquet ships either, depending
    // on the writer's timestamp resolution)
    def secs(c: Column) = c.cast("timestamp").cast("long")
    df.withColumn("__prev", lag(col(eventTime), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          secs(col(eventTime)) - secs(col("__prev")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }

  /**
   * M3 — idempotent append: `INSERT ... SELECT ... WHERE NOT EXISTS`
   * (ref: sql/.../report_period_config.sql:66-81) as anti-join-then-union.
   */
  def idempotentAppend(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val joinExpr = keys.map(k => target(k) <=> incoming(k)).reduce(_ && _)
    target.unionByName(incoming.join(target, joinExpr, "left_anti"))
  }

  /**
   * Snapshot diff — the added/removed/changed audit between two versions
   * of a keyed table (the compliance companion to retraction: "what did
   * tonight's run actually change?", "did the takedown remove exactly the
   * listed ids?"). The Kimball change-detection step the reference's CDC
   * design performs before type-2 versioning
   * (ref: docs/KIMBALL_CDC_DATA_DESIGN.md:289-296), exposed as its own
   * operator.
   *
   * Output: one row per id whose presence or compared columns differ —
   * `(id, change)` with `change ∈ added | removed | changed` (and
   * `unchanged` when `includeUnchanged`). Column comparison is NULL-SAFE
   * (`<=>`): a null-to-value flip is a change, null-to-null is not.
   *
   * Plan shape: one full outer join keyed on `id` — each side shuffles
   * once on the key and nothing else moves; with both snapshots stored
   * bucketed/partitioned by id the exchange disappears entirely. At
   * 100 TB prefer selecting only `id` + the compared columns before
   * calling (column pruning keeps the scan narrow).
   */
  def snapshotDiff(before: DataFrame, after: DataFrame, id: String,
      compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    // the id is prefixed into BOTH sides below ((id +: compareCols)); a
    // compareCols that repeats it would build duplicate __b_<id>/__a_<id>
    // columns and the join resolution becomes ambiguous — fail fast with
    // the fix instead
    require(!compareCols.contains(id),
      s"snapshotDiff: compare columns must not include the id column " +
        s"'$id' — presence is keyed on it already; pass only the value " +
        "columns to compare")
    // side-presence is tested via non-nullable probe flags, NOT the id
    // itself: a null-id row never joins (null ≠ null), so it surfaces as
    // its own added/removed row — and testing the id would misread a
    // before-only null-id row as "added" (its null __b_id looks like an
    // absent before side)
    val b = before.select(lit(true).as("__b_present") +:
      (id +: compareCols).map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(lit(true).as("__a_present") +:
      (id +: compareCols).map(c => col(c).as(s"__a_$c")): _*)
    val joined = b.join(a, col(s"__b_$id") === col(s"__a_$id"), "full_outer")
    val differs = compareCols.map(c =>
      !(col(s"__b_$c") <=> col(s"__a_$c"))).reduce(_ || _)
    val out = joined.select(
      coalesce(col(s"__b_$id"), col(s"__a_$id")).as(id),
      when(col("__b_present").isNull, lit("added"))
        .when(col("__a_present").isNull, lit("removed"))
        .when(differs, lit("changed"))
        .otherwise(lit("unchanged")).as("change"))
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }
}
