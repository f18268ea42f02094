package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Mergeable corpus-statistics sketches — corpus-LIFETIME profiling in
 * O(batch) per ingest night instead of O(corpus) per question.
 *
 * The curation questions a training-data team asks nightly ("how many
 * docs per language so far? how many distinct sources? total chars?")
 * are all answerable by a full-corpus aggregation — which at 100 TB is
 * exactly the scan the nightly cycle is designed to avoid (the same
 * reasoning that keeps the pipeline's DQ re-check to ONE GROUPING-SETS
 * pass, and its compaction metadata-planned). This operator keeps a tiny
 * MERGEABLE state per night instead: exact counts/sums, plus a
 * Datasketches HLL sketch per distinct-counted column
 * (`hll_sketch_agg`, the engine-native sketch aggregate — codegen'd,
 * merged with `hll_union_agg`, never a per-row UDF). Answering a
 * lifetime question then reads `nights × groups` sketch rows — KB per
 * night — and never touches the corpus.
 *
 * Accuracy: HLL is EXACT while a (group, column)'s observed cardinality
 * sits in the sketch's coupon range (≪ 2^lgK) and within ~1.04/√2^lgK
 * relative standard error beyond it (~1.6% at the default lgK=12) —
 * SketchesSpec pins exactness at oracle cardinalities and the error
 * bound at 50k distinct. Counts and sums are exact at any scale: they
 * merge by addition.
 *
 * State size: `nights × groups × (16B + sums × 8B + distincts × ≤2^lgK
 * bytes)` — at lgK=12 a sketch caps at ~4 KB, so a year of nights over
 * 100 language groups with two distinct columns is ~300 MB of state for
 * a corpus of any size. Merging is a groupBy over that state; if nights
 * ever dominate, [[mergedStats]]' output is itself re-persistable as a
 * single compacted "night" (sketch union is associative), though no
 * realistic night count needs it.
 *
 * Reference behavior being generalized: the reference's DQ framework
 * re-derives COUNT/DISTINCT metrics from full source scans on every run
 * (sql/dmf/setup_dmf_data_quality.sql's SYSTEM$DATA_METRIC_SCAN
 * pattern); at warehouse scale that is a metered query per metric, and
 * at 100 TB it is the bottleneck. Sketch state is the scan-once answer.
 */
object Sketches {

  /** What to sketch: one row per `groupCols` combination per night,
    * carrying `count(*)`, an exact sum per `sumCols` entry, and an HLL
    * distinct-count sketch per `distinctCols` entry. `lgK` sizes the HLL
    * register array (2^lgK): 12 ≈ 1.6% RSE / ≤4 KB, raise for tighter
    * lifetime estimates. */
  final case class SketchSpec(
      groupCols: Seq[String],
      distinctCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil,
      lgK: Int = 12) {
    require(groupCols.nonEmpty, "sketch needs at least one group column")
    require(lgK >= 4 && lgK <= 21, s"lgK $lgK outside Datasketches' [4, 21]")
  }

  private[operators] def sumName(c: String) = s"sum_$c"
  private[operators] def hllName(c: String) = s"hll_$c"
  private[operators] def distinctName(c: String) = s"distinct_$c"

  private def params(spec: SketchSpec) = Map(
    "kind" -> "sketches",
    "groupCols" -> spec.groupCols.mkString(","),
    "distinctCols" -> spec.distinctCols.mkString(","),
    "sumCols" -> spec.sumCols.mkString(","))

  /** Fail fast when `spec`'s COLUMNS drift from the ones the state at
    * `path` was written with — the BandIndex/IvfIndex marker discipline.
    * The failure mode being guarded is SILENT: parquet reads over a
    * mixed-schema state resolve a missing sum/hll column to null for the
    * drifted nights, and null-skipping aggregates then return totals that
    * quietly exclude them. `lgK` is deliberately NOT checked — sketch
    * union tolerates mixed lgK (`allowDifferentLgConfigK`; precision
    * degrades to the smallest, correctness holds). */
  private def checkParams(spark: SparkSession, path: String,
      spec: SketchSpec): Unit = {
    val saved = IndexMeta.read(spark, path)
    if (saved.nonEmpty) {
      val want = params(spec)
      val drift = want.keys.filter(k => saved.get(k).exists(_ != want(k)))
      require(drift.isEmpty,
        s"sketch state at $path was written with " +
          drift.map(k => s"$k='${saved(k)}'").mkString(", ") +
          s" but this spec carries " +
          drift.map(k => s"$k='${want(k)}'").mkString(", ") +
          " — a drifted column set merges as silent nulls; use a new " +
          "state path or the recorded spec")
    }
  }

  /** One compact sketch frame for a single batch: `groupCols...,
    * n_rows, sum_<c>..., hll_<c>...` (hll columns are Datasketches HLL
    * binaries). O(batch) compute, one map-side-combined aggregation;
    * output is `groups` rows regardless of batch size. Nulls follow
    * COUNT DISTINCT semantics: `hll_sketch_agg` skips them, so a
    * distinct estimate never counts null as a value. */
  def batchSketch(batch: DataFrame, spec: SketchSpec): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        (spec.sumCols.map(c => sum(col(c)).as(sumName(c))) ++
          spec.distinctCols.map(c =>
            hll_sketch_agg(col(c), lit(spec.lgK)).as(hllName(c))))
    batch.groupBy(spec.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Persist `batch`'s sketch under `path/night=<night>` — REPLACING that
    * night's prior state, so a crash replay of the same night lands the
    * same rows exactly once, INCLUDING a replay whose sketch is empty —
    * the night directory is overwritten directly, and an empty write
    * commits a schema-only file rather than leaving old rows behind. The
    * night id must be directory-safe: it IS the partition directory
    * name. */
  def appendNight(batch: DataFrame, spec: SketchSpec, path: String,
      night: String): Unit = {
    require(night.nonEmpty && !night.exists("/\\=".contains(_)),
      s"night id '$night' is not directory-safe (it names the partition)")
    val spark = batch.sparkSession
    checkParams(spark, path, spec)
    // marker BEFORE data: a crash between the two leaves marker-only
    // state, which later entry points either guard (checkParams) or fail
    // LOUDLY on (readState) — data-before-marker instead left unmarked
    // state a drifted spec would merge as silent nulls
    IndexMeta.write(spark, path, params(spec))
    // written DIRECTLY into the night's directory, not via partitionBy
    // dynamic overwrite: a ZERO-GROUP night then still commits one
    // schema-only parquet file (an empty partitionBy write commits
    // nothing), so (a) readers can always infer the state schema and
    // (b) a replay whose sketch is empty truly REPLACES the night's old
    // rows instead of leaving them behind
    batchSketch(batch, spec)
      .write.mode("overwrite").parquet(s"$path/night=$night")
  }

  /** Read the state, failing ACTIONABLY when the directory exists (the
    * marker landed) but no night data does — the crash window between
    * [[appendNight]]'s marker and data writes. */
  private def readState(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        found = st.isFile && st.getPath.getName.endsWith(".parquet")
      }
      found
    }
    if (!hasData) throw new IllegalStateException(
      s"sketch state at $path holds no night data" +
        (if (fs.exists(p)) " (a crashed first append left marker-only " +
          "state — re-run the night)" else ""))
    spark.read.parquet(path)
  }

  /** Corpus-lifetime statistics from the persisted sketch state:
    * `groupCols..., n_rows, sum_<c>..., distinct_<c>...` with sums/counts
    * added and HLL sketches unioned (`hll_union_agg` — register-wise max,
    * associative and order-independent) then estimated. Reads KB of
    * state, never the corpus. `spec` must match the spec the state was
    * written with — the recorded marker fails a drifted column set FAST
    * (a mixed-schema read would resolve missing columns to null and the
    * null-skipping aggregates would silently exclude those nights). */
  def mergedStats(spark: SparkSession, path: String,
      spec: SketchSpec): DataFrame = {
    checkParams(spark, path, spec)
    val state = readState(spark, path)
    val aggs: Seq[Column] =
      sum(col("n_rows")).as("n_rows") +:
        (spec.sumCols.map(c => sum(col(sumName(c))).as(sumName(c))) ++
          spec.distinctCols.map(c =>
            hll_sketch_estimate(
              hll_union_agg(col(hllName(c)), lit(true)))
              .as(distinctName(c))))
    state.groupBy(spec.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Distribution-drift verdicts for one night against the corpus
   * LIFETIME, computed ENTIRELY from the persisted sketch state — KB of
   * reads, never a corpus or batch rescan. The question a training-data
   * team asks after every crawl ("did tonight's batch change shape?")
   * becomes a state-only query on the same cadence as the sketch append.
   *
   * Output is long-form, one row per (group, metric):
   * `groupCols..., metric, night_value, lifetime_value, ratio, status`.
   *
   * Metrics:
   *   - `row_share` — the group's share of the NIGHT's rows vs its share
   *     of the LIFETIME rows (composition drift: "did tonight over-sample
   *     lang=de?"). ratio = night_share / lifetime_share.
   *   - `avg_<sumCol>` — the group's per-row night mean vs its lifetime
   *     mean (magnitude drift: "are tonight's de docs half their usual
   *     length?"). ratio = night_avg / lifetime_avg.
   *
   * `status` is `OK` when the ratio sits inside [1/tolerance, tolerance],
   * `DRIFT` outside it, and `MISSING` for a lifetime group the night
   * contributed no rows to (reported with a null night value, never a
   * division artifact). Lifetime INCLUDES the night under test — it is
   * part of the corpus — so the comparison is well-defined on the very
   * first night, where every present group's ratio is exactly 1. All
   * inputs are the state's EXACT counts/sums (HLLs are not consulted), so
   * the verdicts are deterministic and engine-portable.
   */
  def nightDrift(spark: SparkSession, path: String, spec: SketchSpec,
      night: String, tolerance: Double = 2.0): DataFrame = {
    require(tolerance > 1.0, s"tolerance must exceed 1 (got $tolerance): " +
      "it bounds the acceptable ratio band [1/t, t]")
    checkParams(spark, path, spec)
    val state = readState(spark, path)
      .withColumn("night", col("night").cast("string"))
    val g = spec.groupCols
    val isNight = col("night") === lit(night)
    val nightAgg = state.filter(isNight).groupBy(g.map(col): _*)
      .agg(sum(col("n_rows")).as("__n_night"),
        spec.sumCols.map(c =>
          sum(col(sumName(c))).as(s"__night_${sumName(c)}")): _*)
    val lifeAgg = state.groupBy(g.map(col): _*)
      .agg(sum(col("n_rows")).as("__n_life"),
        spec.sumCols.map(c =>
          sum(col(sumName(c))).as(s"__life_${sumName(c)}")): _*)
    // grand totals: two longs off the KB-sized state — broadcast, no
    // driver round-trip in the plan
    val totals = state.agg(
      coalesce(sum(when(isNight, col("n_rows"))), lit(0L)).as("__night_total"),
      sum(col("n_rows")).as("__life_total"))
    // NULL-SAFE group join: a null-valued group (supported state — the
    // null lang cohort) must compare night-vs-lifetime like any other,
    // not read as MISSING because null never equals null
    val joined = lifeAgg.join(nightAgg,
        g.map(c => lifeAgg(c) <=> nightAgg(c)).reduce(_ && _), "left")
      .select(g.map(lifeAgg(_)) ++
        (lifeAgg.columns.filterNot(g.contains).map(lifeAgg(_)) ++
          nightAgg.columns.filterNot(g.contains).map(nightAgg(_))): _*)
      .crossJoin(broadcast(totals))
    def longForm(metric: String, nightV: Column, lifeV: Column): DataFrame =
      joined.select(g.map(col) ++ Seq(lit(metric).as("metric"),
        nightV.cast("double").as("night_value"),
        lifeV.cast("double").as("lifetime_value")): _*)
    val rowShare = longForm("row_share",
      col("__n_night").cast("double") / col("__night_total"),
      col("__n_life").cast("double") / col("__life_total"))
    val avgs = spec.sumCols.map(c => longForm(s"avg_$c",
      col(s"__night_${sumName(c)}").cast("double") / col("__n_night"),
      col(s"__life_${sumName(c)}").cast("double") / col("__n_life")))
    (rowShare +: avgs).reduce(_.unionByName(_))
      .withColumn("ratio", col("night_value") / col("lifetime_value"))
      .withColumn("status",
        when(col("night_value").isNull, lit("MISSING"))
          .when(col("ratio") >= lit(1.0) / lit(tolerance) &&
            col("ratio") <= lit(tolerance), lit("OK"))
          .otherwise(lit("DRIFT")))
  }

  /** Per-night view of the persisted state with distinct estimates
    * resolved — the "what did each night contribute" audit twin of
    * [[mergedStats]]. */
  def nightlyStats(spark: SparkSession, path: String,
      spec: SketchSpec): DataFrame = {
    checkParams(spark, path, spec)
    // partition discovery types the night directory token (a digit-only
    // night id would infer int) — the contract is STRING night ids
    val state = readState(spark, path)
      .withColumn("night", col("night").cast("string"))
    val resolved = spec.distinctCols.foldLeft(state)((d, c) =>
      d.withColumn(distinctName(c), hll_sketch_estimate(col(hllName(c)))))
    resolved.select((Seq("night") ++ spec.groupCols ++ Seq("n_rows") ++
      spec.sumCols.map(sumName) ++ spec.distinctCols.map(distinctName))
      .map(col): _*)
  }
}
