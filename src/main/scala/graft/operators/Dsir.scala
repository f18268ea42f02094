package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * DSIR-style data selection: importance weights from hashed n-gram
 * bag-of-words models (Xie et al. 2023, "Data Selection for Language Models
 * via Importance Resampling"). Each document's weight is
 *
 *   log w(D) = SUM_{g in grams(D)} [ log p_target(bucket(g)) - log p_raw(bucket(g)) ]
 *
 * where grams are word unigrams + bigrams hashed into `buckets` buckets and
 * each corpus's bucket distribution is add-alpha smoothed:
 * p(b) = (count(b) + alpha) / (total + alpha*buckets).
 *
 * Scale shape:
 *  - Feature extraction is per-row expressions (tokenize, zip_with bigrams,
 *    md5 bucket) — no UDF, no shuffle.
 *  - Each corpus's bucket histogram is ONE agg with `buckets` output rows
 *    (8,192 by default) — the models are tiny regardless of corpus size,
 *    exactly like [[Sketches]]' mergeable state.
 *  - The log-ratio table broadcasts; scoring is one map-side-combinable
 *    per-doc agg over the exploded grams. At 100 TB: two histogram
 *    passes + one broadcast-join-and-agg pass, nothing pairwise.
 *
 * The bucket hash is the portable md5 formula (4 hex chars -> 0..65535,
 * mod buckets) so the DuckDB oracle reproduces weights exactly — the same
 * portable-vs-xxhash64 split [[Dedup]] documents; pass `portable = false`
 * for the engine-native xxhash64 path on production corpora.
 */
object Dsir {

  val GramCol = "gram"
  val BucketCol = "bucket"
  val Buckets = 8192
  val Alpha = 0.5

  /** Word unigrams + bigrams (document order, non-distinct). Docs with one
   *  token have no bigrams; empty docs no grams. */
  def grams(text: Column): Column = {
    val toks = Text.tokens(text)
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    concat(toks, bigrams)
  }

  /** Hash a gram to a bucket: portable md5 (oracle-reproducible) or
   *  engine-native xxhash64. */
  def bucketOf(gram: Column, buckets: Int, portable: Boolean): Column =
    if (portable)
      conv(substring(md5(gram.cast("binary")), 1, 4), 16, 10)
        .cast("long") % buckets
    else pmod(xxhash64(gram), lit(buckets.toLong))

  /** Exploded (carryCols..., bucket) frame — one row per gram occurrence. */
  def hashedGrams(docs: DataFrame, text: String, carryCols: Seq[String],
                  buckets: Int = Buckets,
                  portable: Boolean = true): DataFrame =
    docs.select(carryCols.map(col) :+ explode(grams(col(text))).as(GramCol): _*)
      .select(carryCols.map(col) :+
        bucketOf(col(GramCol), buckets, portable).as(BucketCol): _*)

  /** `buckets`-row smoothed log-probability histogram of one corpus's
   *  hashed grams: (bucket, logp). Only observed buckets are materialized;
   *  consumers must treat absent buckets as log(alpha / (total +
   *  alpha*buckets)) — [[logRatios]] does. */
  private def histogram(hashed: DataFrame): DataFrame =
    hashed.groupBy(col(BucketCol))
      .agg(count(lit(1)).cast("double").as("c"))

  /**
   * Per-bucket log importance ratio log p_target - log p_raw, defined for
   * every bucket the RAW corpus observes (scored docs come from the raw
   * corpus, so that covers scoring; target-only buckets are unreachable).
   * Two `buckets`-row aggs + a broadcast of the 1-row totals.
   */
  def logRatios(target: DataFrame, raw: DataFrame,
                buckets: Int = Buckets, alpha: Double = Alpha): DataFrame = {
    val th = histogram(target).withColumnRenamed("c", "tc")
    val rh = histogram(raw).withColumnRenamed("c", "rc")
    val totals = th.agg(coalesce(sum(col("tc")), lit(0.0)).as("tt"))
      .crossJoin(rh.agg(coalesce(sum(col("rc")), lit(0.0)).as("tr")))
    rh.join(th, Seq(BucketCol), "left")
      .crossJoin(broadcast(totals))
      .select(col(BucketCol),
        (log((coalesce(col("tc"), lit(0.0)) + lit(alpha)) /
             (col("tt") + lit(alpha * buckets))) -
         log((col("rc") + lit(alpha)) /
             (col("tr") + lit(alpha * buckets)))).as("logratio"))
  }

  /**
   * Per-doc importance weights of the raw corpus against a target corpus:
   * (id, n_grams, logw) with logw rounded to 6 places for cross-engine
   * determinism. Higher = more target-like; feed to [[selectStratified]]
   * or a plain top-k for the resampling step.
   */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        id: String, text: String,
                        carry: Seq[String] = Nil,
                        buckets: Int = Buckets, alpha: Double = Alpha,
                        portable: Boolean = true): DataFrame = {
    val keys = id +: carry
    val hashedRaw = hashedGrams(raw, text, keys, buckets, portable)
    val hashedTgt = hashedGrams(target, text, Nil, buckets, portable)
    val lr = logRatios(hashedTgt, hashedRaw.select(col(BucketCol)),
      buckets, alpha)
    hashedRaw.join(broadcast(lr), BucketCol)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_grams"), sum(col("logratio")).as("lw"))
      .select(keys.map(col) ++ Seq(col("n_grams"),
        round(col("lw"), 6).as("logw")): _*)
  }

  /**
   * Stratified selection: keep the `perStratum` highest-weight docs within
   * each stratum (e.g. language), preserving corpus balance while steering
   * toward the target distribution — the deterministic counterpart of the
   * paper's Gumbel resampling (content-stable forever, like [[Sampling]]).
   * Rank ordering is total (rounded logw desc, then id); the window is
   * PARTITIONED by the stratum — no single-partition exchange.
   */
  def selectStratified(weights: DataFrame, id: String, stratum: String,
                       perStratum: Int): DataFrame = {
    require(perStratum > 0, s"need perStratum > 0, got $perStratum")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratum))
      .orderBy(col("logw").desc, col(id))
    weights.withColumn("rk", rank().over(w))
      .where(col("rk") <= perStratum)
      .drop("rk")
  }
}
