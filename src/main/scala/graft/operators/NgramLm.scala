package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * N-gram language-model quality scoring — the CCNet discipline (Wenzek et
 * al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
 * Crawl Data"): train a small LM on a trusted target corpus, score every
 * candidate document by its cross-entropy under that model, and bucket the
 * corpus into head/middle/tail perplexity tiers; head+middle is the
 * conventional keep set. CCNet uses a KenLM 5-gram; this is the
 * shuffle-honest Spark re-expression as an interpolated-free add-alpha
 * BIGRAM model — the model that a distributed counts-join can score
 * exactly, with the same monotone doc ranking the use case needs.
 *
 *   p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)
 *   H(D) = -(1/|bigrams(D)|) * SUM log p(w2|w1)        (perplexity = e^H)
 *
 * where c(w1 w2) is the training-corpus bigram count, c(w1) the CONTEXT
 * count (SUM over w2 of c(w1 w2) — so the conditional normalizes exactly),
 * and V the training vocabulary size. Unseen contexts degrade smoothly:
 * c1 = c12 = 0 gives p = 1/V.
 *
 * Scale shape (the part that matters at 100 TB):
 *  - The MODEL is vocabulary-sized, not corpus-sized: `buckets`-free exact
 *    counts whose row count is the training corpus's distinct bigrams —
 *    Zipf-bounded, and [[Model.prune]] applies the standard min-count
 *    cutoff that drops the hapax tail (most distinct bigrams occur once)
 *    while context counts stay exact.
 *  - Training is ONE (w1, w2) hash agg over the exploded transitions plus
 *    a derived `w1` agg for contexts and a 1-row distinct-count for V —
 *    the same map-side-combinable shapes as [[Bm25.postings]].
 *  - Scoring is two hash joins of the exploded candidate transitions
 *    against the model frames followed by one per-doc map-side-combinable
 *    agg. Score against a [[save]]d-and-[[load]]ed model (the CCNet
 *    deployment shape): parquet-backed model frames carry real
 *    vocabulary-sized stats, so the planner broadcasts the joins
 *    statically (measured: 3 MB total shuffle at 250k docs vs 1.3 GB for
 *    the fresh-train plan, whose aggregate-derived estimates force a
 *    shuffle join of the exploded corpus — SCALE.md round 19). Nothing
 *    pairwise, nothing corpus × corpus; doc text never leaves its
 *    partition un-exploded.
 *
 * Tokenization is the corpus-wide whitespace convention ([[Text.tokens]],
 * oracle-parity proven by q33). Bigram extraction is the [[Dsir.grams]]
 * zip-of-slices form — slices are evaluated once per ROW, never inside a
 * higher-order-function lambda (the re-evaluation runaway SCALE.md round
 * 19 documents). Reference analogue: the reference's DQ suite scores
 * text fields with reasonability statistics (test_data_quality.sql) but
 * has no LM scoring; this operator is part of the training-data layer the
 * engine adds on top.
 */
object NgramLm {

  val Alpha = 0.5

  /** Trained bigram model: `bigrams` = (w1, w2, c12), `contexts` =
   *  (w1, c1) with c1 = SUM c12 (exact even after pruning), `vocab` =
   *  1 row (v). All three are plain frames — persist with parquet like
   *  any other index artifact, broadcast-join at score time. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         vocab: DataFrame) {
    /** Standard min-count pruning: drop bigram rows with c12 < minCount
     *  (the Zipf hapax tail — typically half the distinct rows at
     *  minCount=2). Pruned transitions score as unseen-but-known-context;
     *  contexts and V are NOT re-derived, so the conditional stays the
     *  trained one. */
    def prune(minCount: Long): Model =
      if (minCount <= 1L) this
      else copy(bigrams = bigrams.filter(col("c12") >= minCount))
  }

  /** (id, w1, w2) — one row per adjacent-token transition, document order.
   *  Docs with fewer than two tokens carry no transitions. */
  def bigramPairs(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = Text.tokens(col(text))
    docs
      .select(col(id), toks.as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col(id),
        explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__z"))
      .select(col(id), col("__z.w1").as("w1"), col("__z.w2").as("w2"))
  }

  /** Train on a target corpus: one (w1, w2) count agg, a derived context
   *  agg, and a 1-row distinct-token count. */
  def train(target: DataFrame, id: String, text: String): Model = {
    val pairs = bigramPairs(target, id, text)
    val bg = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = target
      .select(explode(Text.tokens(col(text))).as("__t"))
      .agg(count_distinct(col("__t")).cast("double").as("v"))
    Model(bg, ctx, v)
  }

  /**
   * Per-doc cross-entropy under the model: (id, n_bigrams, cross_entropy)
   * for every candidate doc with at least one transition, `cross_entropy`
   * rounded to 6 places for cross-engine determinism. Lower = more
   * target-like; perplexity is `exp(cross_entropy)`.
   */
  def crossEntropy(docs: DataFrame, id: String, text: String,
                   model: Model, alpha: Double = Alpha): DataFrame = {
    val pairs = bigramPairs(docs, id, text)
    pairs
      .join(model.contexts, Seq("w1"), "left")
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col(id),
        log((coalesce(col("c12"), lit(0.0)) + lit(alpha)) /
            (coalesce(col("c1"), lit(0.0)) + lit(alpha) * col("v"))).as("__logp"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(col("__logp")), 6).as("cross_entropy"))
  }

  /**
   * Persist a trained model as an engine artifact: the three frames under
   * one root plus an [[IndexMeta]] marker recording kind and pruning
   * state — the [[Vocab.saveBpe]] discipline, so a scoring path can never
   * silently mix models. The model is an OUTPUT of training and an INPUT
   * of every later scoring run (the CCNet deployment shape: train once on
   * the trusted slice, score every nightly batch).
   */
  def save(spark: SparkSession, model: Model, path: String,
           minCountApplied: Long = 1L): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    model.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    IndexMeta.write(spark, path,
      Map("kind" -> "bigram-lm", "minCount" -> minCountApplied.toString))
  }

  /** Load a [[save]]d model; fails fast on a path that is not one. */
  def load(spark: SparkSession, path: String): Model = {
    val params = IndexMeta.read(spark, path)
    require(params.get("kind").contains("bigram-lm"),
      s"no bigram-LM marker at $path (kind=${params.get("kind")}) — " +
        "was this path written by NgramLm.save?")
    Model(spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      spark.read.parquet(s"$path/vocab"))
  }

  /**
   * The ingest-time quality gate (CCNet's tail cut applied at the door):
   * split a batch into (survivors, flagged) where flagged carries
   * (id, cross_entropy) for every doc whose score under the model EXCEEDS
   * `maxCe`. Docs the model cannot score (fewer than two tokens) are NOT
   * flagged — the gate only judges what it can measure; pair it with the
   * short-doc rules of [[graft.functions.Text.qualityVerdict]] for those.
   * Cost: one scoring pass over the batch + a |flagged|-sized anti-join —
   * the batch never self-joins.
   */
  def qualityGate(batch: DataFrame, id: String, text: String,
                  model: Model, maxCe: Double,
                  alpha: Double = Alpha): (DataFrame, DataFrame) = {
    require(!maxCe.isNaN && maxCe > 0.0,
      s"lm quality gate needs a positive cross-entropy ceiling, got $maxCe")
    // null ids fail the job loudly: a flagged null-id doc would BOTH
    // ledger as dropped AND survive the anti-join (null never matches) —
    // see Guards.requireIds
    val b = Guards.requireIds(batch, id, "NgramLm.qualityGate")
    val flagged = crossEntropy(b, id, text, model, alpha)
      .filter(col("cross_entropy") > maxCe)
      .select(col(id), col("cross_entropy"))
    val survivors = b.join(flagged, Seq(id), "left_anti")
    (survivors, flagged)
  }

  /**
   * CCNet's head/middle/tail split: label each scored doc by which
   * cross-entropy tercile it falls in (head = most target-like third).
   * Cutoffs are EXACT percentiles of the rounded score — a single
   * all-values agg, fine at report scale and oracle-reproducible; at
   * 100 TB pass `exact = false` for `approx_percentile` (t-digest sketch
   * state, no buffering) and accept sketch-boundary labels. Labeling
   * itself is a broadcast of the 1-row cutoffs — no global sort, no
   * ntile single-partition window.
   */
  def perplexityTiers(scored: DataFrame, scoreCol: String,
                      exact: Boolean = true): DataFrame = {
    val cutsAgg =
      if (exact) expr(s"percentile($scoreCol, array(1.0D/3.0D, 2.0D/3.0D))")
      else expr(s"approx_percentile($scoreCol, array(1.0D/3.0D, 2.0D/3.0D), 10000)")
    val cuts = scored.agg(cutsAgg.as("__cuts"))
      .select(col("__cuts").getItem(0).as("__t1"),
        col("__cuts").getItem(1).as("__t2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col(scoreCol) <= col("__t1"), lit("head"))
          .when(col(scoreCol) <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__t1", "__t2")
  }
}
