package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * Seed-supervised quality classifier — the "quality classifier" discipline
 * of GPT-3-era corpus curation (Brown et al. 2020, "Language Models are
 * Few-Shot Learners", Appendix A): train a lightweight text classifier on
 * a trusted positive seed (curated corpora) against a negative seed (raw
 * crawl sample), score every candidate document, and keep documents
 * stochastically by `pareto_sample > 1 - score` so the kept set favors
 * high-scoring documents without hard-cutting the tail. GPT-3 used
 * logistic regression over hashed features; this is the closed-form
 * cousin a distributed counts-join computes EXACTLY — multinomial Naive
 * Bayes with add-alpha smoothing — so the oracle can pin every score:
 *
 *   logOdds(D) = ln(nPos/nNeg)
 *              + SUM_w c(w, D) * [ ln((cPos(w)+a) / (tPos + a*V))
 *                                - ln((cNeg(w)+a) / (tNeg + a*V)) ]
 *
 * where cPos/cNeg are per-token seed counts, tPos/tNeg the seed token
 * totals, V the JOINT seed vocabulary, and nPos/nNeg the seed doc counts
 * (the class prior). Tokens outside the seed vocabulary contribute the
 * constant unseen ratio ln((tNeg+aV)/(tPos+aV)) — smooth degradation, the
 * [[NgramLm]] convention.
 *
 * Scale shape (the part that matters at 100 TB):
 *  - The MODEL is vocabulary-sized, not corpus-sized: one (token, class)
 *    hash agg over the exploded seeds plus a 1-row totals frame.
 *    [[Model.prune]] applies the min-count cut that drops the Zipf hapax
 *    tail while totals and V stay trained (the [[NgramLm.Model.prune]]
 *    discipline), keeping the score-time join build side broadcastable.
 *  - Scoring is ONE hash join of the exploded candidate tokens against
 *    the model followed by one per-doc map-side-combinable agg. Score
 *    against a [[save]]d-and-[[load]]ed model (the deployment shape):
 *    parquet-backed model frames carry real vocabulary-sized stats, so
 *    the planner broadcasts the join statically (measured: 3 MB shuffle
 *    at 250k docs vs 349 MB for the fresh-train plan — SCALE.md round
 *    19). Nothing pairwise; doc text never leaves its partition
 *    un-exploded.
 *  - The keep rule is per-row arithmetic on an id-hash-seeded uniform
 *    draw — deterministic (reruns and audits reproduce the exact kept
 *    set, the engine-wide md5-bucket discipline of `Sampling`), zero
 *    shuffle, zero driver state.
 *
 * Tokenization is the corpus-wide whitespace convention ([[Text.tokens]],
 * oracle-parity proven by q33). Reference analogue: the reference's DQ
 * suite gates loads on reasonability checks (test_data_quality.sql) but
 * has no learned quality scoring; this operator is part of the
 * training-data layer the engine adds on top.
 */
object NbClassifier {

  val Alpha = 0.5

  /** Pareto shape for [[paretoKeep]] — GPT-3's documented alpha = 9. */
  val ParetoShape = 9.0

  /** Trained model: `tokenCounts` = (token, c_pos, c_neg) over the JOINT
   *  seed vocabulary, `totals` = 1 row (t_pos, t_neg, v, n_pos, n_neg)
   *  with t_* = seed token totals, v = joint distinct-token count, n_* =
   *  seed doc counts. Both are plain frames — persist with parquet like
   *  any other index artifact, broadcast-join at score time. */
  final case class Model(tokenCounts: DataFrame, totals: DataFrame) {
    /** Standard min-count pruning: drop token rows whose combined seed
     *  count is below `minCount` (the Zipf hapax tail). Pruned tokens
     *  score as unseen; totals and V are NOT re-derived, so surviving
     *  tokens keep their trained likelihoods. */
    def prune(minCount: Long): Model =
      if (minCount <= 1L) this
      else copy(tokenCounts =
        tokenCounts.filter(col("c_pos") + col("c_neg") >= minCount))
  }

  /** (id, token) — one row per token occurrence (non-distinct). Empty /
   *  whitespace-only docs carry no rows. */
  def tokenRows(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), explode(Text.tokens(col(text))).as("token"))

  /** `id`, failing the JOB loudly on the first null — a row-level guard,
   *  not a driver-side count, so it costs no extra pass. A null id breaks
   *  the whole classifier discipline silently: md5(null) nulls the
   *  id-hash draw, making BOTH the gate's flagged filter (noise < 1-p)
   *  and [[paretoKeep]]'s keep filter (noise >= 1-p) evaluate to NULL —
   *  the gate would pass what the keep rule drops (the surfaces disagree)
   *  — and every null-id doc collapses into ONE scored group in
   *  [[logOdds]]' groupBy. Out-of-scope routing (the
   *  [[BloomIndex.exactGate]] pattern) can't work here either: a null key
   *  never matches the gate's survivor anti-join, so a flagged null-id
   *  row would still survive. Null ids are a data-contract violation —
   *  fail, don't guess. */
  private def checkedId(id: String, caller: String): Column =
    when(col(id).isNull, raise_error(lit(s"$caller: null-id document — " +
      "the id-hash-seeded draw and the per-doc grouping are undefined " +
      "for a null id; assign stable non-null ids upstream")))
      .otherwise(col(id)).as(id)

  /** Train on labeled seeds: one (token, class) count agg over the union
   *  plus a derived 1-row totals/priors frame. */
  def train(pos: DataFrame, neg: DataFrame, id: String,
            text: String): Model = {
    val tagged = tokenRows(pos, id, text).withColumn("__p", lit(1))
      .unionByName(tokenRows(neg, id, text).withColumn("__p", lit(0)))
    val counts = tagged.groupBy(col("token"))
      .agg(sum(col("__p")).cast("double").as("c_pos"),
        sum(lit(1) - col("__p")).cast("double").as("c_neg"))
    val tok = counts.agg(sum(col("c_pos")).as("t_pos"),
      sum(col("c_neg")).as("t_neg"),
      count(lit(1)).cast("double").as("v"))
    val docs = pos.agg(count(lit(1)).cast("double").as("n_pos"))
      .crossJoin(neg.agg(count(lit(1)).cast("double").as("n_neg")))
    Model(counts, tok.crossJoin(docs))
  }

  /**
   * Per-doc Naive Bayes log-odds under the model: (id, n_tokens,
   * log_odds) for every candidate doc with at least one token, `log_odds`
   * rounded to 6 places for cross-engine determinism. Positive = more
   * positive-seed-like.
   */
  def logOdds(docs: DataFrame, id: String, text: String, model: Model,
              alpha: Double = Alpha): DataFrame =
    tokenRows(docs.select(checkedId(id, "NbClassifier.logOdds"),
        col(text)), id, text)
      .join(model.tokenCounts, Seq("token"), "left")
      .crossJoin(broadcast(model.totals))
      .select(col(id),
        (log((coalesce(col("c_pos"), lit(0.0)) + lit(alpha)) /
             (col("t_pos") + lit(alpha) * col("v"))) -
         log((coalesce(col("c_neg"), lit(0.0)) + lit(alpha)) /
             (col("t_neg") + lit(alpha) * col("v")))).as("__lr"))
      .groupBy(col(id)) // id-only keys: the prior joins back AFTER the agg
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("__sumlr"))
      .crossJoin(broadcast(model.totals
        .select(log(col("n_pos") / col("n_neg")).as("__prior"))))
      .select(col(id), col("n_tokens"),
        round(col("__prior") + col("__sumlr"), 6).as("log_odds"))

  /**
   * GPT-3's stochastic keep rule over a scored frame, made deterministic:
   * keep a document iff `pareto_draw >= 1 - p` where `p =
   * sigmoid(log_odds)` and the Pareto(shape) draw is inverse-transformed
   * from an ID-HASH-seeded uniform — `u = first 4 md5 hex digits of the
   * id / 65536`, the engine's md5-bucket sampling discipline — so reruns,
   * audits, and the oracle reproduce the exact kept set AS LONG AS ids
   * are stable across runs (the draw is a function of the id, NOT the
   * text: two byte-identical docs under different ids draw differently,
   * and a re-ingestion that reassigns ids redraws). The comparison is
   * `>=` (not the continuous rule's `>`) because the 16-bit discretized
   * draw CAN be exactly 0 (ids whose md5 starts `0000`, ~1 in 65,536) —
   * under `>` such an id would be rejected forever even at p = 1. Both
   * sides round to 6 places BEFORE comparing so the keep decision cannot
   * flip on last-ulp ln/exp differences between engines. Returns the
   * kept rows with `keep_p` (the sigmoid) and `noise` (the draw), both
   * rounded.
   */
  def paretoKeep(scored: DataFrame, id: String,
                 scoreCol: String = "log_odds",
                 shape: Double = ParetoShape): DataFrame =
    drawn(scored, id, scoreCol, shape)
      .filter(col("noise") >= lit(1.0) - col("keep_p"))

  /** The scored frame + `keep_p` (sigmoid of the score) and `noise` (the
   *  id-hash-seeded Pareto draw), both rounded to 6 places. */
  private def drawn(scored: DataFrame, id: String, scoreCol: String,
                    shape: Double): DataFrame = {
    // the Dsir.bucketOf md5-prefix form, widened to the raw 16-bit value;
    // the id rides through checkedId so a null id fails the job loudly
    // instead of nulling the draw (see checkedId)
    val u = conv(substring(md5(
        checkedId(id, "NbClassifier keep rule").cast("string")), 1, 4), 16, 10)
      .cast("double") / lit(65536.0)
    scored
      .withColumn("keep_p",
        round(lit(1.0) / (lit(1.0) + exp(-col(scoreCol))), 6))
      .withColumn("noise",
        round(pow(lit(1.0) - u, lit(-1.0 / shape)) - 1.0, 6))
  }

  /**
   * The ingest-time classifier gate (the GPT-3 keep rule applied at the
   * door, [[NgramLm.qualityGate]]'s shape): split a batch into
   * (survivors, flagged) where flagged carries (id, log_odds, keep_p,
   * noise) for every doc whose draw FAILS the keep rule. Docs the model
   * cannot score (zero tokens) are NOT flagged — the gate only judges
   * what it can measure. A null-id doc fails the job loudly (see
   * `checkedId` — a null id nulls the draw AND can never be anti-joined
   * out, so no routing keeps the gate and [[paretoKeep]] complements).
   * Cost: one scoring pass over the batch + a |flagged|-sized anti-join —
   * the batch never self-joins.
   */
  def paretoGate(batch: DataFrame, id: String, text: String, model: Model,
                 shape: Double = ParetoShape,
                 alpha: Double = Alpha): (DataFrame, DataFrame) = {
    require(!shape.isNaN && shape > 0.0,
      s"classifier gate needs a positive pareto shape, got $shape")
    // guard at the GATE door, not only under the scoring path: a
    // zero-token null-id doc produces no token rows, so the draw-side
    // checkedId is never evaluated for it by codegen — the survivors
    // side's join key below is what every such row must pass through
    val b = Guards.requireIds(batch, id, "NbClassifier.paretoGate")
    val flagged = drawn(logOdds(b, id, text, model, alpha), id,
        "log_odds", shape)
      .filter(col("noise") < lit(1.0) - col("keep_p"))
      .select(col(id), col("log_odds"), col("keep_p"), col("noise"))
    val survivors = b.join(flagged.select(col(id)), Seq(id), "left_anti")
    (survivors, flagged)
  }

  /** Persist a trained model as an engine artifact: the two frames under
   *  one root plus an [[IndexMeta]] marker recording kind and pruning
   *  state (the [[NgramLm.save]] discipline, so a scoring path can never
   *  silently mix models). Score-time loads are tiny (vocabulary-sized)
   *  parquet reads. */
  def save(spark: SparkSession, model: Model, path: String,
           minCountApplied: Long = 1L): Unit = {
    model.tokenCounts.write.mode("overwrite")
      .parquet(s"$path/token_counts")
    model.totals.write.mode("overwrite").parquet(s"$path/totals")
    IndexMeta.write(spark, path,
      Map("kind" -> "nb-classifier", "minCount" -> minCountApplied.toString))
  }

  /** Load a [[save]]d model; fails fast on a path that is not one. */
  def load(spark: SparkSession, path: String): Model = {
    val params = IndexMeta.read(spark, path)
    require(params.get("kind").contains("nb-classifier"),
      s"no nb-classifier marker at $path (kind=${params.get("kind")}) — " +
        "was this path written by NbClassifier.save?")
    Model(spark.read.parquet(s"$path/token_counts"),
      spark.read.parquet(s"$path/totals"))
  }
}
