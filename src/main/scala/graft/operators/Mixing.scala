package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Weighted corpus mixing — the "N epochs of Wikipedia, 0.3 epochs of web"
 * recipe every LLM pre-training run starts from, as a deterministic
 * engine-portable operator rather than a seeded random sample.
 *
 * A domain with weight `w` contributes `floor(w)` full passes (epochs) over
 * its rows plus one fractional pass keeping the rows whose stable content
 * hash bucket falls below `round((w - floor(w)) * 100)` — the same
 * md5-digit bucket [[Sampling.hashBucket]] uses, so the fractional subset
 * is reproducible forever, portable across engines, and CONSISTENT with
 * the train/test splits cut from the same key (weight granularity is 1%,
 * documented in the scaladoc of [[mixCorpus]]).
 *
 * Scale shape: pure per-row narrow expressions — a CASE chain for the
 * weight, one hash, one `explode(sequence)` for the epoch copies. No
 * shuffle, no state, no driver data; at 100 TB the operator is exactly as
 * parallel as the scan feeding it. Upsampling multiplies output rows by
 * design (that is what an epoch is); the downstream writer's partitioning,
 * not this operator, bounds task size.
 */
object Mixing {

  /**
   * Replicate/sample `df` so each domain appears `weights(domain)` times in
   * expectation, tagging every copy with a 0-based `epoch` column.
   *
   * - `key`: stable row identity (drives the fractional-epoch hash; use the
   *   same key as the corpus' train/test split so the fractional subset is
   *   a prefix of the training split's hash order, never a fresh lottery).
   * - `domain`: the mixture stratum (source, language, quality tier).
   * - weights < 1 downsample (epoch 0 only, hash-selected fraction);
   *   weights > 1 upsample (full epochs 0..floor(w)-1, then the hash
   *   fraction as the last epoch). Granularity is 1% — weights are rounded
   *   to the nearest 0.01, matching the 100-bucket hash.
   * - rows whose domain is unlisted get `defaultWeight`.
   *
   * Rows with `weight = 0` (or a fractional part selecting them out) are
   * dropped, as an empty epoch array explodes to nothing.
   */
  def mixCorpus(
      df: DataFrame, key: String, domain: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(w => w >= 0.0),
      "mixCorpus weights must be non-negative")
    // one CASE chain, deterministic order for stable plans (Sampling's trick)
    val weightCol = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (d, w)) => when(domain === d, lit(w)).otherwise(acc)
    }
    // integer percent 0..., so 2.5 → 250: floor(/100) full epochs + (%100)
    // fractional percent. Rounding ONCE here keeps 0.1-style doubles exact.
    val pct = round(weightCol * 100).cast("int")
    val fullEpochs = (pct / 100).cast("int")
    val fracPct = pct % 100
    val copies = fullEpochs +
      when(Sampling.hashBucket(col(key)) < fracPct, 1).otherwise(0)
    df.withColumn("epoch",
        explode(when(copies > 0, sequence(lit(0), copies - 1))
          .otherwise(array().cast("array<int>"))))
  }

  /**
   * Derive the per-domain weights a temperature-flattened mixture needs,
   * instead of hand-tuning them: with temperature `t`, domain sampling
   * probabilities are p_d ∝ n_d^(1/t) (t = 1 keeps natural proportions,
   * t → ∞ approaches uniform over domains — the standard remedy for a
   * head-heavy corpus where one crawl dominates). The returned weights
   * feed [[mixCorpus]] directly: w_d = (p_d · targetRows) / n_d, i.e. the
   * expected-epoch factor that makes the mixed corpus hit `targetRows`
   * rows in expectation with the flattened shares. Weights are rounded to
   * mixCorpus's 1% granularity, so realized totals drift below 1% of
   * target.
   *
   * One count aggregation; the collect is bounded by the number of
   * domains (a mixture recipe is human-sized by definition).
   */
  def temperatureWeights(
      df: DataFrame, domain: Column, t: Double,
      targetRows: Long): Map[String, Double] = {
    require(t > 0, "temperature must be positive")
    require(targetRows > 0, "targetRows must be positive")
    val counts = df.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val powed = counts.map { case (d, n) => d -> math.pow(n.toDouble, 1.0 / t) }
    val z = powed.values.sum
    powed.map { case (d, p) =>
      d -> math.rint((p / z) * targetRows / counts(d) * 100) / 100
    }
  }

  /**
   * The audit that belongs next to every mix: realized per-domain row
   * counts and their share of the mixed corpus, with the distinct source
   * rows drawn (upsampling repeats rows; `n_source_rows` is what a
   * dedup-sensitive consumer checks). One aggregation, one shuffle.
   */
  def mixReport(mixed: DataFrame, key: String, domain: Column): DataFrame =
    mixed.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(key)).as("n_source_rows"))
      .withColumn("share", col("n_rows").cast("double") /
        sum(col("n_rows")).over().cast("double"))
}
