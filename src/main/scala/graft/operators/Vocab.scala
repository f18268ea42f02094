package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-level vocabulary statistics — the aggregations tokenizer training
 * starts from. [[graft.functions.Text]] covers per-document signals (token
 * counts, quality ratios); this module covers the corpus-wide frequency
 * tables: token counts, top-k vocabulary, and adjacent-token pair counts
 * (the statistic one BPE merge step maximises — Sennrich et al. 2016,
 * "Neural Machine Translation of Rare Words with Subword Units", §3).
 *
 * Scale shape: every operator here is explode → hash aggregate. The
 * explode multiplies rows by tokens-per-doc, but partial (map-side)
 * aggregation collapses the blowup inside each task before any shuffle —
 * what crosses the wire is bounded by the DISTINCT token/pair space per
 * task, not the token stream. Top-k variants go through `orderBy(...)
 * .limit(k)`, which Spark plans as TakeOrderedAndProject: each task keeps
 * a k-row heap and the driver merges task heaps — no global sort, no
 * single-partition exchange (plan-shape spec pins this).
 *
 * Tokenization is [[graft.functions.Text.tokens]]' convention (trim, split
 * on `\s+`) so corpus frequencies agree with the per-doc token counts, and
 * every formula is reproducible in any ANSI engine (the DuckDB oracle
 * mirrors them: `string_split_regex` + `unnest`).
 */
object Vocab {

  /** Lower-cased whitespace tokens of one document (empty text → empty
    * array, so exploded docs with no tokens vanish instead of contributing
    * an empty-string token). */
  def tokensOf(text: Column, lowercase: Boolean = true): Column = {
    val t = if (lowercase) lower(trim(text)) else trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /**
   * Corpus token frequencies `(token, n)`. `minCount` prunes the long tail
   * AFTER aggregation (a frequency threshold is the standard vocab cut);
   * at 100 TB the post-shuffle state is the distinct-token space — tens of
   * millions of rows at web scale, trivially partitioned — while the
   * trillions of token instances never leave their scan tasks unaggregated.
   */
  def wordCounts(df: DataFrame, text: String, minCount: Long = 1L,
      lowercase: Boolean = true): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    df.select(explode(tokensOf(col(text), lowercase)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Top-k vocabulary, deterministically ordered (count desc, token asc —
    * ties must not depend on partitioning). Planned as a per-task bounded
    * heap (TakeOrderedAndProject), never a global sort. */
  def topTokens(df: DataFrame, text: String, k: Int,
      lowercase: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    wordCounts(df, text, lowercase = lowercase)
      .orderBy(col("n").desc, col("token").asc).limit(k)
  }

  /** Adjacent-pair strings ("tok_i tok_i+1") of one document's token
    * array; docs with fewer than two tokens contribute nothing. Guarded:
    * Spark's `sequence(1, 0)` counts DOWN, so the degenerate case must
    * short-circuit to an empty array rather than fabricate a pair. */
  def adjacentPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /**
   * Corpus adjacent-token pair frequencies `(pair, n)` — one BPE merge
   * step ranks exactly this table and fuses the top pair. Same explode →
   * partial-agg shape as [[wordCounts]]; the pair space is larger than the
   * token space (quadratic in vocab at worst) so `minCount` matters more
   * here — BPE only ever needs the head of this distribution.
   */
  def pairCounts(df: DataFrame, text: String, minCount: Long = 1L,
      lowercase: Boolean = true, vocabLimit: Int = 0): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // materialize the token array behind a projection boundary: inlining
    // tokensOf into the pair lambda would re-run the split per PAIR
    // (element_at references the split expression twice per element —
    // O(tokens²) splits per doc; measured 9.9 s → sub-second at sf0.1)
    val toks = df.select(tokensOf(col(text), lowercase).as("__toks"))
    val pairs = toks.select(explode(adjacentPairs(col("__toks"))).as("pair"))
    // `vocabLimit` > 0 bounds the pair SPACE to the top-V vocabulary: the
    // pre-aggregation filter keeps only pairs whose BOTH sides are top-V
    // tokens (an out-of-vocab token breaks adjacency — its neighbors are
    // never spliced into a fabricated pair), so per-task aggregation
    // state is ≤ V² keys instead of (distinct pairs in the corpus). On
    // Zipfian text partial aggregation collapses the stream anyway, but
    // adversarial (uniform-random) token streams realize ~vocab² distinct
    // pairs and spill (measured: 50 GB at 5M docs × 5k-word vocab,
    // SCALE.md); BPE merges can only ever pick pairs of frequent symbols,
    // so the cut is semantically free for tokenizer training. Tokens are
    // whitespace-split, so the pair string splits back unambiguously.
    val kept =
      if (vocabLimit <= 0) pairs
      else {
        // two broadcast hash semi-joins (O(1) lookup per side) — an
        // array_contains over the vocab array would scan V entries per
        // pair instance
        val top = toks.select(explode(col("__toks")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc).limit(vocabLimit)
          .select(col("token"))
        pairs
          .withColumn("__l", element_at(split(col("pair"), " "), 1))
          .withColumn("__r", element_at(split(col("pair"), " "), 2))
          .join(broadcast(top.withColumnRenamed("token", "__l")),
            Seq("__l"), "left_semi")
          .join(broadcast(top.withColumnRenamed("token", "__r")),
            Seq("__r"), "left_semi")
          .select(col("pair"))
      }
    kept
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Top-k pairs, deterministically ordered — the BPE merge candidates. */
  def topPairs(df: DataFrame, text: String, k: Int,
      lowercase: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    pairCounts(df, text, lowercase = lowercase)
      .orderBy(col("n").desc, col("pair").asc).limit(k)
  }

  /**
   * Corpus coverage of a candidate vocabulary: what fraction of all token
   * INSTANCES the top-k vocabulary covers — the number a tokenizer sizing
   * decision reads (k is chosen where marginal coverage flattens). One
   * aggregation over [[wordCounts]]' output (distinct-token-space sized,
   * never the token stream) joined against the top-k set; returns a single
   * row `(vocab_size, covered, total, coverage)`.
   */
  def coverage(df: DataFrame, text: String, k: Int,
      lowercase: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // the counts frame feeds BOTH the top-k heap and the coverage join;
    // persist it (distinct-token-space sized — the small side) so the token
    // stream, the big cost at scale, is exploded and aggregated exactly once
    val counts = graft.core.Caches.track(
      wordCounts(df, text, lowercase = lowercase))
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(k)
    // one pass over the (distinct-token-sized) counts frame: broadcast the
    // k-row vocabulary as a membership tag and sum both sides conditionally
    counts
      .join(broadcast(top.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .agg(coalesce(sum(when(col("__in") === 1, col("n"))), lit(0L))
          .as("covered"),
        sum(col("n")).as("total"))
      .select(lit(k).as("vocab_size"), col("covered"), col("total"),
        (col("covered").cast("double") / col("total").cast("double"))
          .as("coverage"))
  }
}
