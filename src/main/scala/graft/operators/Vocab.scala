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
   * Full BPE tokenizer training (Sennrich et al. 2016, §3 — the word-level
   * algorithm verbatim), shaped for scale the way real trainers are: the
   * corpus is touched in ONE distributed pass ([[wordCounts]] — the token
   * stream aggregates map-side into the distinct-word space), the
   * frequency table truncates to the top `maxWords` words (bounded driver
   * state; the tail words BPE could learn from are exactly the ones whose
   * counts can't influence early merges), and the merge loop itself runs
   * driver-side over that bounded table — numMerges × O(total symbols of
   * maxWords words), no further cluster work. This is not a shortcut: BPE
   * trains on the word-frequency DICTIONARY, not the token stream, so
   * driver-looping the dictionary is the canonical cost, and q79's
   * distributed [[pairCounts]] is the same statistic when the dictionary
   * itself would not fit one machine.
   *
   * Returns `(rank, left, right, merged, n)` — one row per learned merge
   * in training order, `n` the weighted pair count that won the rank.
   * Deterministic: ties break (count desc, left asc, right asc); merging
   * stops early (fewer rows) when no pair remains. Words are split to
   * characters with a terminal `endOfWord` symbol (the paper's `·`
   * convention) so learned units never cross word boundaries.
   */
  def trainBpe(df: DataFrame, text: String, numMerges: Int,
      maxWords: Int = 50000, lowercase: Boolean = true,
      endOfWord: String = "</w>"): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val spark = df.sparkSession
    val wc = wordCounts(df, text, lowercase = lowercase)
      .orderBy(col("n").desc, col("token").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] = wc.map { case (w, n) =>
      (w.map(_.toString).toArray :+ endOfWord, n)
    }
    val merges = Array.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c =>
          Some(c.getOrElse(0L) + n))
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, l + r, c))
        words = words.map { case (syms, n) => (mergePair(syms, l, r), n) }
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toSeq.toDF("rank", "left", "right", "merged", "n")
  }

  /** One merge applied to one symbol sequence, greedy left-to-right (the
    * paper's replacement rule: `aaa` under (a,a) becomes `aa a`, not
    * `a aa`). Shared by training and encoding so they can never drift. */
  private[operators] def mergePair(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * Encode text with a learned merge table: each word splits to
   * characters + `endOfWord`, then the merges apply IN RANK ORDER —
   * equivalent to the lowest-rank-first priority scheme, because a merge
   * can only create symbols later merges reference (`l + r` exists only
   * after its own rank). Adds `out` as an `array<string>` subword column.
   *
   * Scale shape: the merge table is rows = numMerges (bounded by
   * construction) and broadcasts; encoding is per-row imperative symbol
   * work with no cross-row state — the documented last-resort case where
   * a Scala UDF is the honest tool (no Column-algebra form exists for an
   * ordered fold over per-word symbol arrays). The merge loop itself runs
   * once per DISTINCT word a task sees, not once per instance: tokens
   * repeat Zipf-style, so a per-task word → subwords memo turns the
   * per-instance cost into one array copy (the trainer's
   * dictionary-not-stream insight applied to encoding; 20× against
   * `memoize = false` at 1M docs — ScaleBench bpe tier, SCALE.md round
   * 15). The
   * memo is bounded, so an adversarial all-unique token stream degrades
   * to the unmemoized cost instead of growing task memory; `memoize =
   * false` exists for that measurement, not for production use.
   */
  def encodeBpe(df: DataFrame, text: String, merges: DataFrame,
      out: String = "bpe_tokens", lowercase: Boolean = true,
      endOfWord: String = "</w>", memoize: Boolean = true): DataFrame = {
    val table: Array[(String, String)] = merges
      .orderBy(col("rank").asc)
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val enc = udf {
      // empty at plan time; each task deserializes its own private copy,
      // so no cross-thread sharing and no driver-side growth
      val memo = new java.util.HashMap[String, Array[String]](1 << 12)
      (t: String) =>
        if (t == null) null
        else {
          val base = if (lowercase) t.trim.toLowerCase else t.trim
          val ws = if (base.isEmpty) Array.empty[String] else base.split("\\s+")
          ws.flatMap { w =>
            var syms = if (memoize) memo.get(w) else null
            if (syms == null) {
              syms = w.map(_.toString).toArray :+ endOfWord
              table.foreach { case (l, r) => syms = mergePair(syms, l, r) }
              if (memoize && memo.size < 1000000) memo.put(w, syms)
            }
            syms
          }
        }
    }
    df.withColumn(out, enc(col(text)))
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

  /**
   * Persist a learned BPE tokenizer as an artifact: the merge table as
   * parquet (one file — numMerges rows is human-sized by construction)
   * plus an [[IndexMeta]] marker recording the ENCODING parameters
   * (lowercase, endOfWord, numMerges). A tokenizer is params + merges
   * together: an encoder run with different case-folding or a different
   * end-of-word symbol than the trainer produces silently different
   * subwords — the band-index parameter-drift lesson applied to
   * tokenizers, which is why [[encodeBpeFrom]] takes its parameters from
   * the artifact, never the caller. Overwrite semantics
   * (retrain-and-replace); training corpora evolve by re-running
   * [[trainBpe]], not by editing merges.
   */
  def saveBpe(merges: DataFrame, path: String,
      lowercase: Boolean = true, endOfWord: String = "</w>"): Unit = {
    val n = merges.count()
    merges.orderBy(col("rank").asc).coalesce(1)
      .write.mode("overwrite").parquet(path)
    IndexMeta.write(merges.sparkSession, path,
      Map("kind" -> "bpe", "lowercase" -> lowercase.toString,
        "endOfWord" -> endOfWord, "numMerges" -> n.toString))
  }

  /** Encode with a SAVED tokenizer — parameters come from the artifact's
    * marker (caller drift is impossible by construction); fails fast on a
    * path that is not a [[saveBpe]] artifact. */
  def encodeBpeFrom(df: DataFrame, text: String, path: String,
      out: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val params = IndexMeta.read(spark, path)
    require(params.get("kind").contains("bpe"),
      s"no BPE tokenizer marker at $path (kind=${params.get("kind")}) — " +
        "was this path written by Vocab.saveBpe?")
    encodeBpe(df, text, spark.read.parquet(path), out,
      lowercase = params("lowercase").toBoolean,
      endOfWord = params("endOfWord"))
  }
}
