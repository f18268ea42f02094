package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * BM25 lexical retrieval over a document corpus — the missing sibling of the
 * embedding-ANN family ([[Similarity]], [[IvfIndex]]): keyword search for
 * corpus exploration, retrieval-based decontamination, and quality-probe
 * queries against a training corpus.
 *
 * Scoring is Okapi BM25 with the Lucene-style non-negative IDF
 * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework";
 * idf = ln((N - df + 0.5)/(df + 0.5) + 1)):
 *
 *   score(D, Q) = SUM_t idf(t) * tf(t,D)*(k1+1) / (tf(t,D) + k1*(1 - b + b*|D|/avgdl))
 *
 * Scale shape (the part that matters at 100 TB):
 *  - The postings build is ONE (doc, term) hash shuffle; doc length is
 *    denormalized into each posting row (the classic norm-in-posting trick)
 *    so scoring never rejoins the full corpus.
 *  - A query touches only its own terms' postings. In-memory: an `isin`
 *    filter that pushes into the scan. Persisted ([[Bm25Index]]): postings
 *    are PARTITIONED by a term hash bucket, so a query prunes to
 *    |Q| directories out of `buckets` — the scan reads a few thousandths
 *    of a 100 TB index, never the corpus.
 *  - Per-term df and the 2-scalar corpus stats ride broadcast joins;
 *    the final per-doc sum is a map-side-combinable hash agg on the
 *    (small) candidate set; top-k compiles to TakeOrderedAndProject —
 *    no global sort, no single-partition exchange.
 *
 * Tokenization is the corpus-wide whitespace convention (`Text.tokens`,
 * oracle-parity proven by q33); empty docs carry no postings and do not
 * count toward N or avgdl.
 */
object Bm25 {

  /** k1 tempers tf saturation; b the length normalization (defaults are the
   *  standard Robertson values). */
  final case class Params(k1: Double = 1.2, b: Double = 0.75)

  val TermCol = "term"
  val TfCol = "tf"
  val DlCol = "dl"

  /**
   * Postings frame: one row per (doc, term) with the term frequency and the
   * denormalized doc length. ONE hash shuffle on (id, term): the doc length
   * is computed from the token array BEFORE the explode and rides through
   * the groupBy as `first` — no second pass, no window re-shuffle.
   *
   * The (id, term) keys are near-unique, so the partial (map-side) agg
   * reduces almost nothing and its per-task hash table buffers close to
   * the task's whole exploded input. Building over a compactly-written
   * corpus (few big splits) that table spilled a measured 49.5 GB at 1M
   * docs — [[Bm25Index]]'s build path pre-splits the docs so each task's
   * table stays memory-sized (the explode's ~30× byte expansion is the
   * sizing input, not the parquet bytes). Ad-hoc query paths (q106's
   * term-filtered scoring) never hit this: a term filter pushes below the
   * aggregate, so only the query terms' rows ever reach the hash table.
   * (A doc-local run-length formulation would avoid the agg entirely, but
   * lambda-captured expressions re-evaluate PER ELEMENT inside
   * higher-order functions — measured as a runaway, each doc re-sorting
   * its token array hundreds of times. The shuffle is the honest plan.)
   */
  def postings(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = Text.tokens(col(text))
    docs
      .where(length(trim(col(text))) > 0)
      .select(col(id), size(toks).cast("double").as(DlCol),
        explode(toks).as(TermCol))
      .groupBy(col(id), col(TermCol))
      .agg(count(lit(1)).as(TfCol), first(col(DlCol)).as(DlCol))
  }

  /** 1-row corpus stats (n docs, average doc length) straight off the docs
   *  scan — a global partial agg, NO shuffle (vs re-aggregating postings,
   *  which would re-key terms-per-doc × docs rows by doc). */
  def corpusStats(docs: DataFrame, text: String): DataFrame =
    docs.where(length(trim(col(text))) > 0)
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(Text.tokens(col(text)))).as("avgdl"))

  /** Per-query-term document frequency, computed from the postings already
   *  filtered to the query's terms (df(t) only needs t's own postings). */
  private def termDf(queryPost: DataFrame): DataFrame =
    queryPost.groupBy(col(TermCol))
      .agg(count(lit(1)).cast("double").as("df"))

  private def scoreExpr(p: Params): Column = {
    val idf = log(
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col(TfCol) * lit(p.k1 + 1.0) /
      (col(TfCol) + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * col(DlCol) / col("avgdl")))
    idf * norm
  }

  /**
   * Score and rank: top-k docs for a bag of query terms. `stats` must be the
   * corpus-wide 1-row frame (it is NOT derivable from the filtered postings).
   * Ordering is total — rounded score desc, then id — so results are
   * deterministic across engines and runs.
   */
  def topK(post: DataFrame, stats: DataFrame, id: String,
           queryTerms: Seq[String], k: Int,
           p: Params = Params()): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 query needs at least one term")
    require(k > 0, s"top-k needs k > 0, got $k")
    val qp = post.where(col(TermCol).isin(queryTerms.distinct: _*))
    qp.join(broadcast(termDf(qp)), TermCol)
      .crossJoin(broadcast(stats))
      .groupBy(col(id))
      .agg(sum(scoreExpr(p)).as("score_raw"))
      .select(col(id), round(col("score_raw"), 6).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

  /** Convenience: postings + stats + topK in one call (the oracle-pinned
   *  q106 path). For repeated queries, build [[Bm25Index]] once instead. */
  def search(docs: DataFrame, id: String, text: String,
             queryTerms: Seq[String], k: Int,
             p: Params = Params()): DataFrame =
    topK(postings(docs, id, text), corpusStats(docs, text), id,
      queryTerms, k, p)
}

/**
 * Persisted BM25 postings index with the engine's standard index
 * lifecycle ([[BandIndex]]'s discipline): `save` bootstraps, `append` adds
 * a batch's postings into the same bucket layout (touched partitions gain
 * files, nothing rewrites), `removeIds` tombstones retracted docs —
 * O(|ids|), subtracted by every `query` before scoring so taken-down
 * content can NEVER surface — and `vacuum` makes removal physical via the
 * shared crash-safe [[PartitionVacuum]] and re-derives exact corpus stats.
 *
 * Layout: postings PARTITIONED by a term hash bucket (`tb=<0..buckets-1>/`)
 * so a query's scan directory-prunes to its own terms; corpus stats as
 * additive 1-row generations `(n, sum_dl, buckets)` summed at read —
 * append is a generation append, never a read-modify-write (the
 * [[BloomIndex]] ledger rule). The bucket function is xxhash64
 * (engine-native — the index is internal, the oracle never hashes it),
 * recomputed at query time, so pruning needs no driver-side dictionary.
 *
 * At 10B docs the postings are ~terms-per-doc × docs rows, but any single
 * query reads |Q| buckets' directories — pruned exactly like [[IvfIndex]]
 * probes prune cells.
 *
 * Drift note: between a retraction and its vacuum, the tombstoned docs
 * still count inside (n, avgdl, df) — scoring CONSTANTS drift slightly
 * while membership stays exact (the [[BloomIndex]] stance: bits persist,
 * the ledger decides). `vacuum` restores exact constants; run it on the
 * nightly maintenance cadence.
 *
 * Replay contract (the ingest pipeline's at-least-once nights): `append`
 * takes the batch's idempotence key as `gen`. Stats generations live
 * under `stats/gen=<key>/` and a replay REPLACES its own generation —
 * constants stay exact. Replayed postings ROWS do duplicate, but they
 * are byte-identical by determinism (tf/dl are functions of the text),
 * and `query` collapses them with a per-candidate (id, term) distinct —
 * so scores never change; `compact` folds the litter physically, touched
 * buckets only. Reusing a `gen` key for a DIFFERENT batch breaks this —
 * the key is one batch's identity, exactly like a night id.
 */
object Bm25Index {

  val BucketCol = "tb"
  val GenCol = "gen"

  private def bucketOf(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets)).cast("int")

  /** One additive stats generation for a doc batch. */
  private def statsDelta(docs: DataFrame, text: String, buckets: Int,
                         gen: String): DataFrame =
    docs.where(length(trim(col(text))) > 0)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(size(Text.tokens(col(text)))).cast("double").as("sum_dl"))
      .withColumn("buckets", lit(buckets))
      .withColumn(GenCol, lit(gen))

  /** (buckets, 1-row (n, avgdl) frame) from the summed generations. */
  private def readStats(spark: SparkSession,
                        path: String): (Int, DataFrame) = {
    val gens = spark.read.parquet(s"$path/stats")
    val buckets = gens.select(col("buckets")).head().getInt(0)
    (buckets, gens.agg(sum(col("n")).as("n"),
      (sum(col("sum_dl")) / sum(col("n"))).as("avgdl")))
  }

  private def writePostings(docs: DataFrame, id: String, text: String,
                            path: String, buckets: Int,
                            mode: String): Unit = {
    // Pre-split the docs so each build task's partial-agg hash table (≈ its
    // whole exploded input — near-unique keys, see Bm25.postings) stays
    // memory-sized: parquet packs small corpus files into few 128 MB
    // splits, and ONE task buffering a compact corpus's explode spilled a
    // measured 49.5 GB at 1M docs. The 128× factor is measured, not the
    // serialized 38×: UnsafeRow overhead plus the sort/write buffers each
    // task runs alongside its table, against ~150 MB/task of unified
    // memory at 32 local cores on the 8 GB test heap (64-way pre-split
    // still spilled 25 GB; per-task state must sit under ~100 MB).
    // ensureFor sizes from the same estimate (and raises the agg
    // shuffle's partition count); the floor keeps every core busy for
    // small builds.
    val spark = docs.sparkSession
    val parts = math.max(
      graft.core.ShuffleSizing.ensureFor(docs, expansionFactor = 128.0),
      spark.sparkContext.defaultParallelism * 2)
    Bm25.postings(docs.repartition(parts), id, text)
      .withColumn(BucketCol, bucketOf(col(Bm25.TermCol), buckets))
      .repartition(col(BucketCol))
      // term-sorted row groups: parquet min/max stats then prune a query's
      // `term IN` WITHIN each bucket file, not just across bucket dirs.
      // (A multi-task-per-bucket write — repartition on (bucket, term) —
      // was measured round 20: it pays a full extra postings shuffle and
      // the residual spill barely moves (25→19 GB accounting), because
      // the spill lives in the near-unique-key agg, not the write sort;
      // the single-task-per-bucket write stays.)
      .sortWithinPartitions(col(BucketCol), col(Bm25.TermCol))
      .write.mode(mode).partitionBy(BucketCol)
      .parquet(s"$path/postings")
  }

  private def writeStatsGen(delta: DataFrame, path: String,
                            mode: String): Unit =
    delta.coalesce(1).write.mode(mode).partitionBy(GenCol)
      .parquet(s"$path/stats")

  /** Bootstrap the index. Postings land first, stats last — a bootstrap
    * crash leaves no stats generation and `query` fails loudly on the
    * missing path (never silently wrong constants); re-run `save`.
    * `gen` labels the bootstrap batch's stats generation: an ingest
    * surface bootstrapping from its FIRST batch must pass the same
    * idempotence key `append` would get, so a replay that finds the index
    * already bootstrapped appends over (replaces) the SAME generation —
    * constants land exactly once either way. */
  def save(docs: DataFrame, id: String, text: String, path: String,
           buckets: Int = 64, gen: String = "bootstrap"): Unit = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    writePostings(docs, id, text, path, buckets, "overwrite")
    writeStatsGen(statsDelta(docs, text, buckets, gen), path,
      "overwrite")
  }

  /** Append a batch under idempotence key `gen`: touched bucket partitions
    * gain files and the batch's stats generation is REPLACED (delete
    * before write, the key's own directory only) — a mid-night crash
    * replay lands the constants exactly once. No read-modify-write on
    * any standing generation. */
  def append(docs: DataFrame, id: String, text: String, path: String,
             gen: String): Unit = {
    val spark = docs.sparkSession
    val (buckets, _) = readStats(spark, path)
    writePostings(docs, id, text, path, buckets, "append")
    // the generation directory name must use Spark's own partition
    // escaping or a key with special characters would miss the delete
    // and double-count on replay (the IndexMeta.scala:383 lesson)
    val genDir = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString(GenCol, gen)
    val gp = new org.apache.hadoop.fs.Path(s"$path/stats/$genDir")
    gp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(gp, true)
    writeStatsGen(statsDelta(docs, text, buckets, gen), path, "append")
  }

  /** Retract docs (numeric ids — the engine's id contract): O(|ids|)
    * tombstone append; every `query` subtracts the set before scoring. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.append(spark, path, ids)

  /** Physically drop retracted docs' postings (only bucket partitions
    * holding them rewrite — crash-safe rename-aside swap) and re-derive
    * EXACT corpus stats from the survivors, folding the generation files
    * to one via stage-then-swap. A vacuum crashed between the stats delete
    * and the rename is rolled FORWARD here first (the staged dir is
    * complete by construction when the live dir is gone); a missing stats
    * dir with no stage is a bootstrap crash — `readStats` fails loudly
    * and the heal is re-running `save`. Returns postings rows removed. */
  def vacuum(spark: SparkSession, path: String, id: String): Long = {
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/stats")
    val staged = new org.apache.hadoop.fs.Path(s"$path/stats__fresh")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(statsPath) && fs.exists(staged)) {
      fs.rename(staged, statsPath) // roll a crashed stats swap forward
      ()
    }
    val removed = PartitionVacuum.vacuum(
      spark, path, s"$path/postings", BucketCol, id)
    if (removed > 0) {
      val buckets = readStats(spark, path)._1
      val fresh = spark.read.parquet(s"$path/postings")
        .groupBy(col(id))
        .agg(first(col(Bm25.DlCol)).as(Bm25.DlCol))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col(Bm25.DlCol)).as("sum_dl"))
        .withColumn("buckets", lit(buckets))
        .withColumn(GenCol, lit("folded"))
      fresh.coalesce(1).write.mode("overwrite").partitionBy(GenCol)
        .parquet(staged.toString)
      fs.delete(statsPath, true)
      fs.rename(staged, statsPath)
      ()
    }
    removed
  }

  /** Fold crash-replay posting litter: an at-least-once `append` replay
    * duplicates its batch's posting ROWS (byte-identical by determinism —
    * see the replay contract above); `query` collapses them per candidate
    * set, but the bytes persist in storage until a full rebuild. This
    * rewrites EXACTLY the bucket partitions holding duplicate (id, term)
    * rows — crash-safe via the shared aside-per-partition swap
    * ([[PartitionVacuum.replacePartitions]]) — restoring one row per
    * (id, term) and the term-sorted row groups the query path's row-group
    * pruning relies on. Returns rows folded away (0 = nothing to do,
    * nothing touched). Detection is one (bucket, id, term) count over the
    * postings — the same O(index) maintenance-cadence class as `vacuum`'s
    * semi-join scan; stats are untouched (replays REPLACE their stats
    * generation, so constants never double-count). */
  def compact(spark: SparkSession, path: String, id: String): Long = {
    val post = s"$path/postings"
    // roll back any aside a crashed rewrite stranded BEFORE scanning, or
    // its rows are invisible to the litter detection below
    PartitionVacuum.repairAt(spark, post)
    val df = spark.read.parquet(post)
    // Near-unique (id, term) keys make any hash agg's per-task table
    // buffer ≈ that task's whole input (the build-path lesson at
    // Bm25.postings) — and compact's input is the FULL postings read at
    // few compact parquet splits, which spilled a measured 90 GB of 8 GB-
    // heap accounting at 1M docs. Shuffle-first on the agg keys instead:
    // the explicit repartition satisfies the aggregate's distribution (no
    // second exchange) and slices the key space so each task's table is
    // rows/parts — the same memory-sizing discipline as the build's
    // pre-split, applied post-read because the expansion here is the
    // parquet→UnsafeRow decode, not an explode.
    val parts = math.max(
      graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 16.0),
      spark.sparkContext.defaultParallelism * 8)
    val dupBuckets = df
      .repartition(parts, col(BucketCol), col(id), col(Bm25.TermCol))
      .groupBy(col(BucketCol), col(id), col(Bm25.TermCol))
      .agg(count(lit(1)).as("__c")).where(col("__c") > 1)
      .groupBy(col(BucketCol))
      .agg(sum(col("__c") - 1).as("__extra"))
      .collect()
    if (dupBuckets.isEmpty) return 0L
    val touched: Seq[Any] = dupBuckets.map(_.get(0)).toSeq
    val folded = dupBuckets.map(_.getLong(1)).sum
    val survivors = df
      .filter(PartitionVacuum.partitionPred(BucketCol, touched))
      .repartition(parts, col(id), col(Bm25.TermCol))
      .dropDuplicates(id, Bm25.TermCol)
      // restore the bucket layout's file shape: ONE write task per bucket
      // (the build's shape) — a multi-task write was measured 2.6 GB vs
      // 18 GB spill accounting but shatters each compacted bucket into up
      // to `parts` small files, taxing every later query's file opens;
      // the accounting spill is benign (heap A/B, SCALE.md round 20),
      // the file litter is not. Term-sorted row groups for the query
      // path's min/max pruning.
      .repartition(col(BucketCol))
      .sortWithinPartitions(col(BucketCol), col(Bm25.TermCol))
    PartitionVacuum.replacePartitions(spark, post, BucketCol, touched,
      survivors)
    folded
  }

  /** Top-k for `queryTerms` reading only their buckets' postings, with
    * tombstoned docs subtracted BEFORE df/scoring (membership exact; see
    * the class note on constant drift until vacuum). */
  def query(spark: SparkSession, path: String, id: String,
            queryTerms: Seq[String], k: Int,
            p: Bm25.Params = Bm25.Params()): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 query needs at least one term")
    val (buckets, stats) = readStats(spark, path)
    val wanted = queryTerms.distinct
    // the bucket function is a Spark expression; evaluate it for the query's
    // literal terms with a |Q|-row local frame (driver-cheap, bounded by |Q|)
    val wantedBuckets = spark
      .createDataFrame(wanted.map(Tuple1(_))).toDF(Bm25.TermCol)
      .select(bucketOf(col(Bm25.TermCol), buckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(s"$path/postings")
      // directory pruning on tb + row filter on term, both pushed to the scan
      .where(col(BucketCol).isin(wantedBuckets: _*) &&
        col(Bm25.TermCol).isin(wanted: _*))
      // collapse byte-identical rows a crash-replayed append may have
      // duplicated (the replay contract above) — a distinct over the
      // already-pruned candidate set, bounded by the query's postings
      .dropDuplicates(id, Bm25.TermCol)
    Bm25.topK(Tombstones.subtract(spark, path, pruned, id),
      stats, id, wanted, k, p)
  }
}

/**
 * Rank fusion for hybrid retrieval — combine a lexical [[Bm25]] arm with a
 * dense embedding arm ([[Similarity]] / [[IvfIndex]] probes) into one
 * ranking via reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
 * "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
 * Learning Methods"):
 *
 *   rrf(d) = SUM_arms 1 / (k + rank_arm(d))        (k = 60, the paper's)
 *
 * RRF needs only each arm's RANKS, never its scores — so BM25 points and
 * cosine similarities fuse without calibration, which is exactly why it is
 * the standard hybrid-search combiner.
 *
 * Scale shape: each arm is already a top-k frame (tens of rows — the
 * expensive part, index-pruned scan or ANN probe, happened inside the
 * arm). Fusion is a union + one tiny hash agg; ordering compiles to
 * TakeOrderedAndProject. Per-arm ranks, when derived here from scores,
 * are a window over an ALREADY top-k frame — bounded rows, not a
 * corpus-wide sort.
 */
object Fusion {

  val RrfK = 60

  /** How many rows [[ranked]] will rank at most when the caller does not
   *  say: far above any real per-arm k, far below a corpus. */
  val RankedDefaultBound = 10000

  /** Derive 1-based ranks from a scored top-k frame: row_number over
   *  (rounded score desc, id) — the engine's standard total order, so
   *  ranks are deterministic across engines and runs.
   *
   *  The no-partition window is single-partition by nature, which is only
   *  safe over a frame a top-k already bounded — and nothing used to
   *  enforce that precondition: a caller passing an unbounded scored
   *  corpus got a corpus-wide one-partition sort with no warning. The
   *  bound is now STRUCTURAL: the input is first cut to `bound` rows by
   *  the SAME total order the ranks use (compiles to
   *  TakeOrderedAndProject — a per-partition heap + driver merge, never a
   *  global sort), so the window provably sees ≤ `bound` rows whatever
   *  the caller feeds it. Ranks 1..bound are identical to the unbounded
   *  frame's (the orders agree), and ranks past any real fusion's per-arm
   *  k contribute ~nothing to an RRF sum by construction. */
  def ranked(arm: DataFrame, id: String, scoreCol: String,
             bound: Int = RankedDefaultBound): DataFrame = {
    require(bound > 0, s"ranked needs a positive row bound, got $bound")
    arm
      .orderBy(round(col(scoreCol), 6).desc, col(id)).limit(bound)
      .select(col(id),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(round(col(scoreCol), 6).desc, col(id))).as("rank"))
  }

  /**
   * Hybrid search over the PERSISTED indexes — the 100 TB path: the
   * lexical arm prunes the standing [[Bm25Index]] to the query terms'
   * bucket directories, the dense arm probes the standing
   * [[IvfIndex]]'s `nprobe` cells, and the two top-k lists fuse by RRF.
   * Each arm reads an index-pruned sliver of its index and nothing else;
   * the fusion itself touches ≤ arms·kPerArm rows. The corpora behind
   * the indexes must share the id space (the engine's documents ↔
   * embeddings contract). `queryId` must not collide with a corpus id —
   * the dense probes exclude self-pairs by id.
   *
   * `ivfPqPath` adds a THIRD arm over a standing [[IvfPqIndex]] — at
   * 100 TB the dense arm IS the PQ-compressed index (the flat [[IvfIndex]]
   * stores full vectors); fusing both dense arms lets the exact-sliver
   * index and the compressed index vote, and RRF needs no score
   * calibration between them. The PQ probe is the same cell-pruned scan:
   * nprobe cell directories, ADC scoring, bounded heap.
   */
  def hybridTopK(spark: SparkSession, bm25Path: String, ivfPath: String,
                 id: String, terms: Seq[String], queryVec: Array[Float],
                 kPerArm: Int = 20, nprobe: Int = 1, queryId: Long = -1L,
                 k: Int = RrfK, topK: Int = 10,
                 ivfPqPath: Option[String] = None): DataFrame = {
    val lex = ranked(
      Bm25Index.query(spark, bm25Path, id, terms, kPerArm), id, "score")
    import spark.implicits._
    val q = Seq((queryId, queryVec)).toDF("__hq_id", "__hq_vec")
    val dense = IvfIndex.probe(spark, ivfPath, q,
        "__hq_id", "__hq_vec", kPerArm, nprobe)
      .select(col("neighbor_id").as(id), col("rank"))
    val pqArm = ivfPqPath.map { p =>
      IvfPqIndex.probe(spark, p, q, "__hq_id", "__hq_vec",
          candidates = kPerArm, nprobe = nprobe)
        .select(col("neighbor_id").as(id), col("rank"))
    }
    rrf(Seq(lex, dense) ++ pqArm, id, k = k, topK = topK)
  }

  /**
   * Fuse ranked arms: each input holds (`id`, `rankCol`) with 1-based
   * ranks. Returns (id, rrf_score, n_arms) — top `topK` by
   * (rounded score desc, id).
   */
  def rrf(arms: Seq[DataFrame], id: String, rankCol: String = "rank",
          k: Int = RrfK, topK: Int = 10): DataFrame = {
    require(arms.nonEmpty, "RRF needs at least one arm")
    require(k > 0, s"RRF constant must be positive, got $k")
    val u = arms
      .map(_.select(col(id), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionAll _)
    u.groupBy(col(id))
      .agg(round(sum(lit(1.0) / (lit(k.toDouble) + col("__r"))), 6)
          .as("rrf_score"),
        count(lit(1)).as("n_arms"))
      .orderBy(col("rrf_score").desc, col(id))
      .limit(topK)
  }
}
