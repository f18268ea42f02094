package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import graft.operators.{BandIndex, Dedup}

/**
 * Structured-Streaming extension of the batch-incremental CDC model.
 *
 * The reference is batch-only (ref: SURVEY.md §2.11 — high-water-mark
 * predicates + scheduled tasks), but the same event tables arrive as streams
 * at scale, so the engine ships streaming counterparts of its two core
 * incremental shapes:
 *  - windowed aggregation with a watermark (late-data bound), and
 *  - streaming latest-version-per-key upsert via
 *    `flatMapGroupsWithState`-free `dropDuplicates` / window-agg composition.
 *
 * Local smoke path: memory sink + `processAllAvailable()` so a directory of
 * parquet drives the query synchronously in tests.
 */
object Streams {

  /** Eager pin with MEASURED statistics
    * ([[org.apache.spark.sql.graft.ColumnBridge.pinnedWithMeasuredStats]]):
    * a plain `localCheckpoint(true)` copies the origin plan's cost-model
    * estimate onto the pinned frame, and in the ingest sinks that estimate
    * is a join-product guess off by orders of magnitude. In a STREAMING
    * session the stakes are higher than in batch: ShuffleSizing raises are
    * raise-only, so one poisoned micro-batch would leave every later
    * micro-batch of a months-long query mis-sized. Used via
    * `.transform(pin)` at every sink pin site. */
  private def pin(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.pinnedWithMeasuredStats(df)

  /** Tumbling-window event counts/sums with watermark, matching the batch
   *  `groupBy(window(...))` semantics. */
  def windowedEventAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Start a memory-sink query for a streaming DataFrame (tests/smoke). */
  def startMemorySink(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()

  /**
   * Streaming latest-version-per-key — the streaming counterpart of
   * `Cdc.latestVersion` (W1): custom keyed state via `mapGroupsWithState`
   * holds the current winner per key and emits it whenever a newer version
   * (by event time, then a sequence column) arrives. Output mode `update`.
   *
   * State is one small row per key — the minimal CDC upsert state — so
   * memory scales with |keys|, not |events|; at cluster scale the state
   * store shards by the groupBy key exactly like the batch shuffle.
   */
  def latestVersionStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoders, Row}
    val spark = events.sparkSession
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(events.schema)
    implicit val verEnc: org.apache.spark.sql.Encoder[(java.sql.Timestamp, Long, Row)] =
      Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaLong, rowEnc)
    import spark.implicits._
    // null-safe accessors: one malformed CDC row (null key/ts/seq) must not
    // kill the streaming query — batch latestVersion tolerates the same rows
    def seqOf(r: Row): Long =
      Option(r.getAs[Number](seqCol)).map(_.longValue()).getOrElse(Long.MinValue)
    def tsOf(r: Row): Long =
      Option(r.getAs[java.sql.Timestamp](tsCol)).map(_.getTime).getOrElse(Long.MinValue)
    events.groupByKey(r => Option(r.getAs[Any](keyCol)).map(_.toString).orNull)
      .mapGroupsWithState[(java.sql.Timestamp, Long, Row), Row](
        GroupStateTimeout.NoTimeout()) { case (_, rows, state) =>
        // iterator FOLD, not buffer-then-max: a hot key with millions of
        // events in one micro-batch holds O(1) rows in memory, never the
        // whole group
        val best = rows.foldLeft(state.getOption.map(_._3).orNull) { (acc, r) =>
          if (acc == null || Ordering[(Long, Long)].lt((tsOf(acc), seqOf(acc)), (tsOf(r), seqOf(r)))) r
          else acc
        }
        state.update((best.getAs[java.sql.Timestamp](tsCol), seqOf(best), best))
        best
      }
  }

  /** Read a parquet file's rows as a file stream (schema must be supplied). */
  def parquetStream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** Micro-batch twin of [[graft.reports.IngestPipeline]]'s `statsSketch`
    * step: sketch a batch's ACCEPTED survivors into the mergeable
    * corpus-statistics state ([[graft.operators.Sketches]]) from an ingest
    * sink's `accept` callback. The state partition is keyed by the batch
    * id (`night = "b<batchId>"`), so an at-least-once REPLAY of a
    * micro-batch overwrites its own contribution instead of
    * double-counting — the same idempotence contract foreachBatch's
    * batchId gives the landing itself. Lifetime stats:
    * [[graft.operators.Sketches.mergedStats]] over the state path reads
    * O(batches × groups) sketch rows, never the corpus. */
  def sketchAccepted(survivors: DataFrame,
      spec: graft.operators.Sketches.SketchSpec, statePath: String,
      batchId: Long): Unit =
    graft.operators.Sketches.appendNight(survivors, spec, statePath,
      s"b$batchId")

  /** Micro-batch twin of [[graft.reports.IngestPipeline]]'s `bm25IndexPath`
    * target: append a batch's ACCEPTED survivors' BM25 postings to the
    * standing keyword index from an ingest sink's `accept` callback
    * (bootstrap on the first batch). The stats generation is keyed by the
    * batch id (`gen = "b<batchId>"`), so an at-least-once REPLAY replaces
    * its own scoring-constant contribution instead of double-counting,
    * and the replay-duplicated posting rows collapse in every query's
    * candidate distinct — [[graft.operators.Bm25Index]]'s replay contract
    * riding foreachBatch's batchId, exactly like [[sketchAccepted]].
    * Sweep with `Bm25Index.vacuum` + compaction on the nightly cadence. */
  def bm25Accepted(survivors: DataFrame, idCol: String, textCol: String,
      indexPath: String, batchId: Long, buckets: Int = 64): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(
      survivors.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      // batch key as the bootstrap generation too: a replayed bootstrap
      // batch takes the append arm and REPLACES this same generation
      graft.operators.Bm25Index.save(survivors, idCol, textCol, indexPath,
        buckets = buckets, gen = s"b$batchId")
    else
      graft.operators.Bm25Index.append(survivors, idCol, textCol, indexPath,
        gen = s"b$batchId")
  }

  /**
   * Streaming gap-based sessionization — the streaming counterpart of
   * `Cdc.sessionize` (q52), composed from Spark's native `session_window`
   * (dynamic-gap session merging in the state store) rather than
   * hand-rolled `flatMapGroupsWithState`: Catalyst manages per-key session
   * state, merges overlapping windows across micro-batches, and emits each
   * session exactly once when the watermark passes its end. State is one
   * small merged window per open session per key.
   *
   * Note the end-bound convention: `session_end` here is the window end
   * (= last event + gap, the point at which the session is provably
   * closed); the batch form's session extent [min ts, max ts] is
   * recoverable as [session_start, session_end - gap].
   */
  def sessionizeStream(
      events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol).as("key"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /**
   * Streaming exact dedup — the streaming counterpart of
   * `Dedup.dropExactDuplicates` (q26): ONE row survives per content hash.
   * A duplicate in a later micro-batch than its original always drops;
   * within a single micro-batch the surviving duplicate is arbitrary
   * (partition order), matching `dropDuplicatesWithinWatermark` semantics —
   * the batch operator's deterministic min-id pick needs a global view a
   * stream doesn't have. Built on the native
   * `dropDuplicatesWithinWatermark`, so the state store keeps one compact
   * md5 entry per distinct document and EVICTS entries older than the
   * watermark — without the watermark bound, streaming dedup state grows
   * with the corpus forever, which is the operational failure mode at
   * ingest scale. Duplicates arriving farther apart than the watermark
   * delay both survive (the dedup guarantee is scoped to the watermark
   * window); run the batch operator over the landed data for a final
   * global pass.
   */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs.withColumn("__text_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /**
   * Streaming NEAR-dup ingest against a standing persisted band index —
   * the nightly probe → accept → append cycle ([[BandIndex]]) as a
   * Structured Streaming sink. Each micro-batch:
   *
   *   1. MinHash-hashes ONLY the batch (`Dedup.lshBanded` — O(batch); the
   *      standing corpus is never re-hashed),
   *   2. probes the on-disk index for batch-vs-corpus candidate pairs
   *      ([[BandIndex.probe]] — the batch's bucket keys broadcast as a
   *      semi-join over the index scan),
   *   3. drops batch docs in any candidate pair; with `dedupWithinBatch`,
   *      also drops the GREATER id of every intra-batch pair (greedy
   *      keep-min — run `Dedup.dupClusters` over landed data when exact
   *      cluster-canonical resolution matters),
   *   4. appends the survivors' already-computed banded rows to the index
   *      (only touched band directories gain files) and hands the
   *      surviving rows to `accept` for delivery.
   *
   * All cross-batch state lives in the on-disk index — no state store, so
   * state never grows in memory and a restart resumes from the checkpoint
   * with the index reflecting exactly the accepted prefix. A missing index
   * path bootstraps: the first batch probes nothing and its survivors
   * found the index. NOTE `foreachBatch` gives at-least-once side-effect
   * semantics: a batch replayed after a crash between append and commit
   * re-appends its banded rows (duplicate index rows — compact the index
   * periodically). The probe is REPLAY-IDEMPOTENT: the batch's own ids are
   * anti-joined off the corpus side before probing, so a replayed batch
   * sees exactly the pre-append corpus view — without that exclusion, a
   * batch doc pairing with a batch-MATE's already-appended rows would put
   * the previously-accepted survivor in the drop set and silently skip its
   * delivery.
   *
   * `spanDedupK` (opt-in, as [[graft.reports.IngestPipeline]]'s step 0):
   * duplicated k-token spans INSIDE each micro-batch are cut before
   * hashing, so the probe fingerprints — and `accept` receives — the
   * cleaned text (within-crawl boilerplate; O(batch) windows,
   * deterministic, so a replayed batch recuts the same spans). Batch-local
   * only: cross-batch span state would be a standing window index ~3× the
   * corpus in bytes (SCALE.md round 15) — run the batch operator over
   * landed data when corpus-wide span dedup matters.
   *
   * Returns the configured writer — caller sets checkpoint/trigger and
   * calls `start()`.
   */
  def nearDupIngestStream(
      docs: DataFrame, idCol: String, textCol: String, indexPath: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue, portable: Boolean = true,
      dedupWithinBatch: Boolean = true,
      spanDedupK: Option[Int] = None,
      // packed-keeper escape hatch + case-insensitive matching, as
      // IngestConfig.spanDedupPacked / spanDedupLowercase
      spanDedupPacked: Boolean = true,
      spanDedupLowercase: Boolean = false,
      // (opt-in) the EXACT-dup gate, as IngestConfig.bloomIndexPath:
      // byte-identical re-submissions drop against the standing
      // BloomIndex BEFORE this batch pays shingling + permutations —
      // same shared semantics (BloomIndex.exactGate: keep-min intra
      // resolution, replay-safe verify exclusion), survivor keys append
      // after the band append (bootstrap save on the first non-empty
      // batch; bloom-bits-first ordering keeps crashes false-positive-
      // only). Compact the bloom index on the same cadence as the band
      // index.
      bloomIndexPath: Option[String] = None,
      bloomShards: Int = 64,
      bloomBitsPerShard: Long = 1L << 23,
      // (opt-in) the EVAL-SET CONTAMINATION GATE, as
      // IngestConfig.evalSetPath: micro-batch docs whose word-k-shingle
      // containment against the staged eval set passes the threshold drop
      // BEFORE banding — the SHARED Dedup.contaminationGate, so the
      // nightly and streaming surfaces cannot drift, and eval data never
      // enters a stream-fed corpus or its band index either
      evalSetPath: Option[String] = None,
      evalGateK: Int = 8,
      evalGateMinOverlap: Long = 1L,
      evalGateContainment: Double = 0.8,
      evalGateMaxShingleDf: Long = Long.MaxValue,
      // (opt-in) the LM QUALITY GATE, as IngestConfig.lmModelPath: docs
      // past the cross-entropy ceiling under the persisted bigram LM drop
      // BEFORE banding — the SHARED NgramLm.qualityGate, so stream-fed
      // corpora get the same CCNet tail cut as the nightly surface.
      // Unscorable docs (< 2 tokens) pass, same contract
      lmModelPath: Option[String] = None,
      lmGateMaxCe: Double = Double.PositiveInfinity,
      // (opt-in) the CLASSIFIER GATE, as IngestConfig.nbModelPath:
      // micro-batch docs failing the GPT-3 pareto keep rule under the
      // persisted NB model drop BEFORE banding — the SHARED
      // NbClassifier.paretoGate; the draw is id-hash-seeded, so an
      // at-least-once replay re-derives the same verdicts. Zero-token
      // docs pass, same contract
      nbModelPath: Option[String] = None,
      nbParetoShape: Double = graft.operators.NbClassifier.ParetoShape)
      (accept: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (raw: Dataset[Row], batchId: Long) =>
      val spark = raw.sparkSession
      val prepped = spanDedupK match {
        case Some(k) =>
          Dedup.removeDuplicateSpans(raw.toDF(), idCol, textCol, k,
              lowercase = spanDedupLowercase, packedKeeper = spanDedupPacked)
            .drop(textCol).drop("removed_tokens")
            .withColumnRenamed("clean_text", textCol)
            .select(raw.columns.map(col).toSeq: _*)
            // pin the cut once: batch feeds the banded hashing, the probe's
            // excludeIds, AND the survivor anti-join — without this the
            // span-dedup window shuffle recomputes per consumer
            .transform(pin)
        case None => raw.toDF()
      }
      val exactGated = bloomIndexPath match {
        case Some(bp) => graft.operators.BloomIndex.exactGate(prepped,
          idCol, textCol, bp,
          excludeIds = prepped.select(col(idCol))).survivors
        case None => prepped
      }
      val screened = evalSetPath match {
        case Some(ep) => Dedup.contaminationGate(exactGated,
          spark.read.parquet(ep).select(col(idCol), col(textCol)),
          idCol, textCol, evalGateK, evalGateMinOverlap,
          evalGateContainment, evalGateMaxShingleDf)._1
        case None => exactGated
      }
      val lmGated = lmModelPath match {
        case Some(mp) =>
          require(!lmGateMaxCe.isInfinite,
            "lmModelPath is set but lmGateMaxCe is unbounded — set the " +
              "cross-entropy ceiling (NgramLm.perplexityTiers picks one)")
          graft.operators.NgramLm.qualityGate(screened, idCol, textCol,
            graft.operators.NgramLm.load(spark, mp), lmGateMaxCe)._1
        case None => screened
      }
      val batch = nbModelPath match {
        case Some(mp) =>
          graft.operators.NbClassifier.paretoGate(lmGated, idCol, textCol,
            graft.operators.NbClassifier.load(spark, mp), nbParetoShape)._1
        case None => lmGated
      }
      val banded = Dedup.lshBanded(batch, idCol, textCol,
        shingleK, numHashes, bands, portable).persist()
      try {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val none = batch.select(col(idCol)).limit(0)
        // the batch MUST be hashed with the same parameters the standing
        // index was built with — different hash families' buckets never
        // collide, so a drifted probe silently misses every duplicate.
        // The index's recorded marker turns that silence into an error.
        val hashParams = Map("kind" -> "minhash",
          "shingleK" -> shingleK.toString, "numHashes" -> numHashes.toString,
          "bands" -> bands.toString, "portable" -> portable.toString)
        val bootstrap = !fs.exists(p)
        if (!bootstrap) BandIndex.checkParams(spark, indexPath, hashParams)
        // the dup frames pin BEFORE the anti-join — the nightly pipeline's
        // pin-once discipline (measured there: the fused plan re-ran and
        // spilled the aggregate-expand subplan inside the anti-join, 2×
        // the shuffle and spill; bounded frames, maxBucket caps them)
        val corpusDups =
          if (!bootstrap)
            // excludeIds makes the probe replay-idempotent (see class doc);
            // with batch ids off the corpus side, each pair holds exactly
            // one batch member and one genuine-corpus member, so exploding
            // both ids is safe — the survivor anti-join only matches the
            // batch-side id, and corpus-side ids fall through it
            BandIndex.probe(spark, indexPath, banded, idCol, maxBucket,
                excludeIds = Some(batch.select(col(idCol))))
              .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
              .transform(pin)
          else none
        val intraDups =
          if (dedupWithinBatch)
            Dedup.pairsFromBanded(banded, idCol, maxBucket,
                caller = "nearDupIngestStream")
              .select(col("id_b").as(idCol))
              .transform(pin)
          else none
        // pin the survivor set BEFORE appending, with lineage TRUNCATED
        // (eager localCheckpoint): the append write refreshes the session's
        // file-listing caches for indexPath — a plan (even a persisted one;
        // refresh invalidates and lazily re-caches it) that still reads the
        // index would re-probe an index already containing this batch, and
        // every batch doc would pair with its own appended rows and drop.
        // Checkpointed blocks are freed by the context cleaner when the
        // frame goes out of scope.
        val survivors = batch.join(
            corpusDups.union(intraDups).distinct(), Seq(idCol), "left_anti")
          .transform(pin)
        BandIndex.append(
          banded.join(survivors.select(col(idCol)), Seq(idCol), "left_semi"),
          indexPath)
        if (bootstrap) BandIndex.recordParams(spark, indexPath, hashParams)
        bloomIndexPath.foreach { bp =>
          graft.operators.BloomIndex.appendOrBootstrap(
            graft.operators.BloomIndex.survivorKeys(survivors, idCol,
              textCol),
            "__exact_key", idCol, bp,
            shards = bloomShards, bitsPerShard = bloomBitsPerShard)
        }
        accept(survivors, batchId)
      } finally {
        banded.unpersist()
        // the probe takes a Caches-tracked persist per batch; micro-batches
        // run serially and this writer owns its session's idle points (the
        // Verify/Bench per-query contract), so release here
        graft.core.Caches.releaseAll()
      }
    }

  /**
   * Embedding-space twin of [[nearDupIngestStream]]: continuous ANN ingest
   * against the persisted IVF index. Each micro-batch:
   *
   *   1. probes the on-disk index for each batch vector's nearest standing
   *      neighbor ([[graft.operators.IvfIndex.probe]] — broadcast-argmax
   *      cell assignment, directory-pruned cells scan, O(touched cells)
   *      reads regardless of corpus size; geometry drift against the saved
   *      index fails fast via the recorded marker),
   *   2. drops batch docs whose best corpus cosine ≥ `threshold`; with
   *      `dedupWithinBatch`, also drops the GREATER id of every intra-batch
   *      pair above the threshold (greedy keep-min, exact pairwise over the
   *      broadcast batch — micro-batches are small by contract, so the
   *      O(batch²) comparison is bounded while staying cap-free),
   *   3. appends survivors' vectors to the index (only their cell
   *      directories gain files) and hands the surviving rows to `accept`.
   *
   * Cross-batch state lives entirely in the on-disk index (no state store).
   * A missing index path bootstraps from the first batch via
   * [[graft.operators.IvfIndex.save]] with `numCentroids` k-means cells —
   * later batches inherit that fixed geometry (re-run `save`, or
   * `resplitCell` on hot cells, when the corpus outgrows it). The probe is
   * REPLAY-IDEMPOTENT like the MinHash sink's: the batch's own ids are
   * anti-joined off the corpus side, so an at-least-once replay after a
   * crash between append and commit re-sees the pre-append corpus view
   * (the re-appended duplicate index rows are compaction litter, never
   * missed or double-dropped deliveries).
   *
   * `nprobe` > 1 widens the probe to the n nearest cells — the recall knob
   * for vectors near a cell boundary (same contract as `IvfIndex.probe`).
   *
   * Returns the configured writer — caller sets checkpoint/trigger and
   * calls `start()`.
   */
  def annIngestStream(
      docs: DataFrame, idCol: String, vecCol: String, indexPath: String,
      threshold: Double, numCentroids: Int = 64, nprobe: Int = 2,
      dedupWithinBatch: Boolean = true)
      (accept: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.operators.IvfIndex
    import graft.functions.Vectors
    docs.writeStream.foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
      val spark = rawBatch.sparkSession
      // pin the batch once: it feeds the probe, the intra-batch pairs, the
      // survivor anti-join, and the append — and must be detached from any
      // source lineage before the index append refreshes file caches
      val batch = rawBatch.transform(pin)
      try {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bootstrap = !fs.exists(p)
        val none = batch.select(col(idCol)).limit(0)
        // dup frames pinned before the anti-join (the nightly pipeline's
        // measured pin-once discipline — a fused probe/pair subplan
        // re-runs and spills inside the anti-join); both are bounded
        val corpusDups =
          if (!bootstrap)
            // k=1: ANY standing neighbor at/above the threshold drops the
            // batch doc, so only the best match matters
            IvfIndex.probe(spark, indexPath, batch, idCol, vecCol,
                k = 1, nprobe = nprobe,
                excludeIds = Some(batch.select(col(idCol))))
              .filter(col("cosine") >= threshold)
              .select(col("query_id").as(idCol))
              .transform(pin)
          else none
        val intraDups =
          if (dedupWithinBatch) {
            val l = batch.select(col(idCol).as("__ia"), col(vecCol).as("__va"))
            val r = batch.select(col(idCol).as("__ib"), col(vecCol).as("__vb"))
            l.join(broadcast(r), col("__ia") < col("__ib"))
              .filter(Vectors.cosineExact(col("__va"), col("__vb")) >= threshold)
              .select(col("__ib").as(idCol))
              .transform(pin)
          } else none
        // survivors pinned BEFORE the append for the same read-after-append
        // reason as the MinHash sink (append refreshes file-listing caches)
        val survivors = batch.join(
            corpusDups.union(intraDups).distinct(), Seq(idCol), "left_anti")
          .transform(pin)
        if (bootstrap) {
          // an empty first batch must not found the index with zero-vector
          // k-means centroids — stay unbootstrapped until data arrives
          // (isEmpty is cheap: survivors is already checkpointed)
          if (!survivors.isEmpty)
            IvfIndex.save(survivors, idCol, vecCol, indexPath, numCentroids)
        } else
          IvfIndex.append(survivors, idCol, vecCol, indexPath)
        accept(survivors, batchId)
      } finally graft.core.Caches.releaseAll()
    }
  }

  /**
   * Continuous ingest against the PRODUCTION ANN layout — the
   * [[annIngestStream]] cycle over [[graft.operators.IvfPqIndex]] instead
   * of the float IVF index: a corpus standardized on the composed
   * cells+codes layout gets the same probe → accept → append stream
   * without maintaining a parallel float index. Each micro-batch:
   *
   *   1. probes the on-disk index for each batch vector's best standing
   *      match ([[graft.operators.IvfPqIndex.probe]] — directory-pruned
   *      cells scan, ADC scoring over code bytes; drift fails fast on the
   *      recorded marker),
   *   2. drops batch docs whose best standing score ≥ `threshold`; with
   *      `dedupWithinBatch`, also drops the GREATER id of every
   *      intra-batch pair at/above the threshold (exact pairwise over the
   *      broadcast batch, [[annIngestStream]]'s bounded O(batch²)),
   *   3. appends survivors' codes to the index (only touched cell
   *      directories gain files) and hands the survivors to `accept`.
   *
   * THRESHOLD SEMANTICS — pass `rerankFrom`; it is the RECOMMENDED
   * default for every threshold-semantics caller. With it, ADC only
   * shortlists `rerankCandidates` and the drop decision is made on EXACT
   * cosines from the given full-vector table (e.g. the accepted corpus
   * itself), so the threshold means what it says. Without it the
   * standing-side score is the RAW ADC approximation (`<q,
   * reconstruction(x)>`, NOT a calibrated cosine — the index stores no
   * floats to re-rank against), and the aging measurement proved how
   * badly naive thresholds misfire there: identical-vector twins scored
   * 0.54–0.80 ADC at m=8/32-dim, so a 0.95 threshold silently NEVER
   * dropped anything (SCALE.md round-14). Take the raw-ADC path only
   * with a threshold calibrated for THIS index's geometry —
   * [[graft.operators.IvfPqIndex.adcThresholdFor]] /
   * [[graft.operators.IvfPqIndex.calibrate]] compute it from a sample of
   * this index's own rows (the PQ-layout twins answer for a different
   * index's books). Intra-batch pairs always score exactly (the batch's
   * floats are in hand).
   *
   * Replay-idempotent like its siblings: the batch's own ids are excluded
   * from the corpus side, so an at-least-once replay after a crash
   * between append and commit re-sees the pre-append corpus view.
   * Bootstrap founds the index from the first non-empty batch's
   * survivors via [[graft.operators.IvfPqIndex.save]] (fixed geometry
   * afterwards — `resplitCell` hot cells, or re-`save`, when the corpus
   * outgrows it). Cross-batch state lives entirely on disk.
   *
   * Returns the configured writer — caller sets checkpoint/trigger and
   * calls `start()`.
   */
  def ivfPqIngestStream(
      docs: DataFrame, idCol: String, vecCol: String, indexPath: String,
      threshold: Double, numCells: Int = 64, m: Int = 8, ksub: Int = 16,
      nprobe: Int = 2, rerankCandidates: Int = 16,
      rerankFrom: Option[(DataFrame, String, String)] = None,
      dedupWithinBatch: Boolean = true)
      (accept: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.operators.IvfPqIndex
    import graft.functions.Vectors
    docs.writeStream.foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
      val spark = rawBatch.sparkSession
      // pinned once, detached from source lineage before the append
      // refreshes file caches (annIngestStream's reasoning verbatim)
      val batch = rawBatch.transform(pin)
      try {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bootstrap = !fs.exists(p)
        val none = batch.select(col(idCol)).limit(0)
        // dup frames pinned before the anti-join — the pipeline's measured
        // pin-once discipline (fused probe subplans re-run and spill)
        val corpusDups =
          if (!bootstrap) {
            val ex = Some(batch.select(col(idCol)))
            (rerankFrom match {
              case Some((full, fId, fVec)) =>
                // exact path: ADC shortlists `rerankCandidates`, the
                // full-vector fetch re-scores, k=1 (any match ≥ threshold
                // drops the doc, so only the best matters)
                IvfPqIndex.probe(spark, indexPath, batch, idCol, vecCol,
                    candidates = rerankCandidates, nprobe = nprobe,
                    rerank = rerankFrom, k = 1, excludeIds = ex)
                  .filter(col("cosine") >= threshold)
                  .select(col("query_id").as(idCol))
              case None =>
                // approximate path: the best ADC score IS candidate #1
                IvfPqIndex.probe(spark, indexPath, batch, idCol, vecCol,
                    candidates = 1, nprobe = nprobe, excludeIds = ex)
                  .filter(col("pq_score") >= threshold)
                  .select(col("query_id").as(idCol))
            }).transform(pin)
          } else none
        val intraDups =
          if (dedupWithinBatch) {
            val l = batch.select(col(idCol).as("__ia"), col(vecCol).as("__va"))
            val r = batch.select(col(idCol).as("__ib"), col(vecCol).as("__vb"))
            l.join(broadcast(r), col("__ia") < col("__ib"))
              .filter(Vectors.cosineExact(col("__va"), col("__vb")) >= threshold)
              .select(col("__ib").as(idCol))
              .transform(pin)
          } else none
        val survivors = batch.join(
            corpusDups.union(intraDups).distinct(), Seq(idCol), "left_anti")
          .transform(pin)
        if (bootstrap) {
          if (!survivors.isEmpty)
            IvfPqIndex.save(survivors, idCol, vecCol, indexPath,
              numCells = numCells, m = m, ksub = ksub)
        } else
          IvfPqIndex.append(survivors, idCol, vecCol, indexPath)
        accept(survivors, batchId)
      } finally graft.core.Caches.releaseAll()
    }
  }
}
