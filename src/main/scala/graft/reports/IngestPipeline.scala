package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dq.Metrics
import graft.meta.{DmfResultRow, ExecutionLogger, MetaStore}
import graft.operators.{BandIndex, Dedup, IvfIndex}
import graft.ops.{Compaction, CompactionResult}

/**
 * The nightly corpus-ingest pipeline, end to end — the LLM-data-pipeline
 * counterpart of [[ClaimsPipeline]]'s report composition, mirroring the
 * reference's entry-point shape (steps + timing + failure logging, ref:
 * sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active.py:38-74)
 * over the engine's own standing-index operators:
 *
 *   0. SPAN DEDUP (opt-in, `spanDedupK`) — duplicated k-token spans inside
 *      the night's batch are cut BEFORE hashing, so the probe fingerprints
 *      and the corpus lands the cleaned text (within-crawl boilerplate;
 *      O(batch) windows, deterministic for replay).
 *   0b. EXACT GATE (opt-in, `bloomIndexPath`) — byte-identical
 *      re-submissions drop against the standing [[graft.operators.BloomIndex]]
 *      for one md5 + a bloom membership test each, BEFORE the minhash
 *      stage pays its fingerprint cost on them (exact answers: bloom
 *      prefilter + ledger verify; measured at 1M docs: a 60%-re-crawl
 *      night 27.5→17.1 s with spill eliminated, survivors identical —
 *      SCALE.md round 18).
 *   0c. EVAL GATE (opt-in, `evalSetPath`) — batch docs whose word-shingle
 *      containment against a benchmark/eval set passes the threshold drop
 *      BEFORE the probe: nightly decontamination, so eval data never
 *      leaks into the corpus or the band index in the first place
 *      (the batch operator q86 is the retroactive form). Eval shingles
 *      broadcast; drops ledger as reason='contaminated' with the matched
 *      eval doc as evidence.
 *   0d. LM QUALITY GATE (opt-in, `lmModelPath`) — batch docs whose bigram
 *      cross-entropy under a persisted [[graft.operators.NgramLm]] model
 *      exceeds `lmGateMaxCe` drop BEFORE the probe: the CCNet tail cut
 *      applied at the door, so low-quality text never pays shingling and
 *      never lands. One scoring pass (two model joins + a per-doc agg) +
 *      a |flagged|-sized anti-join; docs the model cannot score
 *      (< 2 tokens) pass. Drops ledger as reason='low_quality' (kept_id
 *      NULL — there is no partner doc; the evidence is the score).
 *   0e. CLASSIFIER GATE (opt-in, `nbModelPath`) — batch docs failing the
 *      GPT-3 pareto keep rule under a persisted
 *      [[graft.operators.NbClassifier]] model drop BEFORE the probe; the
 *      draw is id-hash-seeded, so a replayed night with stable ids
 *      re-derives the same verdicts. Drops ledger as
 *      reason='classifier_rejected'. After the gates, a flagged-share
 *      drift monitor ([[GateDrift]]) compares each configured gate's
 *      night against its trailing nights' median and warns on a jump
 *      (stale model / drifted corpus / re-crawl storm / eval leak) —
 *      informational, never a gate.
 *   1. PROBE — MinHash the batch only (O(batch)), probe the persisted band
 *      index for batch-vs-corpus near-dup candidates (replay-idempotent:
 *      the batch's own ids are excluded from the corpus view), plus
 *      intra-batch pairs; hash parameters are checked against the index's
 *      recorded marker so a drifted batch fails fast.
 *   2. ACCEPT — survivors (batch minus both drop sets) land in the corpus
 *      table under `load_date=<night>` via DYNAMIC partition overwrite:
 *      every night's growth lands in its own partition directory, prior
 *      nights' files never move, and a crash-and-rerun of the same night
 *      REPLACES the partition instead of double-appending it.
 *   3. VERIFY — DQ metrics over the standing corpus (id null/dup counts,
 *      exact-content duplicate count) persist as DMF result rows: the
 *      dedup guarantee is re-checked against the LANDED table every night,
 *      not assumed from the operator. The check runs BEFORE the index
 *      appends so a `failOnDq` night that FAILs stops with the standing
 *      indexes untouched — the repair re-run replaces the bad corpus
 *      partition AND the indexes never held the bad rows (no phantom
 *      content for future probes to drop against).
 *   3c. DRIFT (opt-in, `driftTolerance` with `statsSketch`) — the night's
 *      per-group composition and means vs the corpus lifetime, answered
 *      from sketch state alone ([[graft.operators.Sketches.nightDrift]])
 *      and filed as DMF result rows; informational, never a gate.
 *   4. INDEX — survivors' banded rows append to the band index (only
 *      touched band partitions gain files) and, when configured, their
 *      embeddings append to the persisted IVF index and/or the composed
 *      IVF+PQ index (only touched cells gain files; the first night
 *      bootstraps every configured index; survivor content hashes append
 *      to the bloom index when the exact gate is configured).
 *   5. MAINTAIN — [[Compaction.compactPath]] sweeps the per-night file
 *      litter of the band index AND (when configured) the IVF index's
 *      cells, partition-scoped, worst-first. Compaction runs INSIDE the
 *      nightly cycle, not as an occasional chore: the composed-index
 *      aging measurement (SCALE.md round-14) shows probe cost tracking
 *      file count, not data — five nights of uncompacted appends made
 *      probes 2.6× slower while the sweep costs seconds and restores the
 *      flat per-row cost. The bloom index maintains through
 *      [[graft.operators.BloomIndex.maintain]]: vacuum, a
 *      fragmentation-GATED fold/sweep (a small night pays no fixed
 *      maintenance), and an automatic rebuild once retraction traffic
 *      pushes the stale-bit share past `bloomRebuildShare` — so vacuum
 *      traffic cannot silently widen the false-positive tail.
 *   6. LOG — each step runs inside [[ExecutionLogger.logged]] (SUCCESS /
 *      FAILED + timings + sanitized error, the reference's audit shape)
 *      and the night's high-water mark is recorded AS THE LAST STEP — it
 *      is the night's commit record: a re-run of a night whose mark exists
 *      short-circuits (SKIPPED log row, nothing touched), so the night id
 *      is the pipeline's idempotence key.
 *
 * Scale shape: the standing corpus is never re-read for dedup (the probe
 * touches O(batch buckets) of the index); corpus/index growth is confined
 * to the partitions a night touches; maintenance is metadata-planned and
 * partition-scoped. The spec drives two simulated nights and asserts all
 * of that plus the log trail.
 */
object IngestPipeline {

  final case class IngestConfig(
      corpusPath: String,
      bandIndexPath: String,
      metaDir: String,
      ivfIndexPath: Option[String] = None,
      // the production ANN layout as a nightly target: survivors' codes
      // append to a standing [[graft.operators.IvfPqIndex]] (bootstrap on
      // first night), swept by the same nightly compaction. m must divide
      // the embedding dims
      ivfPqIndexPath: Option[String] = None,
      ivfPqCells: Int = 8, ivfPqM: Int = 8, ivfPqKsub: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text",
      embCol: String = "embedding",
      loadDateCol: String = "load_date",
      shingleK: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      portable: Boolean = true,
      maxBucket: Int = 200,
      strict: Boolean = false,
      ivfCentroids: Int = 8,
      compactTargetFileBytes: Long = Compaction.DefaultTargetFileBytes,
      // when true, a night whose landed-corpus DQ re-check FAILs stops
      // before the index appends and withholds its high-water mark: the
      // night stays re-runnable (fix the batch, re-run — dynamic partition
      // overwrite replaces the bad landing) instead of committing bad data
      // as complete, and the standing indexes never see the bad night's
      // rows. Default keeps the record-and-continue behavior for
      // compositions that check NightResult.dqFailures themselves (q74's
      // require does) — under the default the indexes DO append before the
      // caller sees the failure count.
      failOnDq: Boolean = false,
      // batch-LOCAL exact-substring dedup (Some(k) enables): duplicated
      // k-token spans inside the night's batch are cut before hashing —
      // the within-crawl boilerplate case (shared headers/footers a
      // nightly scrape repeats), O(batch) windows, measured at ~62% of a
      // plain night's wall (ScaleBench ingestspan tier). NOTE this is a
      // POLICY choice, not a free filter: docs whose only overlap was the
      // cut boilerplate stop being near-duplicates and land as their
      // unique remainders instead of dropping whole. Deliberately NOT
      // cross-night: corpus-wide span dedup is the batch operator
      // (Dedup.removeDuplicateSpans, q92) — a STANDING window index would
      // cost ~3× the corpus in bytes (one 20-byte hashed row per token),
      // a storage trade no deployment wants by default (SCALE.md round 15)
      spanDedupK: Option[Int] = None,
      // escape hatch for the packed (id,pos) keeper: ids outside
      // [0, 2^39) or positions ≥ 2^24 (content-hash-style ids) fail the
      // packed path fast — set false to take the three-pass keeper
      // instead of dying mid-night (Dedup.removeDuplicateSpans scaladoc)
      spanDedupPacked: Boolean = true,
      // case-insensitive span MATCHING (rebuild keeps original tokens)
      spanDedupLowercase: Boolean = false,
      // (opt-in) mergeable corpus-statistics sketch state: each night's
      // ACCEPTED batch lands one compact row per group under
      // <metaDir>/corpus_sketches/night=<night>
      // ([[graft.operators.Sketches.appendNight]] — exact counts/sums +
      // an HLL per distinct column), so corpus-LIFETIME profiling
      // ([[graft.operators.Sketches.mergedStats]]) reads nights×groups KB
      // of state instead of rescanning the corpus — the scan-once
      // discipline the DQ re-check's GROUPING SETS pass already follows.
      // These are LANDING-time statistics: a later retraction does not
      // rewrite them (they describe what each night contributed, not the
      // current corpus)
      statsSketch: Option[graft.operators.Sketches.SketchSpec] = None,
      // (opt-in, requires statsSketch) nightly DRIFT CHECK: after the
      // night's sketch lands, [[graft.operators.Sketches.nightDrift]]
      // compares the night's per-group composition and per-row means
      // against the corpus lifetime — ENTIRELY from sketch state (KB),
      // never a rescan — and the verdicts persist as DMF result rows
      // (metric `drift_<metric>[group]`, FAIL on DRIFT), the same results
      // history the DQ re-check writes. Informational, not a gate: a
      // drifted night still commits; the FAIL rows and
      // NightResult.driftFailures are the operator's signal. The ratio
      // band is [1/driftTolerance, driftTolerance]
      driftTolerance: Option[Double] = None,
      // (opt-in) per-document DROP LEDGER: one row per gate/probe-dropped
      // batch doc — `(id, kept_id, reason, load_date)`, reason
      // `corpus_dup` (duplicates standing content; kept_id is the
      // standing doc), `intra_dup` (duplicates a batch-mate; kept_id is
      // the kept mate), `exact_corpus_dup`/`exact_intra_dup` (the bloom
      // gate's byte-identical forms), or `contaminated` (the eval gate;
      // kept_id is the matched EVAL doc id) — under
      // <metaDir>/drop_ledger/load_date=<night>. THE answer to "why
      // did my document disappear?" without re-running the probe; O(drops)
      // rows and cost (the pair frames pin once), replay-idempotent like
      // the landing (the night's ledger directory is overwritten whole,
      // so even a repair re-run that drops NOTHING clears the bad run's
      // rows). kept_id is the PAIR EVIDENCE, not a transitive survivor —
      // with chained duplicates the kept doc can itself carry a drop row
      // (see [[ledger]])
      dropLedger: Boolean = false,
      // (opt-in) EXACT-duplicate gate: a standing
      // [[graft.operators.BloomIndex]] over md5(text) content hashes at
      // this path. Byte-identical re-submissions — the re-crawl/retry
      // case, the most common duplicate in a nightly crawl — drop for one
      // hash + a bloom membership test per doc BEFORE the minhash stage
      // pays shingling + numHashes permutations on them. The gate is
      // EXACT (bloom prefilter, ledger verify), so it can only drop true
      // exact duplicates; note it is also slightly STRICTER than the
      // near-dup probe alone, which can let an exact dup through when its
      // LSH bucket overflows maxBucket — with the gate on, exact dups
      // never depend on bucket caps. Survivor keys append nightly
      // (bootstrap on first night) and the index sweeps on the same
      // compaction/vacuum cadence as the others.
      // (opt-in) EVAL-SET CONTAMINATION GATE: parquet path of a benchmark/
      // eval document set (idCol/textCol schema, numeric ids). Batch docs
      // whose word-k-shingle containment against ANY eval doc reaches
      // `evalGateContainment` (with ≥ `evalGateMinOverlap` shared
      // shingles) drop BEFORE landing — nightly decontamination, so eval
      // data can never leak into the training corpus in the first place
      // (the batch operator, Dedup.decontaminate/q86, is the RETROACTIVE
      // form for corpora that predate the gate). The eval set is small by
      // contract: its shingle set broadcasts, the batch never self-joins.
      // Runs AFTER the exact gate (cheapest cut first) and BEFORE the
      // near-dup probe — a contaminated doc must never enter the band
      // index. Drops are ledgered as reason='contaminated' with kept_id =
      // the matched EVAL doc id (evidence) when dropLedger is on. NOTE
      // `evalGateMaxShingleDf` prunes stop-shingles by document frequency
      // WITHIN THE NIGHT'S BATCH (the default no-cutoff is exact; real
      // decontamination uses long shingles, k ≥ 8, which are rare by
      // nature).
      evalSetPath: Option[String] = None,
      evalGateK: Int = 8,
      evalGateMinOverlap: Long = 1L,
      evalGateContainment: Double = 0.8,
      evalGateMaxShingleDf: Long = Long.MaxValue,
      // (opt-in) LM QUALITY GATE: path of a persisted bigram LM
      // ([[graft.operators.NgramLm.save]] — train once on the trusted
      // target slice, ship the artifact). Batch docs whose cross-entropy
      // under the model EXCEEDS `lmGateMaxCe` drop before the near-dup
      // probe — CCNet's perplexity tail cut applied at ingest. Runs AFTER
      // the exact and eval gates (cheapest and strictest cuts first);
      // docs the model cannot score (< 2 tokens) pass — the gate only
      // judges what it can measure. Drops are ledgered as
      // reason='low_quality' with kept_id NULL (no partner doc; the
      // flagged score is the evidence) when dropLedger is on. Setting the
      // path without a finite ceiling fails fast — a gate that can never
      // drop is a configuration mistake, not a no-op.
      lmModelPath: Option[String] = None,
      lmGateMaxCe: Double = Double.PositiveInfinity,
      // (opt-in) CLASSIFIER GATE: path of a persisted seed-supervised NB
      // model ([[graft.operators.NbClassifier.save]]). Batch docs that
      // FAIL the GPT-3 pareto keep rule (`noise >= 1 - sigmoid(log_odds)`,
      // draw id-hash-seeded so replays with stable ids re-derive the
      // same verdicts) drop before the near-dup probe. Runs AFTER the
      // LM gate; docs the model cannot score (zero tokens) pass. Drops are ledgered as
      // reason='classifier_rejected' with kept_id NULL when dropLedger
      // is on.
      nbModelPath: Option[String] = None,
      nbParetoShape: Double = graft.operators.NbClassifier.ParetoShape,
      bloomIndexPath: Option[String] = None,
      bloomShards: Int = 64,
      bloomBitsPerShard: Long = 1L << 23,
      // bloom MAINTENANCE gates (see [[graft.operators.BloomIndex.maintain]]):
      // the generation fold runs only every `bloomFoldGenerations` appends
      // (probing g generations is g bit-tests — trivial — while the fold
      // rewrites every shard's bloom bytes: ~40 fixed-cost jobs per night
      // at small batch sizes, measured round 19), the ledger rewrite skips
      // shard dirs within `bloomLedgerMinExcessFiles` of their target
      // file count, and retraction traffic that pushes the stale-bit share
      // past `bloomRebuildShare` triggers an automatic rebuildBlooms so
      // vacuum traffic cannot silently widen the false-positive tail
      bloomFoldGenerations: Long = 8L,
      bloomLedgerMinExcessFiles: Long = 8L,
      bloomRebuildShare: Double = graft.operators.BloomIndex.StaleWarnShare,
      // keyword-retrieval index as a nightly target: survivors' BM25
      // postings append to a standing [[graft.operators.Bm25Index]]
      // (bootstrap on first night) with the night id as the stats
      // generation — a mid-night crash replay lands the scoring constants
      // exactly once; swept + stats-exactified by the nightly maintain
      bm25IndexPath: Option[String] = None,
      bm25Buckets: Int = 64,
      carrier: String = "corpus")

  /** Where [[IngestConfig.statsSketch]] state lives. */
  def sketchPath(cfg: IngestConfig): String = s"${cfg.metaDir}/corpus_sketches"

  /** Where [[IngestConfig.dropLedger]] rows land. */
  def ledgerPath(cfg: IngestConfig): String = s"${cfg.metaDir}/drop_ledger"

  /** The accumulated drop ledger (empty-but-typed when no ledger data
    * exists yet, so readers need no existence check). The id/kept types
    * follow the batches' id column on the non-empty path (the pipeline's
    * id contract is NumericType; the empty frame types them long); the
    * night column is normalized to STRING — partition discovery would
    * otherwise type a date- or digit-shaped night id. NOTE kept_id is the
    * PAIR EVIDENCE — the partner whose presence caused the drop — not a
    * transitive survivor: with chained duplicates the kept doc can itself
    * carry a ledger row for its own drop (follow the chain, or resolve
    * clusters with [[graft.operators.Dedup.dupClusters]]). */
  def ledger(spark: SparkSession, cfg: IngestConfig): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath(cfg))
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
    if (hasData) spark.read.parquet(ledgerPath(cfg))
      .withColumn(cfg.loadDateCol, col(cfg.loadDateCol).cast("string"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(cfg.idCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("kept_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("reason",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(cfg.loadDateCol,
          org.apache.spark.sql.types.StringType))))
  }

  final case class NightResult(
      night: String,
      batchRows: Long,
      accepted: Long,
      dropped: Long,
      indexCompaction: CompactionResult,
      dqFailures: Long,
      skipped: Boolean = false,
      ivfCompaction: Option[CompactionResult] = None,
      ivfPqCompaction: Option[CompactionResult] = None,
      bloomCompaction: Option[CompactionResult] = None,
      driftFailures: Option[Long] = None,
      // true when this night's maintenance rebuilt the bloom filters
      // because retraction traffic pushed the stale-bit share past
      // cfg.bloomRebuildShare (None when no bloom index is configured)
      bloomRebuilt: Option[Boolean] = None,
      bm25Compaction: Option[CompactionResult] = None)

  /** Run independent index/maintenance tasks CONCURRENTLY — guide §2.6:
    * Spark's scheduler happily runs several jobs at once inside one
    * application; the pipeline's per-index appends and sweeps touch
    * disjoint roots and were sequential only because the driver called
    * them sequentially. On a cluster the later jobs back-fill executors
    * freed by the earlier jobs' stragglers; on the sf0.1 bench it removes
    * dead driver time between many small fixed-cost jobs. 2–3 in flight
    * is plenty (enough to fill the tail, not enough to fight over
    * executors); pool threads are created by the calling thread, so
    * Spark's inheritable local properties (job description/group) carry
    * over. Audit-log appends stay safe under concurrency via
    * [[graft.meta.MetaStoreLocks]]. The first failure rethrows after all
    * tasks settle (a maintenance crash must surface, not race a pool
    * shutdown). */
  private def inParallel(tasks: Seq[() => Unit]): Unit =
    if (tasks.lengthCompare(2) < 0) tasks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(tasks.size, 3))
      try {
        val futs = tasks.map(t => pool.submit(
          new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }))
        var firstFailure: Option[Throwable] = None
        futs.foreach { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
          }
        }
        firstFailure.foreach(throw _)
      } finally pool.shutdown()
    }

  private def hashParams(cfg: IngestConfig): Map[String, String] = Map(
    "kind" -> "minhash", "shingleK" -> cfg.shingleK.toString,
    "numHashes" -> cfg.numHashes.toString, "bands" -> cfg.bands.toString,
    "portable" -> cfg.portable.toString)

  /**
   * Run one night's ingest of `batch` against the standing corpus/indexes.
   * Idempotent per night, in two layers:
   *  - a COMPLETED night (its high-water mark exists — the mark is written
   *    last, so it is the commit record) short-circuits with a SKIPPED
   *    audit row and touches nothing — the night id is the idempotence key;
   *  - a night re-run after a MID-NIGHT crash (mark absent) re-probes with
   *    the batch's ids excluded from the corpus view, recomputes the same
   *    survivors, and dynamic-overwrites the night's corpus partition, so
   *    the landed table never holds a replayed double. The index appends
   *    again — duplicate index ROWS are benign by construction (drop sets
   *    are distinct'd; compaction sweeps the litter) and never change
   *    probe answers.
   */
  def runNight(spark: SparkSession, batch: DataFrame, night: String,
      cfg: IngestConfig): NightResult = {
    val meta = new MetaStore(spark, cfg.metaDir)
    if (meta.lastLoadTimestamp(s"ingest_$night", cfg.carrier).isDefined) {
      // the commit record exists: this night already ran to completion —
      // leave an audit row saying so (a silent no-op would read as a lost
      // night in the log) and touch neither the corpus nor the indexes
      meta.appendExecutionLog(Seq(graft.meta.ExecutionLogRow(
        java.util.UUID.randomUUID().toString,
        new java.sql.Timestamp(System.currentTimeMillis()),
        new java.sql.Timestamp(System.currentTimeMillis()),
        "SKIPPED", s"ingest_skip_$night", 0L, 0L, 0L, cfg.carrier,
        "night already committed (high-water mark present)")))
      return NightResult(night, 0L, 0L, 0L,
        CompactionResult(0, 0L, 0L, 0L), 0L, skipped = true)
    }
    val params = hashParams(cfg)
    val idxPath = new org.apache.hadoop.fs.Path(cfg.bandIndexPath)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(idxPath)
    val batchRows = batch.count()

    // 0. (opt-in) SPAN DEDUP — batch-local duplicated-span removal runs
    // BEFORE hashing so the probe fingerprints, and the corpus lands, the
    // CLEANED text (deterministic, so a mid-night crash replay recuts the
    // same spans). Column order is restored so the landed parquet schema
    // never depends on whether the flag was set that night.
    val prepped = cfg.spanDedupK match {
      case Some(k) =>
        ExecutionLogger.logged(meta, s"ingest_span_dedup_$night",
            cfg.carrier, (df: DataFrame) => (batchRows, 0L, 0L)) {
          // eager localCheckpoint INSIDE the logged block: (a) the step's
          // logged duration covers the cut work, not just lazy plan
          // construction (it used to fold into ingest_probe); (b) prepped
          // feeds BOTH the banded hashing and the survivor anti-join —
          // without the pin the span cut would compute twice
          org.apache.spark.sql.graft.ColumnBridge.pinnedWithMeasuredStats(
            Dedup.removeDuplicateSpans(batch, cfg.idCol, cfg.textCol, k,
                lowercase = cfg.spanDedupLowercase,
                packedKeeper = cfg.spanDedupPacked)
              .drop(cfg.textCol).drop("removed_tokens")
              .withColumnRenamed("clean_text", cfg.textCol)
              .select(batch.columns.map(col).toSeq: _*))
        }
      case None => batch
    }

    // 0b. (opt-in) EXACT GATE — byte-identical duplicates drop here, for
    // one md5 + a bloom membership test per doc, before the minhash stage
    // pays its fingerprint cost on them. The semantics (scope, keep-min
    // intra resolution, replay-safe verify exclusion, pinned output) live
    // in BloomIndex.exactGate — shared with the streaming sinks so the
    // two surfaces cannot drift.
    // Each configured gate returns its SURVIVOR COUNT alongside the frame:
    // the count is computed once inside the logged body (over the gate's
    // pinned output) and threaded forward as the next gate's input count —
    // before round 19's review pass, every downstream gate re-counted its
    // un-pinned input, re-executing the whole upstream gate chain per
    // count (bloom probe + containment + LM scoring ran up to four times
    // under a fully-configured night).
    val (gated, exactLedger, gatedRows): (DataFrame, Option[DataFrame], Long) =
      cfg.bloomIndexPath match {
        case None => (prepped, None, batchRows)
        case Some(bp) =>
          ExecutionLogger.logged(meta, s"ingest_exact_$night", cfg.carrier,
              (t: (DataFrame, Option[DataFrame], Long)) =>
                (batchRows, 0L, batchRows - t._3)) {
            val gr = graft.operators.BloomIndex.exactGate(prepped,
              cfg.idCol, cfg.textCol, bp,
              excludeIds = batch.select(col(cfg.idCol)),
              needDrops = cfg.dropLedger)
            val ledgerRows =
              if (!cfg.dropLedger) None
              else Some(gr.corpusDropped
                .select(col(cfg.idCol), col("kept_id"),
                  lit("exact_corpus_dup").as("reason"))
                .union(gr.intraDropped
                  .select(col(cfg.idCol), col("kept_id"),
                    lit("exact_intra_dup").as("reason")))
                .localCheckpoint(true))
            // exactGate pins its survivors — the count is a cached scan
            (gr.survivors, ledgerRows, gr.survivors.count())
          }
      }

    // 0c. (opt-in) EVAL GATE — contaminated docs (word-k-shingle
    // containment against the eval set past the threshold) drop before
    // the near-dup probe ever sees them: the eval set's shingles
    // broadcast, the flagged set is |contaminated|-sized, the batch never
    // shuffles for this step. See IngestConfig.evalSetPath.
    val (screened, evalLedger, screenedRows): (DataFrame, Option[DataFrame], Long) =
      cfg.evalSetPath match {
        case None => (gated, None, gatedRows)
        case Some(ep) =>
          // the step's input count is the PREVIOUS gate's threaded
          // survivor count (the span cut rewrites text, never drops), so
          // this step's drops are never attributed twice in the audit
          // trail and the upstream chain never re-executes for a count
          ExecutionLogger.logged(meta, s"ingest_eval_$night", cfg.carrier,
              (t: (DataFrame, Option[DataFrame], Long)) =>
                (gatedRows, 0L, gatedRows - t._3)) {
            val evalSet = spark.read.parquet(ep)
              .select(col(cfg.idCol), col(cfg.textCol))
            // the LEDGER casts the eval id to long for its kept_id
            // evidence — a string-id eval set would null-cast the
            // evidence away silently (the retract path's contract,
            // enforced here too)
            if (cfg.dropLedger)
              require(evalSet.schema(cfg.idCol).dataType
                  .isInstanceOf[org.apache.spark.sql.types.NumericType],
                s"eval set id column '${cfg.idCol}' has type " +
                  s"${evalSet.schema(cfg.idCol).dataType} — the drop " +
                  "ledger records the matched eval doc as a numeric " +
                  "kept_id; map eval ids to a stable numeric key first " +
                  "(a null-cast here would silently erase the evidence)")
            val (survivors0, flagged) = Dedup.contaminationGate(gated,
              evalSet, cfg.idCol, cfg.textCol, cfg.evalGateK,
              cfg.evalGateMinOverlap, cfg.evalGateContainment,
              cfg.evalGateMaxShingleDf)
            val ledgerRows =
              if (!cfg.dropLedger) None
              else Some(flagged.select(col(cfg.idCol),
                col("probe_id").cast("long").as("kept_id"),
                lit("contaminated").as("reason")))
            // contaminationGate already returns measured-stats-PINNED
            // survivors (they feed the next gate/probe and this count) —
            // re-pinning here was a second materialization of the same
            // blocks for nothing
            (survivors0, ledgerRows, survivors0.count())
          }
      }

    // 0d. (opt-in) LM QUALITY GATE — docs past the cross-entropy ceiling
    // drop before the probe: one scoring pass (two model joins + a
    // per-doc agg) + a |flagged|-sized anti-join; the batch never
    // self-joins. See IngestConfig.lmModelPath.
    val (qualified, lmLedger, qualifiedRows): (DataFrame, Option[DataFrame], Long) =
      cfg.lmModelPath match {
        case None => (screened, None, screenedRows)
        case Some(mp) =>
          require(!cfg.lmGateMaxCe.isInfinite,
            "lmModelPath is set but lmGateMaxCe is unbounded — a gate " +
              "that can never drop is a configuration mistake; set the " +
              "cross-entropy ceiling (NgramLm.perplexityTiers picks one)")
          ExecutionLogger.logged(meta, s"ingest_lm_$night", cfg.carrier,
              (t: (DataFrame, Option[DataFrame], Long)) =>
                (screenedRows, 0L, screenedRows - t._3)) {
            val model = graft.operators.NgramLm.load(spark, mp)
            val (survivors0, flagged) = graft.operators.NgramLm.qualityGate(
              screened, cfg.idCol, cfg.textCol, model, cfg.lmGateMaxCe)
            val ledgerRows =
              if (!cfg.dropLedger) None
              else Some(flagged.select(col(cfg.idCol),
                lit(null).cast("long").as("kept_id"),
                lit("low_quality").as("reason")))
            val survivors = org.apache.spark.sql.graft.ColumnBridge
              .pinnedWithMeasuredStats(survivors0)
            (survivors, ledgerRows, survivors.count())
          }
      }

    // 0e. (opt-in) CLASSIFIER GATE — docs failing the pareto keep rule
    // drop before the probe: one scoring pass (one model join + a per-doc
    // agg) + a |flagged|-sized anti-join; the draw is seeded from the doc
    // id's md5, so a replayed night with stable ids re-derives the same
    // verdicts. See IngestConfig.nbModelPath.
    val (classified, nbLedger, classifiedRows): (DataFrame, Option[DataFrame], Long) =
      cfg.nbModelPath match {
        case None => (qualified, None, qualifiedRows)
        case Some(mp) =>
          ExecutionLogger.logged(meta, s"ingest_nb_$night", cfg.carrier,
              (t: (DataFrame, Option[DataFrame], Long)) =>
                (qualifiedRows, 0L, qualifiedRows - t._3)) {
            val model = graft.operators.NbClassifier.load(spark, mp)
            val (survivors0, flagged) = graft.operators.NbClassifier
              .paretoGate(qualified, cfg.idCol, cfg.textCol, model,
                cfg.nbParetoShape)
            val ledgerRows =
              if (!cfg.dropLedger) None
              else Some(flagged.select(col(cfg.idCol),
                lit(null).cast("long").as("kept_id"),
                lit("classifier_rejected").as("reason")))
            // the last gate's survivors feed the probe, the landing
            // anti-join AND the ledger's batch-id semi-join — pin here
            // too; the logger's count reads the pinned frame
            val pinned = org.apache.spark.sql.graft.ColumnBridge
              .pinnedWithMeasuredStats(survivors0)
            (pinned, ledgerRows, pinned.count())
          }
      }

    // GATE-RATE DRIFT — every standing-state gate's flagged share is a
    // one-number health signal, and a jump names its own suspect: the
    // LM/NB gates score against STANDING model artifacts (jump = stale
    // model or drifted corpus — what Sketches.nightDrift is to column
    // stats, this is to drop rates); the exact gate's share is the
    // re-crawl rate (jump = crawler re-fetch storm or upstream dedup
    // break); the eval gate's share is the contamination rate (jump =
    // eval data leaking into the crawl). Runs AFTER the gates' audit
    // rows landed, reads only the metadata-sized execution log, warns,
    // never gates.
    if (cfg.bloomIndexPath.isDefined)
      GateDrift.checkAfterNight(meta, "ingest_exact_", night,
        rowsIn = batchRows, flagged = batchRows - gatedRows)
    if (cfg.evalSetPath.isDefined)
      GateDrift.checkAfterNight(meta, "ingest_eval_", night,
        rowsIn = gatedRows, flagged = gatedRows - screenedRows)
    if (cfg.lmModelPath.isDefined)
      GateDrift.checkAfterNight(meta, "ingest_lm_", night,
        rowsIn = screenedRows, flagged = screenedRows - qualifiedRows)
    if (cfg.nbModelPath.isDefined)
      GateDrift.checkAfterNight(meta, "ingest_nb_", night,
        rowsIn = qualifiedRows, flagged = qualifiedRows - classifiedRows)

    // 1. PROBE — batch-only hashing; the standing corpus is only touched
    // through the index, and only in the buckets this batch lands in
    val banded = Dedup.lshBanded(classified, cfg.idCol, cfg.textCol,
      cfg.shingleK, cfg.numHashes, cfg.bands, cfg.portable).persist()
    try {
      // the survivor count is computed ONCE inside the step (over the
      // pinned frame) and threaded out — the logged row and `accepted`
      // used to each run their own count job
      val (survivors, corpusPairs, intraPairs, accepted) =
        ExecutionLogger.logged(meta, s"ingest_probe_$night", cfg.carrier,
            (t: (DataFrame, DataFrame, DataFrame, Long)) => (t._4, 0L, 0L)) {
          if (!bootstrap) BandIndex.checkParams(spark, cfg.bandIndexPath, params)
          val nonePairs = batch.select(col(cfg.idCol).as("id_a"),
            col(cfg.idCol).as("id_b")).limit(0)
          val corpusPairs0 =
            if (bootstrap) None
            else Some(BandIndex.probe(spark, cfg.bandIndexPath, banded,
              cfg.idCol, cfg.maxBucket, cfg.strict,
              excludeIds = Some(batch.select(col(cfg.idCol)))))
          val intraPairs0 = Dedup.pairsFromBanded(banded, cfg.idCol,
            cfg.maxBucket, caller = "IngestPipeline", strict = cfg.strict)
          // pin the pair frames UNCONDITIONALLY before the anti-join (and,
          // under the ledger, before its second consumer): measured at the
          // ingestspan tier (100k-doc night, 1M-corpus generator), the
          // fused plan — pair generation inlined into the survivor
          // anti-join — ran 2412 MB shuffle / 28.8 GB spill / 36.7 s
          // median vs 1248 MB / 14.1 GB / 24.0 s with the pins, EVEN WITH
          // the ledger's extra write on the pinned arm. Pair frames are
          // bounded (maxBucket caps bucket fanout), so the checkpoint is
          // O(pairs) like the survivors pin itself.
          // ONE pin for BOTH frames (r21): the corpus and intra pair plans
          // share the persisted `banded` parent and are bounded, so they
          // union (source-tagged) into a single materialization — one
          // driver-side action/AQE chain instead of two back-to-back — and
          // the frames split back out as filters over the pinned blocks
          // (no recompute, no shuffle). On a bootstrap night the corpus
          // arm is statically empty: nothing unions and nothing pins for
          // it (the old code paid a checkpoint job for a limit-0 frame).
          val bridge = org.apache.spark.sql.graft.ColumnBridge
          val intraTagged = intraPairs0.withColumn("__src", lit("i"))
          val tagged = bridge.pinnedWithMeasuredStats(corpusPairs0 match {
            case Some(cp0) =>
              intraTagged.unionByName(cp0.withColumn("__src", lit("c")))
            case None => intraTagged
          })
          val cp = corpusPairs0 match {
            case Some(_) => tagged.filter(col("__src") === "c").drop("__src")
            case None => nonePairs
          }
          val ip = tagged.filter(col("__src") === "i").drop("__src")
          val corpusDups =
            cp.select(explode(array(col("id_a"), col("id_b"))).as(cfg.idCol))
          val intraDups = ip.select(col("id_b").as(cfg.idCol))
          // pin survivors BEFORE any append mutates what the plan reads
          // (measured stats throughout: inherited estimates here size every
          // downstream landing/index shuffle — see pinnedWithMeasuredStats)
          val sv = bridge.pinnedWithMeasuredStats(
            classified.join(corpusDups.union(intraDups).distinct(),
              Seq(cfg.idCol), "left_anti"))
          (sv, cp, ip, sv.count())
        }

      // 1b. (opt-in) DROP LEDGER — one audited row per probe-dropped doc:
      // which doc, which kept doc it duplicated, and why. Probe pairs hold
      // exactly one batch member (excludeIds keeps batch ids off the
      // corpus side), so the batch side is recoverable by a semi-join; a
      // doc dropped for several reasons keeps ONE row (corpus_dup outranks
      // intra_dup, ties to the smallest kept id — deterministic replay)
      if (cfg.dropLedger) {
        ExecutionLogger.logged(meta, s"ingest_ledger_$night", cfg.carrier,
            (n: Long) => (0L, 0L, n)) {
          val batchIds = classified.select(col(cfg.idCol))
          val corpusLedger = corpusPairs
            .select(explode(array(
              struct(col("id_a").as("d"), col("id_b").as("k")),
              struct(col("id_b").as("d"), col("id_a").as("k")))).as("p"))
            .select(col("p.d").as(cfg.idCol), col("p.k").as("kept_id"))
            .join(batchIds, Seq(cfg.idCol), "left_semi")
            .withColumn("reason", lit("corpus_dup"))
          val intraLedger = intraPairs
            .select(col("id_b").as(cfg.idCol), col("id_a").as("kept_id"))
            .withColumn("reason", lit("intra_dup"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(cfg.idCol))
            .orderBy(when(col("reason") === "corpus_dup", 0).otherwise(1).asc,
              col("kept_id").asc)
          // exact-gate drops never reach the probe (they were cut before
          // hashing), so their ids can't collide with the ranked pair
          // rows — union them in verbatim after the ranking
          val rows = corpusLedger.union(intraLedger)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
            .unionByName(exactLedger.getOrElse(
              corpusLedger.limit(0)))
            .unionByName(evalLedger.getOrElse(
              corpusLedger.limit(0)))
            .unionByName(lmLedger.getOrElse(
              corpusLedger.limit(0)))
            .unionByName(nbLedger.getOrElse(
              corpusLedger.limit(0)))
            .localCheckpoint(true)
          // written DIRECTLY into the night's directory (not partitionBy
          // dynamic overwrite): a ZERO-DROP night then still commits a
          // schema-only file — so the reader can always infer the schema
          // — and a replay that drops NOTHING (failOnDq repair re-run
          // with the dups removed) truly clears the bad run's rows
          // instead of leaving a stale partition behind
          rows.write.mode("overwrite")
            .parquet(s"${ledgerPath(cfg)}/${cfg.loadDateCol}=$night")
          rows.count()
        }
        ()
      }

      // 2. ACCEPT — the night's partition directory is the only corpus
      // growth; prior nights' files are never rewritten (spec-asserted).
      // Dynamic overwrite (replaces ONLY the load_date=<night> partition
      // the data carries) makes a mid-night crash replay land exactly-once
      // instead of double-appending the survivors
      ExecutionLogger.logged(meta, s"ingest_accept_$night", cfg.carrier,
          (_: Unit) => (accepted, 0L, 0L)) {
        survivors.withColumn(cfg.loadDateCol, lit(night))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(cfg.loadDateCol)
          .parquet(cfg.corpusPath)
      }

      // 3. VERIFY — re-check the dedup/identity guarantees on the LANDED
      // corpus and persist the outcomes as DMF result rows. Under failOnDq
      // this runs (and is judged) BEFORE the index appends: a FAILing
      // night must leave the standing indexes untouched — appending first
      // would pollute them with rows of a landing the repair re-run then
      // REPLACES, and future batches would be probe-dropped as duplicates
      // of phantom content (the corpus itself is safe either way: the
      // repair's dynamic overwrite replaces the night's partition). Under
      // the DEFAULT (record-and-continue) the night commits regardless of
      // the DQ outcome, so the verify chain and the index/maintain chain
      // are independent and run CONCURRENTLY (see the orchestration after
      // the step definitions).
      def runDqCheck(): Long = ExecutionLogger.logged(meta,
          s"ingest_dq_$night", cfg.carrier, (n: Long) => (0L, 0L, n)) {
        val corpus = spark.read.parquet(cfg.corpusPath)
        val now = new java.sql.Timestamp(System.currentTimeMillis())
        // ONE corpus scan for all three checks (the column-form DMF
        // philosophy applied to the pipeline): GROUPING SETS ((id),(hash))
        // computes both group-by keys off a single pass — same total
        // shuffle bytes as two separate groupBys (each row feeds two
        // groups), but the standing corpus, the big cost at scale, is read
        // once per night instead of three times. Values match the separate
        // Metrics.nullCount / Metrics.duplicateCount / exactGroups forms
        // exactly (null ids group together; null text hashes to a null
        // group of its own) — spec-pinned against planted violations.
        val g = corpus
          .select(col(cfg.idCol), md5(col(cfg.textCol).cast("binary")).as("__h"))
          .groupingSets(Seq(Seq(col(cfg.idCol)), Seq(col("__h"))),
            col(cfg.idCol), col("__h"))
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        val r = g.agg(
          coalesce(sum(when(col("gid") === 1 && col(cfg.idCol).isNull,
            col("n"))), lit(0L)).as("id_nulls"),
          coalesce(sum(when(col("gid") === 1 && col("n") > 1,
            col("n"))), lit(0L)).as("id_dups"),
          count(when(col("gid") === 2 && col("n") > 1, 1))
            .as("content_dup_groups")).head()
        val checks = Seq(
          ("id_null_count", r.getLong(0)),
          ("id_duplicate_count", r.getLong(1)),
          ("exact_content_duplicates", r.getLong(2)))
        meta.appendDmfResults(checks.map { case (name, v) =>
          DmfResultRow(now, "corpus", name, s"$name = 0", Some(v),
            if (v == 0) "PASS" else "FAIL")
        })
        checks.count(_._2 != 0).toLong
      }

      // 3b. (opt-in) SKETCH — the night's landed contribution as mergeable
      // statistics state, O(batch) compute and O(groups) output. After the
      // failOnDq gate: a withheld night's landing will be REPLACED by the
      // repair re-run, so its stats must not enter the lifetime state.
      // Replay-idempotent like the landing itself (per-night dynamic
      // partition overwrite); deterministic survivors → identical rows
      def runSketchStep(): Unit = cfg.statsSketch.foreach { spec =>
        ExecutionLogger.logged(meta, s"ingest_sketch_$night", cfg.carrier,
            (_: Unit) => (accepted, 0L, 0L)) {
          graft.operators.Sketches.appendNight(survivors, spec,
            sketchPath(cfg), night)
        }
      }

      // 3c. (opt-in) DRIFT — the night's shape vs the corpus lifetime,
      // answered from the sketch state alone and persisted as DMF result
      // rows (the q62 results-history surface). Informational: a drifted
      // night still commits — the FAIL rows are the operator's signal
      def runDriftStep(): Option[Long] = cfg.statsSketch.flatMap { spec =>
        cfg.driftTolerance.map { tol =>
          ExecutionLogger.logged(meta, s"ingest_drift_$night", cfg.carrier,
              (n: Long) => (0L, 0L, n)) {
            val verdicts = graft.operators.Sketches.nightDrift(spark,
                sketchPath(cfg), spec, night, tol)
              .filter(col("status") =!= "MISSING")
              .collect() // bounded: groups × metrics rows off KB of state
            val now = new java.sql.Timestamp(System.currentTimeMillis())
            meta.appendDmfResults(verdicts.toSeq.map { r =>
              val grp = spec.groupCols
                .map(c => s"$c=${r.getAs[Any](c)}").mkString(",")
              // DMF values are integral — record the ratio in
              // parts-per-thousand so 0.87 survives as 870
              DmfResultRow(now, "corpus",
                s"drift_${r.getAs[String]("metric")}[$grp]",
                s"ratio_x1000 in [${math.round(1000.0 / tol)}, " +
                  s"${math.round(1000.0 * tol)}]",
                Option(r.getAs[java.lang.Double]("ratio"))
                  .map(d => math.round(d.toDouble * 1000.0)),
                if (r.getAs[String]("status") == "OK") "PASS" else "FAIL")
            })
            verdicts.count(_.getAs[String]("status") == "DRIFT").toLong
          }
        }
      }

      // 4. INDEX — appends touch only the partitions the survivors hit.
      // The per-index appends read only PINNED inputs (survivors, the
      // persisted banded frame) and write disjoint roots, so they run
      // concurrently (see [[inParallel]]) — on the IVFPQ-configured night
      // the band append rides under the k-means bootstrap instead of
      // serializing after it
      def runIndexAppends(): Unit =
      ExecutionLogger.logged(meta, s"ingest_index_$night", cfg.carrier) {
        inParallel(Seq[Option[() => Unit]](
          Some { () =>
            BandIndex.append(
              banded.join(survivors.select(col(cfg.idCol)), Seq(cfg.idCol),
                "left_semi"), cfg.bandIndexPath)
            if (bootstrap)
              BandIndex.recordParams(spark, cfg.bandIndexPath, params)
          },
          cfg.ivfIndexPath.map { ip => () =>
            val ipath = new org.apache.hadoop.fs.Path(ip)
            if (!ipath.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .exists(ipath))
              IvfIndex.save(survivors, cfg.idCol, cfg.embCol, ip,
                numCentroids = cfg.ivfCentroids)
            else
              IvfIndex.append(survivors, cfg.idCol, cfg.embCol, ip)
          },
          cfg.ivfPqIndexPath.map { ip => () =>
            val ipath = new org.apache.hadoop.fs.Path(ip)
            if (!ipath.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .exists(ipath))
              graft.operators.IvfPqIndex.save(survivors, cfg.idCol,
                cfg.embCol, ip, numCells = cfg.ivfPqCells, m = cfg.ivfPqM,
                ksub = cfg.ivfPqKsub)
            else
              graft.operators.IvfPqIndex.append(survivors, cfg.idCol,
                cfg.embCol, ip)
          },
          cfg.bloomIndexPath.map { bp => () =>
            graft.operators.BloomIndex.appendOrBootstrap(
              graft.operators.BloomIndex.survivorKeys(survivors,
                cfg.idCol, cfg.textCol),
              "__exact_key", cfg.idCol, bp,
              shards = cfg.bloomShards, bitsPerShard = cfg.bloomBitsPerShard)
          },
          cfg.bm25IndexPath.map { bp => () =>
            val bpath = new org.apache.hadoop.fs.Path(bp)
            // night id = the stats generation's idempotence key either way:
            // a crash replay of this night replaces its own generation (a
            // replayed BOOTSTRAP night takes the append arm — same key, so
            // the constants still land exactly once)
            if (!bpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .exists(bpath))
              graft.operators.Bm25Index.save(survivors, cfg.idCol,
                cfg.textCol, bp, buckets = cfg.bm25Buckets, gen = night)
            else
              graft.operators.Bm25Index.append(survivors, cfg.idCol,
                cfg.textCol, bp, gen = night)
          }).flatten)
      }

      // 5. MAINTAIN — partition-scoped sweep of per-night index litter,
      // EVERY night: probe cost tracks file count, not data (SCALE.md
      // round-14 — 2.6× probe slowdown from five nights of append litter,
      // restored by a seconds-cheap sweep), so the sweep belongs in the
      // cycle rather than deferred until probes degrade
      // The per-index sweeps touch disjoint roots and run CONCURRENTLY
      // (inParallel); each stays inside its own logged step (audit rows
      // unchanged; appends serialize via MetaStoreLocks). Results land in
      // vars behind the inParallel barrier (Future.get = happens-before).
      var comp: CompactionResult = null
      var ivfComp: Option[CompactionResult] = None
      var ivfPqComp: Option[CompactionResult] = None
      var bloomMaint: Option[(CompactionResult, Boolean)] = None
      var bm25Comp: Option[CompactionResult] = None
      def runMaintain(): Unit = inParallel(Seq[Option[() => Unit]](
        Some { () =>
          comp = ExecutionLogger.logged(meta, s"ingest_compact_$night",
              cfg.carrier, (r: CompactionResult) =>
                (0L, r.filesBefore - r.filesAfter, 0L)) {
            // pending tombstones (out-of-band removeIds between nights)
            // sweep on the same cadence as the file litter — the vacuum
            // contract (bounded tombstone sets) is enforced BY the cycle,
            // not by hope
            BandIndex.vacuum(spark, cfg.bandIndexPath, cfg.idCol)
            Compaction.compactPath(spark, cfg.bandIndexPath, Seq("band"),
              cfg.compactTargetFileBytes)
          }
        },
        cfg.ivfIndexPath.map { ip => () =>
          ivfComp = Some(ExecutionLogger.logged(meta,
              s"ingest_compact_ivf_$night",
              cfg.carrier, (r: CompactionResult) =>
                (0L, r.filesBefore - r.filesAfter, 0L)) {
            IvfIndex.vacuum(spark, ip)
            Compaction.compactPath(spark, s"$ip/cells", Seq("cell"),
              cfg.compactTargetFileBytes)
          })
        },
        cfg.ivfPqIndexPath.map { ip => () =>
          ivfPqComp = Some(ExecutionLogger.logged(meta,
              s"ingest_compact_ivfpq_$night",
              cfg.carrier, (r: CompactionResult) =>
                (0L, r.filesBefore - r.filesAfter, 0L)) {
            graft.operators.IvfPqIndex.vacuum(spark, ip)
            Compaction.compactPath(spark, s"$ip/cells", Seq("cell"),
              cfg.compactTargetFileBytes)
          })
        },
        // fold/rewrite gates + stale-share-triggered rebuild live in
        // BloomIndex.maintain — ONE maintenance entry shared with any other
        // caller, so retraction traffic heals here on the same cadence that
        // sweeps file litter (a rebuilt night logs rows_deleted=1 as its
        // audit signal)
        cfg.bloomIndexPath.map { bp => () =>
          bloomMaint = Some(ExecutionLogger.logged(meta,
              s"ingest_compact_bloom_$night",
              cfg.carrier, (r: (CompactionResult, Boolean)) =>
                (0L, r._1.filesBefore - r._1.filesAfter,
                  if (r._2) 1L else 0L)) {
            graft.operators.BloomIndex.maintain(spark, bp,
              cfg.compactTargetFileBytes,
              minFoldGenerations = cfg.bloomFoldGenerations,
              ledgerMinExcessFiles = cfg.bloomLedgerMinExcessFiles,
              rebuildShare = cfg.bloomRebuildShare)
          })
        },
        cfg.bm25IndexPath.map { bp => () =>
          bm25Comp = Some(ExecutionLogger.logged(meta,
              s"ingest_compact_bm25_$night",
              cfg.carrier, (r: CompactionResult) =>
                (0L, r.filesBefore - r.filesAfter, 0L)) {
            // out-of-band retractions sweep physically on the same cadence
            // (vacuum also re-derives EXACT scoring constants); then the
            // per-night posting-file litter bin-packs like every index
            graft.operators.Bm25Index.vacuum(spark, bp, cfg.idCol)
            Compaction.compactPath(spark, s"$bp/postings",
              Seq(graft.operators.Bm25Index.BucketCol),
              cfg.compactTargetFileBytes)
          })
        }).flatten)

      // ORCHESTRATION of steps 3–5. Under failOnDq the order is the
      // original sequential one: VERIFY is the gate, a FAIL stops before
      // any index append and withholds the commit record. Under the
      // DEFAULT (record-and-continue) the night commits whatever VERIFY
      // finds, so the verify chain (dq → sketch → drift — DMF rows and
      // counts identical either way) and the index chain (appends →
      // maintain, ordered within the chain: the sweeps read the roots the
      // appends just grew) share no state and run CONCURRENTLY; the
      // commit record still lands strictly LAST, behind the barrier.
      var dqFailures = 0L
      var driftFailures: Option[Long] = None
      if (cfg.failOnDq) {
        dqFailures = runDqCheck()
        if (dqFailures > 0) {
          // a FAILing night stops HERE: no index appends, no commit
          // record. The bad landing sits in its own corpus partition until
          // the repair re-run dynamic-overwrites it; the indexes hold
          // nothing from this night, so the re-run's probe sees exactly
          // the pre-night corpus. The FAILED audit row says why
          meta.appendExecutionLog(Seq(graft.meta.ExecutionLogRow(
            java.util.UUID.randomUUID().toString,
            new java.sql.Timestamp(System.currentTimeMillis()),
            new java.sql.Timestamp(System.currentTimeMillis()),
            "FAILED", s"ingest_commit_$night", 0L, 0L, dqFailures,
            cfg.carrier,
            s"$dqFailures DQ check(s) FAILED on the landed corpus — " +
              "high-water mark withheld, index appends skipped; " +
              "night stays re-runnable")))
          return NightResult(night, batchRows, accepted,
            batchRows - accepted, CompactionResult(0, 0L, 0L, 0L),
            dqFailures)
        }
        runSketchStep()
        driftFailures = runDriftStep()
        runIndexAppends()
        runMaintain()
      } else {
        inParallel(Seq(
          () => {
            dqFailures = runDqCheck()
            runSketchStep()
            driftFailures = runDriftStep()
          },
          () => { runIndexAppends(); runMaintain() }))
      }
      val bloomComp = bloomMaint.map(_._1)

      // 6. LOG — the night's commit record, written LAST: its presence is
      // what makes a later re-run of this night short-circuit. NOTE the
      // default semantics: a night with FAIL DMF rows still commits (the
      // FAIL rows and NightResult.dqFailures are the caller's signal);
      // failOnDq instead stopped at step 3 — mark withheld, indexes
      // untouched, night re-runnable after the data is fixed
      meta.recordLoad(s"ingest_$night", cfg.carrier,
        new java.sql.Timestamp(System.currentTimeMillis()))

      NightResult(night, batchRows, accepted, batchRows - accepted,
        comp, dqFailures, ivfCompaction = ivfComp,
        ivfPqCompaction = ivfPqComp, bloomCompaction = bloomComp,
        driftFailures = driftFailures, bloomRebuilt = bloomMaint.map(_._2),
        bm25Compaction = bm25Comp)
    } finally {
      banded.unpersist()
      graft.core.Caches.releaseAll()
    }
  }

  final case class RetractResult(
      requested: Long,
      corpusRemoved: Long,
      bandRemoved: Long,
      ivfRemoved: Option[Long] = None,
      ivfPqRemoved: Option[Long] = None,
      bloomRemoved: Option[Long] = None,
      bm25Removed: Option[Long] = None)

  /**
   * Retract documents from the landed corpus AND every configured standing
   * index — the takedown/forget operator the audit trail can point at
   * (licensing removal, user deletion, post-hoc discovery of content that
   * must not train). `failOnDq` already keeps a BAD NIGHT out of the
   * indexes; this is the remedy for everything failOnDq can't catch —
   * content that was legitimately accepted and must now be unlearned.
   *
   * Semantics, in commit order:
   *   1. TOMBSTONE — the ids land in each index family's hidden tombstone
   *      set (`removeIds`, O(|ids|)) and in the corpus root's own set.
   *      From this instant every index PROBE subtracts the ids: phantom
   *      content stops pairing (a re-submission of a retracted doc is
   *      ACCEPTED by the next night, spec- and oracle-pinned), and the
   *      tombstone files double as the durable intent record a crashed
   *      retract resumes from.
   *   2. VACUUM — physical removal, partition-scoped: the corpus rewrite
   *      touches only the `load_date` partitions that held retracted rows
   *      ([[graft.operators.PartitionVacuum]]'s staged rename-aside swap;
   *      other nights' files byte-untouched, spec-asserted), each index
   *      vacuums its own touched partitions. The corpus vacuum is
   *      synchronous because plain corpus readers don't subtract
   *      tombstones — after `retract` returns, the text is GONE, not
   *      hidden. A crash mid-step re-runs: sets clear only as each vacuum
   *      completes.
   *   3. LOG — one audit row per target with the physically-removed row
   *      count, `label` naming the takedown.
   *
   * Cost at scale: tombstone append is O(|ids|); the corpus rewrite is
   * O(touched night partitions); index vacuums are O(touched cells /
   * bands). Nothing rescans the full corpus.
   */
  def retract(spark: SparkSession, ids: DataFrame, label: String,
      cfg: IngestConfig): RetractResult = {
    val meta = new MetaStore(spark, cfg.metaDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    // Validate BEFORE the long cast: casting a string-id takedown list
    // first would null out every id, the nulls drop, and the retraction
    // removes nothing while `requested` still counts the rows — the exact
    // silent failure Tombstones.append's NumericType fail-fast exists to
    // prevent. Apply the same contract to the caller's column here.
    val rawIdCol = ids.columns.head
    require(ids.schema(rawIdCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"retract takes numeric ids; column '$rawIdCol' has type " +
        s"${ids.schema(rawIdCol).dataType} — map string ids to a stable " +
        "numeric key first (a null-cast here would silently retract " +
        "nothing while still reporting requested > 0)")
    val pinned = ids.select(col(rawIdCol).cast("long").as(cfg.idCol))
      .distinct().localCheckpoint(true) // small by contract; pin once
    val requested = pinned.count()
    // a target that never bootstrapped holds nothing to retract — appending
    // a tombstone set under a data-less root would break its first read.
    // The per-target tombstone+vacuum sequences touch disjoint roots and
    // run CONCURRENTLY (inParallel; the step-4/5 reasoning) — results land
    // in vars behind the barrier
    var corpusRemoved = 0L
    var bandRemoved = 0L
    var ivfRemoved: Option[Long] = None
    var ivfPqRemoved: Option[Long] = None
    var bloomRemoved: Option[Long] = None
    var bm25Removed: Option[Long] = None
    inParallel(Seq[Option[() => Unit]](
      if (!exists(cfg.corpusPath)) None
      else Some { () =>
        corpusRemoved = ExecutionLogger.logged(meta,
            s"retract_corpus_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          graft.operators.Tombstones.append(spark, cfg.corpusPath, pinned)
          graft.operators.PartitionVacuum.vacuum(spark, cfg.corpusPath,
            cfg.corpusPath, cfg.loadDateCol, cfg.idCol)
        }
      },
      if (!exists(cfg.bandIndexPath)) None
      else Some { () =>
        bandRemoved = ExecutionLogger.logged(meta,
            s"retract_band_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          BandIndex.removeIds(spark, cfg.bandIndexPath, pinned)
          BandIndex.vacuum(spark, cfg.bandIndexPath, cfg.idCol)
        }
      },
      cfg.ivfIndexPath.filter(exists).map { ip => () =>
        ivfRemoved = Some(ExecutionLogger.logged(meta,
            s"retract_ivf_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          IvfIndex.removeIds(spark, ip, pinned)
          IvfIndex.vacuum(spark, ip)
        })
      },
      cfg.ivfPqIndexPath.filter(exists).map { ip => () =>
        ivfPqRemoved = Some(ExecutionLogger.logged(meta,
            s"retract_ivfpq_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          graft.operators.IvfPqIndex.removeIds(spark, ip, pinned)
          graft.operators.IvfPqIndex.vacuum(spark, ip)
        })
      },
      cfg.bloomIndexPath.filter(exists).map { bp => () =>
        bloomRemoved = Some(ExecutionLogger.logged(meta,
            s"retract_bloom_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          graft.operators.BloomIndex.removeIds(spark, bp, pinned)
          graft.operators.BloomIndex.vacuum(spark, bp)
        })
      },
      cfg.bm25IndexPath.filter(exists).map { bp => () =>
        bm25Removed = Some(ExecutionLogger.logged(meta,
            s"retract_bm25_$label", cfg.carrier, (n: Long) => (0L, n, 0L)) {
          graft.operators.Bm25Index.removeIds(spark, bp, pinned)
          graft.operators.Bm25Index.vacuum(spark, bp, cfg.idCol)
        })
      }).flatten)
    RetractResult(requested, corpusRemoved, bandRemoved, ivfRemoved,
      ivfPqRemoved, bloomRemoved, bm25Removed)
  }
}
