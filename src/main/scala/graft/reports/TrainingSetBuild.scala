package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.meta.{ExecutionLogger, MetaStore}
import graft.operators.{Mixing, Packing}

/**
 * The training-set build — the last mile from a curated corpus to
 * loader-ready shards, composed from the engine's own operators the way
 * [[IngestPipeline]] composes the index operators:
 *
 *   1. FILTER — [[Text.qualityVerdict]] keeps only documents passing the
 *      configured C4/Gopher battery (the curation report's thresholds —
 *      the report SHOWS the outcome distribution, this applies it);
 *      opt-in [[graft.operators.NgramLm.qualityGate]] then applies the
 *      CCNet perplexity cut under a persisted model (`lmModelPath`), and
 *      opt-in [[graft.operators.NbClassifier.paretoGate]] applies the
 *      GPT-3 classifier keep rule under a persisted NB model
 *      (`nbModelPath`, id-hash-seeded draw) — all three filters are
 *      pure functions of the text and the stable doc id, so the build stays
 *      byte-identically reproducible.
 *   2. MIX — [[Mixing.mixCorpus]] replicates/samples per domain
 *      (deterministic md5-bucket fractional epochs); each copy carries
 *      its 0-based `epoch`.
 *   3. KEY — every (doc, epoch) copy gets the UNIQUE numeric pack key
 *      `shuffleKey(doc_id · maxEpochs + epoch)`: the hash block
 *      decorrelates ingest order, the low digits keep copies distinct —
 *      [[Packing.packShards]]' contract by construction.
 *   4. PACK — start-offset shard assignment over the key order
 *      (two-phase distributed cumsum; budget in the configured token
 *      column's units).
 *   5. WRITE + LOG — [[Packing.writeShards]] lands per-shard jsonl in
 *      reproducible pack order plus the parquet manifest; every phase
 *      runs inside [[ExecutionLogger.logged]].
 *
 * [[plan]] is the pure composition (no IO) — oracle-checked end to end
 * (q85: filter → mix → key → pack reproduced in one SQL statement);
 * [[run]] materializes it. Reproducible forever: every step is a pure
 * function of content hashes and ids, so re-running on the same corpus
 * yields byte-identical shards.
 */
object TrainingSetBuild {

  final case class BuildConfig(
      idCol: String = "doc_id",
      textCol: String = "text",
      domainCol: String = "lang",
      tokensCol: String = "n_chars", // token-count proxy column
      weights: Map[String, Double] = Map.empty,
      defaultWeight: Double = 1.0,
      maxEpochs: Int = 100, // key stride per doc; > any ceil(weight)
      shuffleSpan: Long = 1L << 40, // > maxEpochs · max doc id
      budget: Long = 1L << 20, // tokens per shard
      packBuckets: Int = 1024,
      // quality battery (Text.qualityVerdict defaults)
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      minStopwordFrac: Double = 0.06,
      maxDupLineFrac: Double = 0.3, maxDupTokenRatio: Double = 0.6,
      // (opt-in) LM perplexity cut after the rule battery: a persisted
      // bigram model ([[graft.operators.NgramLm.save]]) scores the kept
      // docs once and those past the cross-entropy ceiling are excluded
      // from the mix — the CCNet keep decision applied at build time.
      // Unscorable docs (< 2 tokens) pass this stage (the rule battery's
      // minTokens already governs them). Same fail-fast as the ingest
      // gate: a model path without a finite ceiling is a config error
      lmModelPath: Option[String] = None,
      lmGateMaxCe: Double = Double.PositiveInfinity,
      // (opt-in) seed-supervised classifier keep after the LM cut: a
      // persisted NB model ([[graft.operators.NbClassifier.save]]) scores
      // the kept docs once and the GPT-3 pareto rule decides keeps — the
      // draw is id-hash-seeded, so the build stays byte-identically
      // reproducible. Unscorable docs (zero tokens) pass this stage
      nbModelPath: Option[String] = None,
      nbParetoShape: Double = graft.operators.NbClassifier.ParetoShape,
      // resume from an existing staged table: when the stage phase's
      // commit record (the staged parquet's _SUCCESS marker) exists, skip
      // re-running the quality battery and pack straight from it —
      // [[graft.reports.IngestPipeline]]'s short-circuit discipline for a
      // build whose write crashed. OPT-IN because the staged table is
      // keyed by nothing: a changed corpus or config since the stage would
      // silently pack stale rows — the caller asserts nothing changed
      resume: Boolean = false,
      carrier: String = "corpus")

  final case class BuildSummary(
      inputDocs: Long, keptDocs: Long, packedRows: Long, shards: Long,
      totalTokens: Long)

  /** Stages 1–3 (filter → mix → key) as one frame — [[plan]] packs it
    * directly; [[run]] stages it to parquet first so the pack's passes
    * never re-evaluate the quality battery. */
  def keyedPlan(corpus: DataFrame, cfg: BuildConfig): DataFrame = {
    require(cfg.maxEpochs > 0, "maxEpochs must be positive")
    // pack_key uniqueness is a CONTRACT, not a convention ([[Packing
    // .packShards]] requires unique keys or shard assignment goes
    // nondeterministic): epochs run 0..ceil(w)-1, so any configured weight
    // whose ceil exceeds maxEpochs would make two (doc, epoch) copies share
    // a key — fail fast here; the companion bound (doc_id·maxEpochs+epoch <
    // shuffleSpan) is data-dependent and enforced per row inside
    // [[Packing.shuffleKey]]
    val maxW = (cfg.weights.values.toSeq :+ cfg.defaultWeight).max
    require(math.ceil(maxW).toLong <= cfg.maxEpochs,
      s"maxEpochs=${cfg.maxEpochs} cannot keep (doc, epoch) pack keys " +
        s"unique under a domain weight of $maxW (epochs run 0..ceil(w)-1); " +
        s"raise maxEpochs to at least ${math.ceil(maxW).toLong}")
    val ruleKept = corpus.filter(
      Text.qualityVerdict(col(cfg.textCol), cfg.minTokens, cfg.maxTokens,
        cfg.minAvgWordLen, cfg.maxAvgWordLen, cfg.minStopwordFrac,
        cfg.maxDupLineFrac, cfg.maxDupTokenRatio).getField("keep"))
    val lmKept = cfg.lmModelPath match {
      case None => ruleKept
      case Some(mp) =>
        require(!cfg.lmGateMaxCe.isInfinite,
          "lmModelPath is set but lmGateMaxCe is unbounded — set the " +
            "cross-entropy ceiling (NgramLm.perplexityTiers picks one)")
        graft.operators.NgramLm.qualityGate(ruleKept, cfg.idCol,
          cfg.textCol, graft.operators.NgramLm.load(corpus.sparkSession, mp),
          cfg.lmGateMaxCe)._1
    }
    val kept = cfg.nbModelPath match {
      case None => lmKept
      case Some(mp) =>
        graft.operators.NbClassifier.paretoGate(lmKept, cfg.idCol,
          cfg.textCol,
          graft.operators.NbClassifier.load(corpus.sparkSession, mp),
          cfg.nbParetoShape)._1
    }
    val mixed = Mixing.mixCorpus(kept, cfg.idCol, col(cfg.domainCol),
      cfg.weights, cfg.defaultWeight)
    mixed.withColumn("pack_key",
      Packing.shuffleKey(
        col(cfg.idCol).cast("long") * cfg.maxEpochs + col("epoch"),
        cfg.shuffleSpan))
  }

  /**
   * The deterministic packed frame: input columns + `epoch`, `pack_key`,
   * `token_offset`, `shard`. Pure composition — no IO, no state; q85
   * pins it against a single-statement SQL oracle.
   */
  def plan(corpus: DataFrame, cfg: BuildConfig): DataFrame =
    Packing.packShards(keyedPlan(corpus, cfg), "pack_key", cfg.tokensCol,
      cfg.budget, cfg.packBuckets)

  /**
   * Materialize [[plan]] as the loader layout at `path` (per-shard jsonl
   * + manifest) with an execution-log audit trail at `metaDir`.
   *
   * The curated/mixed/keyed frame is STAGED to parquet first (one pass
   * over the raw corpus evaluates the quality battery exactly once);
   * the pack then runs over the staged table, where its two cumsum
   * passes are COLUMN-PRUNED scans of (pack_key, tokens) — without the
   * stage, every pack pass re-read the raw text and re-ran the battery
   * (measured at 5M docs: 603 s unstaged vs 343 s staged — 1.8×; the
   * staged variant reads MORE total bytes but the expensive expression
   * work runs once). The staged table is also the resume point after a
   * crashed write: with `cfg.resume`, an existing staged table (its
   * `_SUCCESS` marker is the stage's commit record) short-circuits the
   * stage phase with a SKIPPED audit row and the pack runs straight from
   * it — every step downstream is a pure function of the staged rows, so
   * the resumed build's shards are byte-identical to an uninterrupted one
   * (spec-pinned).
   */
  def run(spark: SparkSession, corpus: DataFrame, path: String,
      metaDir: String, cfg: BuildConfig = BuildConfig()): BuildSummary = {
    val meta = new MetaStore(spark, metaDir)
    val inputDocs = corpus.count()
    val marker = new org.apache.hadoop.fs.Path(s"$path/staged/_SUCCESS")
    val resumable = cfg.resume && marker
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker)
    val staged =
      if (resumable) {
        // a silent skip would read as a lost phase in the audit trail —
        // IngestPipeline.runNight's SKIPPED-row discipline
        meta.appendExecutionLog(Seq(graft.meta.ExecutionLogRow(
          java.util.UUID.randomUUID().toString,
          new java.sql.Timestamp(System.currentTimeMillis()),
          new java.sql.Timestamp(System.currentTimeMillis()),
          "SKIPPED", "trainset_stage", 0L, 0L, 0L, cfg.carrier,
          "staged table already committed (_SUCCESS present); " +
            "quality battery not re-run")))
        spark.read.parquet(s"$path/staged")
      } else ExecutionLogger.logged[DataFrame](meta, "trainset_stage",
          cfg.carrier, (df: DataFrame) => (df.count(), 0L, 0L)) {
        keyedPlan(corpus, cfg)
          .write.mode("overwrite").parquet(s"$path/staged")
        spark.read.parquet(s"$path/staged")
      }
    val packed = ExecutionLogger.logged[DataFrame](meta, "trainset_plan",
        cfg.carrier, (df: DataFrame) => (df.count(), 0L, 0L)) {
      // the packed frame feeds the shard write, the manifest, and the
      // summary — pin it once; the count in the log-counts hook
      // materializes the cache INSIDE this phase, so the audit row
      // carries the pack's real cost, not the write's
      Packing.packShards(staged, "pack_key", cfg.tokensCol, cfg.budget,
        cfg.packBuckets).persist()
    }
    try {
      ExecutionLogger.logged(meta, "trainset_write", cfg.carrier,
          (_: Unit) => (packed.count(), 0L, 0L)) {
        Packing.writeShards(packed, "pack_key", cfg.tokensCol, path)
      }
      val stats = packed.agg(
        count(lit(1)), countDistinct(col(cfg.idCol)),
        countDistinct(col("shard")),
        coalesce(sum(col(cfg.tokensCol).cast("long")), lit(0L))).head()
      BuildSummary(inputDocs, stats.getLong(1), stats.getLong(0),
        stats.getLong(2), stats.getLong(3))
    } finally { packed.unpersist(); () }
  }
}
