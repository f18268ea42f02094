package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.meta.{ExecutionLogger, MetaStore}
import graft.operators.{Dedup, Vocab}

/**
 * The corpus-curation report — what a data-curation team reads before a
 * training run: one workbook of overview / language mix / quality-filter
 * outcomes / PII exposure / duplication / vocabulary sheets, composed
 * from the engine's own operators the way [[ClaimsPipeline]] composes the
 * CDC operators and [[IngestPipeline]] the index operators (the
 * reference's report-entry-point shape: compute → render → timing log,
 * ref: sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active.py:38-74).
 *
 * Scale shape: ONE pass over the corpus computes every per-document
 * signal (token count, language, quality verdict, PII hits, content
 * hash) into a narrow cached projection — the text column, the big
 * bytes, is read once — and all single-doc-signal sheets are small
 * aggregations of that frame. The projection stays in whole-stage
 * codegen: both expressions that used to break it are fixed at the
 * source ([[graft.functions.Text.langId]]'s single-array argmax;
 * [[graft.functions.Text.duplicateLineFraction]]'s HOF-free rewrite) —
 * keep it that way, ONE CodegenFallback expression de-compiles the
 * whole pass. Only the operators that inherently need
 * their own topology scan again: vocabulary (explode → map-side-combined
 * count) and, when enabled, MinHash near-dup (banded LSH). Every sheet
 * is a bounded aggregate (verdicts, languages, top-k, histogram
 * buckets), so the driver-side render never holds corpus-sized data.
 */
object CurationReport {

  final case class CurationConfig(
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabK: Int = 50,
      histogramBucket: Int = 50,
      nearDup: Boolean = false,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = 200,
      // exact-substring audit (Dedup.duplicateGrams) — opt-in like
      // nearDup: both rescan the corpus with their own topology
      dupSpans: Boolean = false, spanK: Int = 8, spanTopN: Int = 50,
      // quality battery thresholds, Text.qualityVerdict's defaults —
      // curation thresholds are corpus policy, so they belong in config
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      minStopwordFrac: Double = 0.06,
      maxDupLineFrac: Double = 0.3, maxDupTokenRatio: Double = 0.6,
      // (opt-in) LM quality sheets: a persisted bigram model
      // ([[graft.operators.NgramLm.save]]) scores the corpus once; the
      // report gets the head/middle/tail tier audit (the keep-set
      // decision CCNet makes) and the `lmWorstN` highest-cross-entropy
      // docs — the human-review queue. Bounded outputs (3 tier rows +
      // lmWorstN rows); the scoring pass is corpus-linear like the
      // signal pass
      lmModelPath: Option[String] = None,
      lmWorstN: Int = 20,
      // (opt-in) classifier sheets: a persisted NB model
      // ([[graft.operators.NbClassifier.save]]) scores the corpus once;
      // the report gets the keep/reject audit under the deterministic
      // pareto rule (what the ingest gate / training-set build would
      // decide — previewable because the draw is id-hash-seeded)
      // and the `nbWorstN` lowest-log-odds docs, the human-review queue.
      // Bounded outputs (2 verdict rows + nbWorstN rows)
      nbModelPath: Option[String] = None,
      nbWorstN: Int = 20,
      // must match the gate/build shape for the audit to preview THEIR
      // decision — the preview is only exact under the same shape
      nbParetoShape: Double = graft.operators.NbClassifier.ParetoShape,
      carrier: String = "corpus")

  final case class CurationSummary(
      docs: Long, keptDocs: Long, exactDupDocs: Long, nearDupPairs: Long,
      sheets: Seq[String])

  /** The section frames, keyed by sheet name (insertion-ordered). Exposed
    * separately from [[run]] so callers can route sections to other sinks
    * (csv feeds, DQ thresholds) without rendering a workbook. */
  def sections(spark: SparkSession, corpus: DataFrame,
      cfg: CurationConfig): Seq[(String, DataFrame)] = {
    val text = col(cfg.textCol)
    // the one corpus pass: every per-doc signal in a single narrow
    // projection; all single-signal sheets aggregate THIS, not the corpus
    val perDoc = graft.core.Caches.track(corpus.select(
      col(cfg.idCol).as("id"),
      Text.tokenCount(text).as("n_tokens"),
      length(text).as("n_chars"),
      Text.langId(text).as("lang"),
      Text.qualityVerdict(text, cfg.minTokens, cfg.maxTokens,
        cfg.minAvgWordLen, cfg.maxAvgWordLen, cfg.minStopwordFrac,
        cfg.maxDupLineFrac, cfg.maxDupTokenRatio).as("verdict"),
      Text.piiTotal(text).as("pii_hits"),
      md5(text.cast("binary")).as("content_hash")))

    val overview = perDoc.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_tokens")), 2).as("avg_tokens_per_doc"),
        countDistinct(col("lang")).as("n_languages"),
        sum(when(col("verdict.keep"), 1L).otherwise(0L)).as("kept_docs"),
        sum(col("pii_hits")).as("total_pii_hits"),
        // null text hashes to a null content_hash: such docs are not
        // duplicates of anything, so the dup arithmetic runs over NON-NULL
        // hashes only (count(col) skips nulls exactly like countDistinct
        // does) and the null-text population gets its own overview metric
        // instead of silently inflating the dup count
        (count(col("content_hash")) - countDistinct(col("content_hash")))
          .as("exact_dup_docs"),
        sum(when(col("content_hash").isNull, 1L).otherwise(0L))
          .as("null_text_docs"))

    val languages = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"))
      .withColumn("share",
        round(col("n_docs") / sum(col("n_docs")).over(), 4))
      .orderBy(col("n_docs").desc, col("lang").asc)

    val quality = perDoc.groupBy(col("verdict.reason").as("reason"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs") / sum(col("n_docs")).over(), 4))
      .orderBy(col("n_docs").desc, col("reason").asc)

    // per-pattern PII totals need the text column again (the cached frame
    // only carries the total) — one more narrow pass, |patterns| output
    // rows, unpivoted via an explode of the single aggregate row
    val pii = corpus.select(Text.PiiPatterns.map { case (name, p) =>
        sum(Text.piiCount(text, p)).as(name)
      }: _*)
      .select(explode(array(Text.PiiPatterns.map { case (name, _) =>
        struct(lit(name).as("pattern"), col(name).as("matches"))
      }: _*)).as("e"))
      .select(col("e.pattern").as("pattern"), col("e.matches").as("matches"))

    val lengths = perDoc
      .groupBy((floor(col("n_tokens") / cfg.histogramBucket).cast("long")
        * cfg.histogramBucket).as("token_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("token_bucket").asc)

    val dupGroups = perDoc
      .filter(col("content_hash").isNotNull) // null-text docs are not copies
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("id")).as("keeper_id"))
      .filter(col("n_copies") > 1)
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("n_copies").desc, col("keeper_id").asc)

    val vocab = Vocab.topTokens(corpus, cfg.textCol, cfg.vocabK)

    val base = Seq(
      "Overview" -> overview,
      "Languages" -> languages,
      "Quality" -> quality,
      "PII" -> pii,
      "Token Histogram" -> lengths,
      "Exact Dup Groups" -> dupGroups,
      "Top Vocabulary" -> vocab)
    val withNearDup =
      if (!cfg.nearDup) base
      else base :+ ("Near-Dup Pairs" -> Dedup.minhashLshPairs(
        corpus, cfg.idCol, cfg.textCol, cfg.shingleK, cfg.numHashes,
        cfg.bands, cfg.maxBucket).orderBy(col("id_a").asc, col("id_b").asc))
    val withSpans =
      if (!cfg.dupSpans) withNearDup
      else withNearDup :+ ("Duplicated Spans" -> Dedup.duplicateGrams(
        corpus, cfg.idCol, cfg.textCol, cfg.spanK)
        .orderBy(col("n").desc, col("gram").asc).limit(cfg.spanTopN))
    val withLm = cfg.lmModelPath match {
      case None => withSpans
      case Some(mp) =>
        import graft.operators.NgramLm
        // one scoring pass feeds both sheets (the perDoc discipline)
        val scored = graft.core.Caches.track(NgramLm.crossEntropy(
          corpus, cfg.idCol, cfg.textCol, NgramLm.load(spark, mp)))
        val tiers = NgramLm.perplexityTiers(scored, "cross_entropy")
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("cross_entropy")), 6).as("avg_ce"),
            round(min(col("cross_entropy")), 6).as("min_ce"),
            round(max(col("cross_entropy")), 6).as("max_ce"))
          .orderBy(col("tier"))
        val worst = scored
          .select(col(cfg.idCol), col("n_bigrams"), col("cross_entropy"))
          .orderBy(col("cross_entropy").desc, col(cfg.idCol).asc)
          .limit(cfg.lmWorstN)
        withSpans ++ Seq("LM Quality Tiers" -> tiers,
          "LM Worst Docs" -> worst)
    }
    cfg.nbModelPath match {
      case None => withLm
      case Some(mp) =>
        import graft.operators.NbClassifier
        // one scoring pass feeds both sheets; the audit previews the
        // EXACT gate outcome because the pareto draw is id-hash-
        // seeded, not sampled
        val scored = graft.core.Caches.track(NbClassifier.logOdds(
          corpus, cfg.idCol, cfg.textCol, NbClassifier.load(spark, mp)))
        val drawn = NbClassifier.paretoKeep(scored, cfg.idCol,
            shape = cfg.nbParetoShape)
          .select(col(cfg.idCol)).withColumn("__kept", lit(1))
        val audit = scored.join(drawn, Seq(cfg.idCol), "left")
          .withColumn("verdict",
            when(col("__kept").isNotNull, lit("keep")).otherwise(lit("reject")))
          .groupBy(col("verdict"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("log_odds")), 6).as("avg_log_odds"),
            round(min(col("log_odds")), 6).as("min_log_odds"),
            round(max(col("log_odds")), 6).as("max_log_odds"))
          .orderBy(col("verdict"))
        val worstNb = scored
          .select(col(cfg.idCol), col("n_tokens"), col("log_odds"))
          .orderBy(col("log_odds").asc, col(cfg.idCol).asc)
          .limit(cfg.nbWorstN)
        withLm ++ Seq("Classifier Keep Audit" -> audit,
          "Classifier Worst Docs" -> worstNb)
    }
  }

  /** Render the workbook (one sheet per section) and log each phase to the
    * execution log — the audited artifact a curation run files. */
  def run(spark: SparkSession, corpus: DataFrame, xlsxPath: String,
      metaDir: String, cfg: CurationConfig = CurationConfig()): CurationSummary = {
    val meta = new MetaStore(spark, metaDir)
    try {
      val frames = ExecutionLogger.logged[Seq[(String, DataFrame)]](meta,
          "curation_sections", cfg.carrier) {
        sections(spark, corpus, cfg)
      }
      val summary = ExecutionLogger.logged(meta, "curation_render",
          cfg.carrier, (s: CurationSummary) => (s.docs, 0L, 0L)) {
        val sheets = frames.map { case (name, df) =>
          XlsxWriter.sheetOf(name, df)
        }
        XlsxWriter.write(xlsxPath, sheets)
        val ov = frames.head._2.head()
        val nearPairs =
          if (cfg.nearDup) frames.last._2.count() else 0L
        CurationSummary(
          docs = ov.getAs[Long]("n_docs"),
          keptDocs = ov.getAs[Long]("kept_docs"),
          exactDupDocs = ov.getAs[Long]("exact_dup_docs"),
          nearDupPairs = nearPairs,
          sheets = frames.map(_._1))
      }
      summary
    } finally graft.core.Caches.releaseAll()
  }
}
