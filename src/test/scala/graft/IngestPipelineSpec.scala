package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.meta.MetaStore
import graft.operators.Dedup
import graft.reports.{GateDrift, IngestPipeline}
import graft.reports.IngestPipeline.IngestConfig

/**
 * Two simulated nights through the end-to-end ingest runner: the landed
 * corpus is dedup'd, each night's growth is confined to the partitions it
 * touches (corpus load_date dirs, IVF cell dirs), the band index's
 * per-night litter compacts back down, and the audit trail (execution log,
 * DMF results, high-water marks) records every step.
 */
class IngestPipelineSpec extends AnyFunSuite with SparkSpec {

  private def files(dir: File): Set[(String, Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet

  test("two nights: dedup'd state, confined growth, compaction, audit trail") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      ivfIndexPath = Some(root.resolve("ivf").toString),
      ivfCentroids = 2)

    def doc(id: Long, text: String, emb: Array[Float]) = (id, text, emb)
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today",
      3L -> "sphinx of black quartz judge my vow tonight",
      4L -> "how vexingly quick daft zebras jump around",
      5L -> "grumpy wizards make toxic brew for the evil queen",
      6L -> "jinxed wizards pluck ivy from the big quilt now",
      7L -> "amazingly few discotheques provide jukeboxes here")
    // embeddings: docs 1 and 2 become the IVF centroids (smallest survivor
    // ids); 4 sits in doc-1's cell, 3/5 in doc-2's; night-2 docs 6/7 are
    // near doc 1, so ONLY cell 1 may gain files on night 2
    val embs = Map(
      1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0f, 0.9f, 0.1f, 0f), 4L -> Array(0.95f, 0f, 0.05f, 0f),
      5L -> Array(0f, 0.95f, 0f, 0.05f),
      6L -> Array(0.9f, 0.1f, 0f, 0f), 7L -> Array(0.85f, 0f, 0.15f, 0f))
    // night 1: docs 1-5 plus an exact intra-batch dup of doc 1 (dropped);
    // night 2: docs 6-7 plus an exact dup of the STANDING doc 2 — only the
    // persisted index can catch it
    val b1 = ((1L to 5L).map(i => doc(i, texts(i), embs(i))) :+
      doc(101L, texts(1L), Array(1f, 0f, 0f, 0.01f)))
      .toDF("doc_id", "text", "embedding")
    val b2 = (Seq(6L, 7L).map(i => doc(i, texts(i), embs(i))) :+
      doc(102L, texts(2L), Array(0f, 1f, 0.01f, 0f)))
      .toDF("doc_id", "text", "embedding")

    val n1 = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(n1.batchRows == 6 && n1.accepted == 5 && n1.dropped == 1, n1.toString)
    assert(n1.dqFailures == 0, n1.toString)

    // snapshots AFTER night 1: these exact files must survive night 2
    val n1Dir = new File(root.resolve("corpus/load_date=n1").toFile.getPath)
    val corpusN1 = files(n1Dir)
    assert(corpusN1.nonEmpty)
    val coldCell = new File(root.resolve("ivf/cells/cell=2").toFile.getPath)
    val coldCellN1 = files(coldCell)
    assert(coldCellN1.nonEmpty, "doc-2's cell must exist after night 1")

    val n2 = IngestPipeline.runNight(spark, b2, "n2", cfg)
    assert(n2.batchRows == 3 && n2.accepted == 2 && n2.dropped == 1, n2.toString)
    assert(n2.dqFailures == 0, n2.toString)

    // 1. dedup'd state: exactly the survivors landed, no duplicate content
    val corpus = spark.read.parquet(cfg.corpusPath)
    val byNight = corpus.select(col("doc_id"), col("load_date").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byNight == Map(1L -> "n1", 2L -> "n1", 3L -> "n1", 4L -> "n1",
      5L -> "n1", 6L -> "n2", 7L -> "n2"), byNight.toString)
    assert(Dedup.exactGroups(corpus, "doc_id", "text")
      .filter(col("n_docs") > 1).count() == 0)

    // 2. growth confined to touched partitions: night 1's corpus partition
    // and the IVF cell night-2 docs do NOT land in are byte-untouched
    assert(files(n1Dir) == corpusN1, "night 1 corpus files must not move")
    assert(files(coldCell) == coldCellN1, "untouched IVF cell must not move")
    assert(files(new File(root.resolve("corpus/load_date=n2").toFile.getPath))
      .nonEmpty)
    assert(spark.read.parquet(cfg.ivfIndexPath.get + "/cells")
      .select("neighbor_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))

    // 3. maintenance: night 2's append littered a second file into every
    // band partition; the in-pipeline compaction swept them back down —
    // and the IVF cells get the same nightly sweep (probe cost tracks file
    // count, SCALE.md round-14), so the hot cell is back to one file too
    assert(n2.indexCompaction.filesBefore > n2.indexCompaction.filesAfter,
      n2.indexCompaction.toString)
    val bandDirs = Option(root.resolve("band_index").toFile.listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty &&
      bandDirs.forall(d => files(d).size == 1),
      bandDirs.map(d => d.getName -> files(d).size).mkString(", "))
    assert(n2.ivfCompaction.exists(r => r.filesBefore > r.filesAfter),
      n2.ivfCompaction.toString)
    val cellDirs = Option(root.resolve("ivf/cells").toFile.listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.forall(d => files(d).size == 1),
      cellDirs.map(d => d.getName -> files(d).size).mkString(", "))

    // 4. audit trail: six SUCCESS steps per night (incl. the IVF sweep),
    // counts carried; DMF results and high-water marks per night
    val meta = new MetaStore(spark, cfg.metaDir)
    val log = meta.executionLog.collect()
    assert(log.length == 12 &&
      log.forall(_.getAs[String]("execution_status") == "SUCCESS"),
      log.map(_.getAs[String]("target_table")).mkString(", "))
    val steps = log.map(_.getAs[String]("target_table")).toSet
    assert(Seq("probe", "accept", "index", "compact", "compact_ivf", "dq")
      .forall(s => steps.contains(s"ingest_${s}_n1")
        && steps.contains(s"ingest_${s}_n2")),
      steps.toString)
    val probeN2 = log.find(_.getAs[String]("target_table") == "ingest_probe_n2").get
    assert(probeN2.getAs[Long]("records_inserted") == 2)
    assert(meta.dmfResults.count() == 6)
    assert(meta.dmfResults.filter(col("status") =!= "PASS").count() == 0)
    assert(spark.read.parquet(cfg.metaDir + "/high_water_mark").count() == 2)
  }

  test("fused DQ pass reports planted violations, equal to the separate metric forms") {
    import spark.implicits._
    import graft.dq.Metrics
    val root = TempDirs.create("graft-ingest-dq")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString)
    val n1 = IngestPipeline.runNight(spark,
      Seq((Option(1L), "the quick brown fox jumps over the lazy dog"),
          (Option(2L), "pack my box with five dozen liquor jugs today"))
        .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.dqFailures == 0, n1.toString)
    // night 2 plants the violations the per-night DQ re-check exists for:
    // a RE-INGESTED id with different text (dedup can't catch it — content
    // differs) and a null-id doc (survives the probe, fails identity)
    val n2 = IngestPipeline.runNight(spark,
      Seq((Option(1L), "sphinx of black quartz judge my vow tonight"),
          (Option.empty[Long], "how vexingly quick daft zebras jump around"))
        .toDF("doc_id", "text"), "n2", cfg)
    assert(n2.dqFailures == 2, n2.toString) // null id + duplicate id
    val meta = new MetaStore(spark, cfg.metaDir)
    val got = meta.dmfResults.orderBy(col("run_ts").desc).limit(3)
      .collect().map(r =>
        r.getAs[String]("metric_name") -> r.getAs[Long]("value")).toMap
    // the fused GROUPING SETS pass must equal the separate metric forms
    // on the same landed corpus
    val corpus = spark.read.parquet(cfg.corpusPath)
    assert(got == Map(
      "id_null_count" -> Metrics.nullCount(corpus, "doc_id"),
      "id_duplicate_count" -> Metrics.duplicateCount(corpus, "doc_id"),
      "exact_content_duplicates" -> Dedup.exactGroups(corpus, "doc_id", "text")
        .filter(col("n_docs") > 1).count()), got.toString)
    assert(got("id_null_count") == 1 && got("id_duplicate_count") == 2 &&
      got("exact_content_duplicates") == 0, got.toString)
  }

  test("spanDedupK cuts batch-local boilerplate before hashing and landing") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-spans")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      spanDedupK = Some(6))
    // docs 10 and 11 share a 7-token scraped-boilerplate prefix; with
    // k = 6 its two windows duplicate, the (10, 0) occurrence wins, and
    // doc 11 must LAND cleaned — the probe fingerprints cleaned text, so
    // the pair is not near-dup-dropped either
    val jobStarts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.add(js.time)
    }
    spark.sparkContext.addSparkListener(listener)
    val n1 =
      try IngestPipeline.runNight(spark, Seq(
          (10L, "subscribe to our channel like and share alpha beta gamma delta"),
          (11L, "subscribe to our channel like and share epsilon zeta eta theta"),
          (12L, "completely unrelated content about spark aggregation plans"))
        .toDF("doc_id", "text"), "n1", cfg)
      finally spark.sparkContext.removeSparkListener(listener)
    assert(n1.accepted == 3, n1.toString)
    val landed = spark.read.parquet(cfg.corpusPath)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(landed(10L) ==
      "subscribe to our channel like and share alpha beta gamma delta")
    assert(landed(11L) == "epsilon zeta eta theta", landed(11L))
    assert(landed(12L) ==
      "completely unrelated content about spark aggregation plans")
    val meta = new MetaStore(spark, cfg.metaDir)
    val step = meta.executionLog
      .filter(col("target_table") === "ingest_span_dedup_n1").collect()
    assert(step.length == 1)
    // the step materializes the cut INSIDE the logged block (eager
    // localCheckpoint), so its logged window covers the span-dedup work
    // — it used to time lazy plan construction while the cut's cost
    // folded into ingest_probe. STRUCTURAL assertion, not a wall-clock
    // floor: at least one Spark JOB started inside the logged window
    // (the DAGScheduler's job-start time and the log's timestamps share
    // System.currentTimeMillis). A millisecond floor coupled the spec to
    // machine speed — a faster materialization path would fail it.
    val startMs =
      step.head.getAs[java.sql.Timestamp]("execution_start_ts").getTime
    val endMs = step.head.getAs[java.sql.Timestamp]("execution_end_ts").getTime
    def jobsInside(): Int = {
      import scala.jdk.CollectionConverters._
      jobStarts.asScala.count(t => t >= startMs && t <= endMs)
    }
    // listener events are delivered asynchronously — poll, bounded
    val deadline = System.currentTimeMillis() + 10000
    while (jobsInside() == 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(jobsInside() >= 1,
      s"span-dedup step must run its materializing job inside the logged " +
        s"window [$startMs, $endMs]; observed job starts: $jobStarts")
  }

  test("statsSketch lands per-night mergeable state matching the landed corpus") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-sketch")
    val spec = graft.operators.Sketches.SketchSpec(Seq("lang"),
      distinctCols = Seq("doc_id"))
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      statsSketch = Some(spec))
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "pack my box with five dozen liquor jugs today", "en"),
      (3L, "pack my box with five dozen liquor jugs today", "en"), // dup of 2
      (4L, "ein ganz anderes deutsches dokument ueber andere sachen", "de"))
      .toDF("doc_id", "text", "lang")
    val n1 = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(n1.accepted == 3 && n1.dropped == 1, n1.toString)
    val n2 = IngestPipeline.runNight(spark,
      Seq((5L, "some fresh english content with entirely new words", "en"))
        .toDF("doc_id", "text", "lang"), "n2", cfg)
    assert(n2.accepted == 1, n2.toString)
    // the merged lifetime stats must equal the exact aggregation over the
    // LANDED corpus: only survivors sketch (the dropped dup never counts),
    // and per-night states add up across nights
    def stats() = graft.operators.Sketches
      .mergedStats(spark, IngestPipeline.sketchPath(cfg), spec)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = spark.read.parquet(cfg.corpusPath)
      .groupBy("lang").agg(count(lit(1)), count_distinct(col("doc_id")))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stats() == want, s"${stats()} vs $want")
    // the step is audited per night
    val meta = new MetaStore(spark, cfg.metaDir)
    assert(meta.executionLog
      .filter(col("target_table").isin("ingest_sketch_n1", "ingest_sketch_n2"))
      .count() == 2)
  }

  test("driftTolerance: a drifted night files FAIL DMF rows from sketch state, still commits") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-drift")
    val spec = graft.operators.Sketches.SketchSpec(Seq("lang"),
      sumCols = Seq("n_chars"))
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      statsSketch = Some(spec), driftTolerance = Some(1.5))
    def doc(id: Long, text: String, lang: String) =
      (id, text, lang, text.length.toLong)
    // night 1: 2 en + 2 de. first night → every ratio exactly 1, all PASS
    val n1 = IngestPipeline.runNight(spark, Seq(
        doc(1L, "the quick brown fox jumps over the lazy dog", "en"),
        doc(2L, "pack my box with five dozen liquor jugs today", "en"),
        doc(3L, "ein ganz anderes deutsches dokument ueber andere dinge", "de"),
        doc(4L, "zwei deutsche saetze ohne gemeinsame woerter darin", "de"))
      .toDF("doc_id", "text", "lang", "n_chars"), "n1", cfg)
    assert(n1.accepted == 4 && n1.driftFailures.contains(0L), n1.toString)
    // night 2: two en docs at ~HALF the usual length — en's avg_n_chars
    // ratio is 18.5/31.75 ≈ 0.58, outside [1/1.5, 1.5] → DRIFT; de is
    // absent tonight → MISSING (informational, no DMF row); en's
    // row_share ratio sits exactly at the 1.5 boundary (either verdict
    // is acceptable — asserted as such below)
    val n2 = IngestPipeline.runNight(spark, Seq(
        doc(5L, "tiny new words here", "en"),
        doc(6L, "more tiny new text", "en"))
      .toDF("doc_id", "text", "lang", "n_chars"), "n2", cfg)
    assert(n2.accepted == 2, n2.toString)
    assert(n2.driftFailures.exists(_ >= 1L),
      s"night 2's short docs must flag avg_n_chars drift: $n2")
    // verdicts landed in the DMF results history (the q62 surface)
    val meta = new MetaStore(spark, cfg.metaDir)
    val driftRows = meta.dmfResults
      .filter(col("metric_name").startsWith("drift_"))
      .select("metric_name", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(driftRows.contains(("drift_avg_n_chars[lang=en]", "FAIL")),
      driftRows.toString)
    assert(driftRows.contains(("drift_row_share[lang=en]", "PASS")) ||
      driftRows.contains(("drift_row_share[lang=en]", "FAIL")),
      driftRows.toString)
    // drifted night still COMMITTED (informational, not a gate)
    assert(meta.lastLoadTimestamp("ingest_n2", cfg.carrier).isDefined)
  }

  test("dropLedger: per-doc drop reasons with kept partner, replay-idempotent") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-ledger")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      dropLedger = true)
    // empty-but-typed before any night
    assert(IngestPipeline.ledger(spark, cfg).count() == 0)
    val n1 = IngestPipeline.runNight(spark, Seq(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.accepted == 2, n1.toString)
    // night 2: 3 and 6 duplicate CORPUS doc 1 (and each other); 5
    // duplicates batch-mate 4. The ledger must say all of that, one row
    // per dropped doc, corpus_dup outranking intra_dup
    val n2 = IngestPipeline.runNight(spark, Seq(
        3L -> "the quick brown fox jumps over the lazy dog",
        6L -> "the quick brown fox jumps over the lazy dog",
        4L -> "sphinx of black quartz judge my vow tonight",
        5L -> "sphinx of black quartz judge my vow tonight")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(n2.accepted == 1 && n2.dropped == 3, n2.toString)
    def rows() = IngestPipeline.ledger(spark, cfg)
      .select("doc_id", "kept_id", "reason", "load_date").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val want = Set(
      (3L, 1L, "corpus_dup", "n2"),
      (6L, 1L, "corpus_dup", "n2"), // also an intra dup of 3 — corpus wins
      (5L, 4L, "intra_dup", "n2"))
    assert(rows() == want, rows().toString)
    // the step is audited with the drop count
    val meta = new MetaStore(spark, cfg.metaDir)
    val step = meta.executionLog
      .filter(col("target_table") === "ingest_ledger_n2").collect()
    assert(step.length == 1 && step.head.getAs[Long]("records_deleted") == 3L,
      step.mkString(";"))
    // mid-crash replay of n2 overwrites its ledger partition, not doubles
    val hwm = root.resolve("meta/high_water_mark")
    val walk = java.nio.file.Files.walk(hwm)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    IngestPipeline.runNight(spark, Seq(
        3L -> "the quick brown fox jumps over the lazy dog",
        6L -> "the quick brown fox jumps over the lazy dog",
        4L -> "sphinx of black quartz judge my vow tonight",
        5L -> "sphinx of black quartz judge my vow tonight")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(rows() == want, s"replay must not double the ledger: ${rows()}")
    // a repair replay whose FIXED batch drops NOTHING must clear the bad
    // run's rows for that night — not leave a stale partition behind
    val walk2 = java.nio.file.Files.walk(hwm)
    try walk2.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk2.close()
    IngestPipeline.runNight(spark, Seq(
        4L -> "sphinx of black quartz judge my vow tonight",
        7L -> "how vexingly quick daft zebras jump around")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(rows().isEmpty,
      s"fixed-batch replay must clear n2's ledger rows: ${rows()}")
  }

  test("dropLedger: a zero-drop night leaves a READABLE empty ledger") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-ledger-empty")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      dropLedger = true)
    // nothing duplicates anything: the night drops zero docs, and the
    // ledger write must still leave schema on disk — an empty partitioned
    // write would commit no files and the reader would fail to infer
    val n1 = IngestPipeline.runNight(spark, Seq(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.dropped == 0, n1.toString)
    val led = IngestPipeline.ledger(spark, cfg)
    assert(led.count() == 0, "zero-drop night reads back empty")
    assert(led.columns.contains("reason") && led.columns.contains("load_date"))
  }

  test("night re-run: completed night short-circuits; mid-crash replay lands exactly once") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-replay")
    val sketchSpec = graft.operators.Sketches.SketchSpec(Seq("src"),
      distinctCols = Seq("doc_id"))
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      statsSketch = Some(sketchSpec))
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1"),
      (2L, "pack my box with five dozen liquor jugs today", "s1"),
      (3L, "pack my box with five dozen liquor jugs today", "s1")) // 3 dups 2
      .toDF("doc_id", "text", "src")
    val n1 = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(!n1.skipped && n1.accepted == 2 && n1.dropped == 1, n1.toString)
    val nightDir = new File(root.resolve("corpus/load_date=n1").toFile.getPath)
    val landed1 = files(nightDir)

    // (a) re-running a COMPLETED night is a SKIPPED no-op: the commit
    // record (high-water mark, written last) short-circuits the run and
    // neither the corpus nor the audit counts change — only a SKIPPED row
    val again = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(again.skipped && again.accepted == 0, again.toString)
    assert(files(nightDir) == landed1, "skip must not touch the corpus")
    val meta = new MetaStore(spark, cfg.metaDir)
    val skips = meta.executionLog
      .filter(col("execution_status") === "SKIPPED").collect()
    assert(skips.length == 1 &&
      skips.head.getAs[String]("target_table") == "ingest_skip_n1")

    // (b) mid-night crash replay: the mark never landed (crash between
    // accept and commit) — simulated by removing it. The re-run must
    // recompute the same survivors (probe excludes the batch's own ids
    // from the corpus view) and REPLACE the night partition, not double it
    val hwm = root.resolve("meta/high_water_mark")
    val walk = java.nio.file.Files.walk(hwm)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    val replay = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(!replay.skipped && replay.accepted == 2, replay.toString)
    val corpus = spark.read.parquet(cfg.corpusPath)
    assert(corpus.count() == 2 &&
      corpus.select("doc_id").distinct().count() == 2,
      "replay must land exactly once, not double-append")
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(replay.dqFailures == 0, replay.toString)
    // the sketch state replays exactly-once too: the crash replay
    // overwrote night n1's partition instead of doubling its counts
    val st = graft.operators.Sketches
      .mergedStats(spark, IngestPipeline.sketchPath(cfg), sketchSpec)
      .head()
    assert(st.getAs[Long]("n_rows") == 2L &&
      st.getAs[Long]("distinct_doc_id") == 2L, st.toString)
  }

  test("production-layout nights: IVFPQ bootstraps, appends, and gets the nightly sweep") {
    import spark.implicits._
    import graft.operators.IvfPqIndex
    val root = TempDirs.create("graft-ingest-ivfpq")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      ivfPqIndexPath = Some(root.resolve("ivfpq").toString),
      ivfPqCells = 2, ivfPqM = 4, ivfPqKsub = 4)
    // one doc per axis so the bootstrap codebooks can represent every
    // direction (the StreamsSpec geometry: basis vectors reconstruct
    // exactly, so ADC probes score them exactly)
    def e(d: Int) = Array.tabulate(4)(i => if (i == d) 1f else 0f)
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", e(0)),
      (2L, "pack my box with five dozen liquor jugs today", e(1)),
      (3L, "sphinx of black quartz judge my vow tonight", e(2)),
      (4L, "how vexingly quick daft zebras jump around", e(3)))
      .toDF("doc_id", "text", "embedding")
    val n1 = IngestPipeline.runNight(spark, b1, "n1", cfg)
    assert(n1.accepted == 4 && n1.dqFailures == 0, n1.toString)
    val ip = cfg.ivfPqIndexPath.get
    assert(IvfPqIndex.readParams(spark, ip).get("kind").contains("ivfpq"))
    val b2 = Seq((6L, "grumpy wizards make toxic brew for the evil queen",
      Array(0.6f, 0.8f, 0f, 0f))).toDF("doc_id", "text", "embedding")
    val n2 = IngestPipeline.runNight(spark, b2, "n2", cfg)
    assert(n2.accepted == 1, n2.toString)
    assert(n2.ivfPqCompaction.isDefined, n2.toString)
    // the standing index holds every accepted doc's codes and answers
    // probes: doc 6's identical twin scores top with ADC 1.4 (= <q, recon>)
    val ids = IvfPqIndex.loadCells(spark, ip)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 6L))
    val twin = Seq((99L, Array(0.6f, 0.8f, 0f, 0f))).toDF("doc_id", "embedding")
    val top = IvfPqIndex.probe(spark, ip, twin, "doc_id", "embedding",
      candidates = 1, nprobe = 2).head()
    assert(top.getLong(1) == 6L, top.toString)
    // audit: the IVFPQ sweep is its own logged step each night
    val log = new MetaStore(spark, cfg.metaDir).executionLog.collect()
      .map(r => r.getAs[String]("target_table")).toSet
    assert(log.contains("ingest_compact_ivfpq_n1") &&
      log.contains("ingest_compact_ivfpq_n2"), log.toString)
  }

  test("bm25 nightly target: bootstraps, appends per-night generations, " +
      "queries the landed corpus, retracts") {
    import spark.implicits._
    import graft.operators.{Bm25, Bm25Index}
    val root = TempDirs.create("graft-ingest-bm25")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      bm25IndexPath = Some(root.resolve("bm25").toString),
      bm25Buckets = 8)
    def emb = Array(1f, 0f, 0f, 0f)
    val b1 = Seq(
      (1L, "spark shuffle join window", emb),
      (2L, "merge sort batch stream", emb))
      .toDF("doc_id", "text", "embedding")
    val b2 = Seq(
      (3L, "spark spark broadcast scan", emb),
      (4L, "spark shuffle join window", emb)) // exact dup of 1 — drops
      .toDF("doc_id", "text", "embedding")
    val n1 = IngestPipeline.runNight(spark, b1, "n1", cfg)
    val n2 = IngestPipeline.runNight(spark, b2, "n2", cfg)
    assert(n1.accepted == 2 && n2.accepted == 1, (n1, n2).toString)
    assert(n2.bm25Compaction.isDefined, n2.toString)
    val bp = cfg.bm25IndexPath.get
    // the standing index answers ≡ a from-scratch computation over the
    // landed survivors (nightly stats generations sum to exact constants)
    val landed = spark.read.parquet(cfg.corpusPath)
      .select(col("doc_id"), col("text"))
    val q = Seq("spark", "window")
    assert(Bm25Index.query(spark, bp, "doc_id", q, 10).collect().toList ===
      Bm25.search(landed, "doc_id", "text", q, 10).collect().toList)
    // audit: the bm25 sweep is its own logged step each night
    val log = new MetaStore(spark, cfg.metaDir).executionLog.collect()
      .map(r => r.getAs[String]("target_table")).toSet
    assert(log.contains("ingest_compact_bm25_n1") &&
      log.contains("ingest_compact_bm25_n2"), log.toString)
    // takedown flows through retract like every other index family
    val rr = IngestPipeline.retract(spark, Seq(3L).toDF("doc_id"),
      "dmca-1", cfg)
    assert(rr.bm25Removed.exists(_ > 0L), rr.toString)
    val after = Bm25Index.query(spark, bp, "doc_id", Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(!after.contains(3L) && after.contains(1L), after.toString)
  }

  test("failOnDq: a FAILing night withholds its commit record and stays re-runnable") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-faildq")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      failOnDq = true)
    val n1 = IngestPipeline.runNight(spark,
      Seq(1L -> "the quick brown fox jumps over the lazy dog",
          2L -> "pack my box with five dozen liquor jugs today")
        .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.dqFailures == 0 && !n1.skipped, n1.toString)
    val bandIdsAfterN1 = spark.read.parquet(cfg.bandIndexPath)
      .select("doc_id").as[Long].collect().toSet
    // night 2 re-ingests id 1 with DIFFERENT text — dedup can't catch it,
    // the landed-corpus identity check does, and under failOnDq the night
    // must NOT commit: a FAILED audit row instead of the high-water mark
    val bad = Seq(1L -> "sphinx of black quartz judge my vow tonight")
      .toDF("doc_id", "text")
    val n2 = IngestPipeline.runNight(spark, bad, "n2", cfg)
    assert(n2.dqFailures == 1, n2.toString)
    val meta = new MetaStore(spark, cfg.metaDir)
    assert(meta.lastLoadTimestamp("ingest_n2", cfg.carrier).isEmpty,
      "a FAILing night must not write its commit record")
    val failRow = meta.executionLog
      .filter(col("target_table") === "ingest_commit_n2").collect()
    assert(failRow.length == 1 &&
      failRow.head.getAs[String]("execution_status") == "FAILED")
    // the FAILing night stopped BEFORE the index appends: the band index
    // holds exactly night 1's rows — no phantom content for later probes
    // to drop against, and no stale index rows referencing a landing the
    // repair replaces
    assert(spark.read.parquet(cfg.bandIndexPath)
      .select("doc_id").as[Long].collect().toSet == bandIdsAfterN1,
      "a FAILing night must not append to the standing indexes")
    val n2Steps = meta.executionLog.collect()
      .map(_.getAs[String]("target_table")).filter(_.endsWith("_n2")).toSet
    assert(!n2Steps.contains("ingest_index_n2")
      && !n2Steps.contains("ingest_compact_n2"), n2Steps.toString)
    // the night stays re-runnable: the FIXED batch replaces the bad
    // landing (dynamic partition overwrite), the DQ re-check passes, and
    // the commit record lands — the repaired corpus holds no dup ids.
    // Because the failed night never reached the index, re-running the
    // SAME text with a fresh id would also be accepted (nothing phantom
    // to collide with); this test drives the new-text repair
    val fixed = Seq(9L -> "how vexingly quick daft zebras jump around there")
      .toDF("doc_id", "text")
    val n2b = IngestPipeline.runNight(spark, fixed, "n2", cfg)
    assert(!n2b.skipped && n2b.dqFailures == 0 && n2b.accepted == 1,
      n2b.toString)
    assert(meta.lastLoadTimestamp("ingest_n2", cfg.carrier).isDefined)
    val corpus = spark.read.parquet(cfg.corpusPath)
    assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 9L))
    // and a third run of the now-committed night short-circuits
    assert(IngestPipeline.runNight(spark, fixed, "n2", cfg).skipped)
  }

  test("retract: takedown removes a doc everywhere; identical content re-admits") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-retract")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      ivfIndexPath = Some(root.resolve("ivf").toString),
      ivfCentroids = 2)
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today",
      3L -> "sphinx of black quartz judge my vow tonight",
      4L -> "how vexingly quick daft zebras jump around",
      5L -> "grumpy wizards make toxic brew for the evil queen")
    def emb(i: Long) = Array(1f / i, 1f - 1f / i, 0f, 0f)
    val b1 = Seq(1L, 2L, 3L).map(i => (i, texts(i), emb(i)))
      .toDF("doc_id", "text", "embedding")
    val b2 = Seq(4L, 5L).map(i => (i, texts(i), emb(i)))
      .toDF("doc_id", "text", "embedding")
    assert(IngestPipeline.runNight(spark, b1, "n1", cfg).accepted == 3)
    assert(IngestPipeline.runNight(spark, b2, "n2", cfg).accepted == 2)
    // sanity: an exact copy of doc 2's text is DROPPED while doc 2 stands
    val copy = Seq((202L, texts(2L), emb(2L)))
      .toDF("doc_id", "text", "embedding")
    assert(IngestPipeline.runNight(spark, copy, "n3", cfg).accepted == 0)

    val n2Dir = new File(root.resolve("corpus/load_date=n2").toFile.getPath)
    val n2Files = files(n2Dir)
    assert(n2Files.nonEmpty)

    val r = IngestPipeline.retract(spark, Seq(2L).toDF("doc_id"),
      "takedown1", cfg)
    assert(r.requested == 1 && r.corpusRemoved == 1, r.toString)
    assert(r.bandRemoved == 4, s"one banded row per band: $r") // bands = 4
    assert(r.ivfRemoved.contains(1L), r.toString)
    // the text is GONE from the landed corpus — physically, not hidden —
    // and only the touched night partition was rewritten
    val corpus = spark.read.parquet(cfg.corpusPath)
    assert(corpus.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L))
    assert(files(n2Dir) == n2Files, "untouched night partition byte-identical")
    assert(spark.read.parquet(cfg.bandIndexPath)
      .filter(col("doc_id") === 2L).count() == 0)
    assert(graft.operators.IvfIndex.loadCells(spark,
      cfg.ivfIndexPath.get).filter(col("neighbor_id") === 2L).count() == 0)
    // the audit trail names the takedown per target
    val log = new MetaStore(spark, cfg.metaDir).executionLog.collect()
      .map(r0 => r0.getAs[String]("target_table") ->
        r0.getAs[String]("execution_status"))
    Seq("retract_corpus_takedown1", "retract_band_takedown1",
      "retract_ivf_takedown1").foreach { step =>
      assert(log.contains(step -> "SUCCESS"), s"missing audit row $step")
    }
    // the phantom is gone: the SAME content that was probe-dropped in n3
    // is accepted now — the retraction semantics the oracle (q90) pins
    val copy2 = Seq((203L, texts(2L), emb(2L)))
      .toDF("doc_id", "text", "embedding")
    assert(IngestPipeline.runNight(spark, copy2, "n4", cfg).accepted == 1,
      "identical content must re-admit after the retraction")
    // idempotence: retracting an id with no rows anywhere is a clean no-op
    val r2 = IngestPipeline.retract(spark, Seq(2L).toDF("doc_id"),
      "takedown2", cfg)
    assert(r2.corpusRemoved == 0 && r2.bandRemoved == 0
      && r2.ivfRemoved.contains(0L), r2.toString)
  }

  test("retract: a string-id takedown list fails LOUDLY, never requested>0/removed==0") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-retract-strid")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString)
    assert(IngestPipeline.runNight(spark, Seq(
        1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text"), "n1", cfg).accepted == 1)
    // the old behavior was the worst kind of compliance bug: cast-to-long
    // BEFORE validation null'd every string id, the nulls dropped, and the
    // takedown reported requested > 0 with removed == 0 — silently
    // retaining the content. The contract is now a fail-fast.
    val e = intercept[IllegalArgumentException] {
      IngestPipeline.retract(spark, Seq("doc-1").toDF("doc_id"),
        "bad-takedown", cfg)
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
    // and nothing was touched: the corpus still holds the doc
    assert(spark.read.parquet(cfg.corpusPath).count() == 1)
  }

  test("spanDedupPacked=false: a night over ids >= 2^39 completes via the three-pass keeper") {
    import spark.implicits._
    val bigBase = 1L << 39 // outside the packed keeper's id domain
    def batch(base: Long) = Seq(
      (base + 10, "subscribe to our channel like and share alpha beta gamma delta"),
      (base + 11, "subscribe to our channel like and share epsilon zeta eta theta"),
      (base + 12, "completely unrelated content about spark aggregation plans"))
      .toDF("doc_id", "text")
    def cfgAt(root: java.nio.file.Path, packed: Boolean) = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      spanDedupK = Some(6), spanDedupPacked = packed)
    // the packed default dies mid-night on out-of-domain ids (fail-fast,
    // not silence)…
    val packedRoot = TempDirs.create("graft-ingest-span-packed")
    val e = intercept[Exception] {
      IngestPipeline.runNight(spark, batch(bigBase), "n1",
        cfgAt(packedRoot, packed = true))
    }
    // the raise_error fires inside the night's job — the actionable
    // message may sit anywhere in the wrapped cause chain
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage))
      .mkString("\n")
    assert(chain.contains("packedKeeper"), chain)
    // …and the plumbed escape hatch completes the same night
    val fbRoot = TempDirs.create("graft-ingest-span-fallback")
    val n1 = IngestPipeline.runNight(spark, batch(bigBase), "n1",
      cfgAt(fbRoot, packed = false))
    assert(n1.accepted == 3, n1.toString)
    def landed(cfg: IngestConfig, base: Long): Map[Long, String] =
      spark.read.parquet(cfg.corpusPath).select("doc_id", "text").collect()
        .map(r => (r.getLong(0) - base) -> r.getString(1)).toMap
    val fb = landed(cfgAt(fbRoot, packed = false), bigBase)
    assert(fb(11L) == "epsilon zeta eta theta", fb.toString)
    // identical survivors to the packed path on a small-id corpus: both
    // keepers pick the same lexicographic-min winner by construction
    val smallP = TempDirs.create("graft-ingest-span-small-p")
    val smallU = TempDirs.create("graft-ingest-span-small-u")
    assert(IngestPipeline.runNight(spark, batch(0L), "n1",
      cfgAt(smallP, packed = true)).accepted == 3)
    assert(IngestPipeline.runNight(spark, batch(0L), "n1",
      cfgAt(smallU, packed = false)).accepted == 3)
    assert(landed(cfgAt(smallP, packed = true), 0L) ==
      landed(cfgAt(smallU, packed = false), 0L))
    assert(landed(cfgAt(smallP, packed = true), 0L) == fb,
      "the big-id fallback night must land the same cleaned texts")
  }

  test("bloom exact gate: byte-identical dups drop pre-hash, ledgered; survivors match the gate-off night") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-bloom")
    val plain = TempDirs.create("graft-ingest-bloom-off")
    def cfgAt(r: java.nio.file.Path, bloom: Boolean) = IngestConfig(
      corpusPath = r.resolve("corpus").toString,
      bandIndexPath = r.resolve("band_index").toString,
      metaDir = r.resolve("meta").toString,
      bloomIndexPath =
        if (bloom) Some(r.resolve("bloom_index").toString) else None,
      bloomShards = 4, bloomBitsPerShard = 1L << 12,
      dropLedger = true)
    val cfg = cfgAt(root, bloom = true)
    val off = cfgAt(plain, bloom = false)

    val n1Batch = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today",
      // 101 is a BYTE-IDENTICAL intra-batch dup of doc 1
      101L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val n2Batch = Seq(
      // 102: byte-identical to STANDING doc 2 — the gate's corpus case
      102L -> "pack my box with five dozen liquor jugs today",
      // 103: NEAR-dup of standing doc 1 (one appended word — shingle
      // Jaccard 7/8, deterministic band collision under the portable
      // hashes) — must still drop via the minhash probe, proving the gate
      // composes with the near-dup path, not replaces it
      103L -> "the quick brown fox jumps over the lazy dog tonight",
      7L -> "amazingly few discotheques provide jukeboxes here")
      .toDF("doc_id", "text")

    val n1 = IngestPipeline.runNight(spark, n1Batch, "n1", cfg)
    assert(n1.accepted == 2 && n1.dropped == 1, n1.toString)
    val n2 = IngestPipeline.runNight(spark, n2Batch, "n2", cfg)
    assert(n2.accepted == 1 && n2.dropped == 2, n2.toString)

    // ledger says WHY, with the exact-gate's own reasons
    val rows = IngestPipeline.ledger(spark, cfg)
      .select("doc_id", "kept_id", "reason", "load_date").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(rows == Set(
      (101L, 1L, "exact_intra_dup", "n1"),
      (102L, 2L, "exact_corpus_dup", "n2"),
      (103L, 1L, "corpus_dup", "n2")), rows.toString)

    // the gate's audit rows exist and count its drops
    val meta = new MetaStore(spark, cfg.metaDir)
    val gateSteps = meta.executionLog
      .filter(col("target_table").startsWith("ingest_exact_"))
      .select("target_table", "records_deleted").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gateSteps == Map("ingest_exact_n1" -> 1L, "ingest_exact_n2" -> 1L),
      gateSteps.toString)
    // nightly sweep covered the bloom index too
    assert(meta.executionLog
      .filter(col("target_table") === "ingest_compact_bloom_n2")
      .count() == 1)

    // semantic invisibility: the gate-off nights land the SAME corpus
    // (every exact dup here is also minhash-catchable — uncapped buckets)
    IngestPipeline.runNight(spark, n1Batch, "n1", off)
    IngestPipeline.runNight(spark, n2Batch, "n2", off)
    def landedSet(c: IngestConfig) =
      spark.read.parquet(c.corpusPath).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    assert(landedSet(cfg) == landedSet(off),
      s"gate must not change survivors: ${landedSet(cfg)} vs ${landedSet(off)}")
    assert(landedSet(cfg) == Set(1L, 2L, 7L))

    // mid-crash replay: remove the commit record, re-run night 2 — the
    // gate's excludeIds hook must not self-drop the already-appended keys
    val hwm = root.resolve("meta/high_water_mark")
    val walk = java.nio.file.Files.walk(hwm)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    val replay = IngestPipeline.runNight(spark, n2Batch, "n2", cfg)
    assert(replay.accepted == 1 && replay.dropped == 2,
      s"replay must recompute the same survivors: $replay")
    assert(landedSet(cfg) == Set(1L, 2L, 7L))
  }

  test("bloom exact gate + retract: a retracted doc's identical content re-admits through the gate") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-bloom-retract")
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      bloomIndexPath = Some(root.resolve("bloom_index").toString),
      bloomShards = 4, bloomBitsPerShard = 1L << 12)
    val n1 = IngestPipeline.runNight(spark, Seq(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.accepted == 2, n1.toString)
    val res = IngestPipeline.retract(spark, Seq(2L).toDF("doc_id"),
      "takedown", cfg)
    assert(res.corpusRemoved == 1 && res.bloomRemoved.contains(1L),
      res.toString)
    // the SAME text re-submits under a new id: with the bloom ledger
    // vacuumed it must be ACCEPTED, not dropped against phantom content
    val n2 = IngestPipeline.runNight(spark, Seq(
        30002L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(n2.accepted == 1, s"retracted content must re-admit: $n2")
    val landed = spark.read.parquet(cfg.corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 30002L), landed.toString)
  }

  test("eval gate: contaminated docs drop BEFORE the probe, ledgered with the eval doc as evidence") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-evalgate")
    val evalPath = root.resolve("eval_set").toString
    // the eval doc: 6 tokens → four 3-shingles
    Seq(900L -> "alpha beta gamma delta epsilon zeta")
      .toDF("doc_id", "text").write.mode("overwrite").parquet(evalPath)
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      evalSetPath = Some(evalPath), evalGateK = 3,
      dropLedger = true)
    val n1 = IngestPipeline.runNight(spark, Seq(
        // 1 contains the whole eval doc → containment 1.0 ≥ 0.8: dropped
        1L -> "alpha beta gamma delta epsilon zeta and much more after it",
        2L -> "pack my box with five dozen liquor jugs today",
        // 3/4: byte-identical pair — the near-dup probe must still run
        // AFTER the gate and drop the larger id
        3L -> "the quick brown fox jumps over the lazy dog",
        4L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.accepted == 2 && n1.dropped == 2, n1.toString)
    val landed = spark.read.parquet(cfg.corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == Set(2L, 3L), landed.toString)
    // the ledger explains BOTH drops, the contaminated one pointing at
    // the matched eval doc
    val rows = IngestPipeline.ledger(spark, cfg)
      .select("doc_id", "kept_id", "reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 900L, "contaminated"), (4L, 3L, "intra_dup")),
      rows.toString)
    // the contaminated doc never entered the band index (gate runs before
    // banding): its id appears nowhere in the standing index
    val idxIds = spark.read.parquet(cfg.bandIndexPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds == Set(2L, 3L),
      s"contaminated/dropped docs must not enter the index: $idxIds")
    // night 2: the standing-corpus near-dup path still works post-gate
    val n2 = IngestPipeline.runNight(spark, Seq(
        20L -> "pack my box with five dozen liquor jugs today", // corpus dup
        21L -> "amazingly few discotheques provide jukeboxes here")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(n2.accepted == 1 && n2.dropped == 1, n2.toString)
  }

  test("lm gate: low-quality docs drop BEFORE the probe, ledgered with a null partner") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-lmgate")
    val modelPath = root.resolve("lm_model").toString
    // the train corpus must cover EVERY fluent family in the batch — an
    // out-of-domain doc scores the same all-unseen ln V as gibberish
    // (that is the operator working, not a bug)
    val trainDocs = Seq(
      800L -> "the cat sat on the mat",
      801L -> "the cat ran on the mat",
      802L -> "pack my box with five dozen liquor jugs today",
      803L -> "pack my box with six dozen liquor jugs today")
      .toDF("doc_id", "text")
    graft.operators.NgramLm.save(spark,
      graft.operators.NgramLm.train(trainDocs, "doc_id", "text"), modelPath)
    val model = graft.operators.NgramLm.load(spark, modelPath)
    // ceiling strictly between the fluent docs' scores and the gibberish
    // doc's (all-unseen-context = ln V) — derived, not guessed
    val fluent = "the cat sat on the mat"
    val packDoc = "pack my box with five dozen liquor jugs today"
    val gibberish = "zz qq ww rr tt uu"
    val ces = graft.operators.NgramLm.crossEntropy(
        Seq(1L -> fluent, 2L -> gibberish, 3L -> packDoc)
          .toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.max(ces(1L), ces(3L)) < ces(2L), ces.toString)
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      lmModelPath = Some(modelPath),
      lmGateMaxCe = (math.max(ces(1L), ces(3L)) + ces(2L)) / 2,
      dropLedger = true)
    val n1 = IngestPipeline.runNight(spark, Seq(
        1L -> fluent,
        2L -> gibberish, // past the ceiling: gate-dropped
        // 3/4: byte-identical pair — the probe must still run AFTER the
        // gate and drop the larger id
        3L -> packDoc,
        4L -> packDoc,
        5L -> "hi") // single token: unscorable, must pass the gate
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.accepted == 3 && n1.dropped == 2, n1.toString)
    val landed = spark.read.parquet(cfg.corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 3L, 5L), landed.toString)
    // the ledger explains both drops; the quality drop has NO partner doc
    val rows = IngestPipeline.ledger(spark, cfg)
      .select("doc_id", "kept_id", "reason").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
      .toSet
    assert(rows == Set((2L, None, "low_quality"), (4L, Some(3L), "intra_dup")),
      rows.toString)
    // the flagged doc never entered the band index (gate before banding)
    val idxIds = spark.read.parquet(cfg.bandIndexPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!idxIds.contains(2L), idxIds.toString)
    // an unbounded ceiling with the path set is a configuration error
    intercept[IllegalArgumentException] {
      IngestPipeline.runNight(spark,
        Seq(9L -> "x y z").toDF("doc_id", "text"), "n2",
        cfg.copy(lmGateMaxCe = Double.PositiveInfinity))
    }
  }

  test("nb classifier gate: rejected docs drop BEFORE the probe, replay-deterministic") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-nbgate")
    val modelPath = root.resolve("nb_model").toString
    val fluent = "the cat sat on the mat with the other cat"
    val packDoc = "pack my box with five dozen liquor jugs today"
    val spam = "buy cheap pills now buy cheap pills now buy cheap pills"
    graft.operators.NbClassifier.save(spark,
      graft.operators.NbClassifier.train(
        Seq(800L -> fluent, 801L -> packDoc).toDF("doc_id", "text"),
        Seq(802L -> spam).toDF("doc_id", "text"), "doc_id", "text"),
      modelPath)
    val model = graft.operators.NbClassifier.load(spark, modelPath)
    val batch = Seq(
      1L -> fluent,
      2L -> spam, // negative-seed-like: classifier-rejected
      // 3/4: byte-identical pair — the probe must still run AFTER the gate
      3L -> packDoc,
      4L -> packDoc)
      .toDF("doc_id", "text")
    // derive the expected verdicts from the operator itself (the draw is
    // id-hash-seeded, so this is exact, not probabilistic)
    val (_, flagged) = graft.operators.NbClassifier.paretoGate(
      batch, "doc_id", "text", model)
    val flaggedIds = flagged.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flaggedIds.contains(2L) && !flaggedIds.contains(1L) &&
      !flaggedIds.contains(3L), flaggedIds.toString)
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      nbModelPath = Some(modelPath),
      dropLedger = true)
    val n1 = IngestPipeline.runNight(spark, batch, "n1", cfg)
    assert(n1.accepted == 4 - flaggedIds.size - 1, n1.toString)
    val landed = spark.read.parquet(cfg.corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 3L) -- flaggedIds, landed.toString)
    // the ledger explains the classifier drop with a null partner and the
    // probe drop with its kept doc
    val rows = IngestPipeline.ledger(spark, cfg)
      .select("doc_id", "kept_id", "reason").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
      .toSet
    assert(rows.contains((4L, Some(3L), "intra_dup")), rows.toString)
    assert(flaggedIds.forall(id =>
      rows.contains((id, None, "classifier_rejected"))), rows.toString)
    // rejected docs never entered the band index (gate before banding)
    val idxIds = spark.read.parquet(cfg.bandIndexPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert((idxIds & flaggedIds).isEmpty, idxIds.toString)
  }

  test("gate-rate drift: a corpus-shifted night fires the warning; the audit surface carries the share") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-gatedrift")
    val modelPath = root.resolve("lm_model").toString
    val trainDocs = Seq(
      800L -> "the cat sat on the mat",
      801L -> "the cat ran on the mat",
      802L -> "pack my box with five dozen liquor jugs today",
      803L -> "pack my box with six dozen liquor jugs today")
      .toDF("doc_id", "text")
    graft.operators.NgramLm.save(spark,
      graft.operators.NgramLm.train(trainDocs, "doc_id", "text"), modelPath)
    val model = graft.operators.NgramLm.load(spark, modelPath)
    val fluent = "the cat sat on the mat"
    val packDoc = "pack my box with five dozen liquor jugs today"
    val ces = graft.operators.NgramLm.crossEntropy(
        Seq(1L -> fluent, 2L -> "zz qq ww rr tt uu", 3L -> packDoc)
          .toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      lmModelPath = Some(modelPath),
      lmGateMaxCe = (math.max(ces(1L), ces(3L)) + ces(2L)) / 2)
    // three clean nights build the baseline (distinct fluent docs; the
    // LM share is measured BEFORE the near-dup probe, so later probe
    // drops never pollute it) — none may warn (n1/n2 have no baseline,
    // n3's share matches it)
    def fluentNight(ids: Range) =
      ids.map(i => i.toLong -> s"the cat sat on the mat $i").toDF("doc_id", "text")
    val (_, cleanWarns) = graft.core.Warn.capturing {
      IngestPipeline.runNight(spark, fluentNight(1 to 5), "n1", cfg)
      IngestPipeline.runNight(spark, fluentNight(11 to 15), "n2", cfg)
      IngestPipeline.runNight(spark, fluentNight(21 to 25), "n3", cfg)
    }
    assert(!cleanWarns.exists(_.contains("flagged share")), cleanWarns.toString)
    // the corpus-shifted night: 4 of 5 docs are gibberish the standing
    // model flags — share jumps 0.0 → 0.8 against a 0.0 trailing median.
    // The surviving doc is from the OTHER trained family so the near-dup
    // probe (which sees the landed cat-sentence corpus) never drops it
    val shifted = (Seq(31L -> packDoc) ++
      (32L to 35L).map(i => i -> s"zz$i qq ww rr tt uu")).toDF("doc_id", "text")
    val (n4, warns) = graft.core.Warn.capturing {
      IngestPipeline.runNight(spark, shifted, "n4", cfg)
    }
    assert(n4.accepted == 1 && n4.dropped == 4, n4.toString)
    val hit = warns.filter(_.contains("flagged share"))
    assert(hit.nonEmpty, s"the shifted night must warn; got: $warns")
    assert(hit.head.contains("ingest_lm_n4") && hit.head.contains("0.8000"),
      hit.head)
    // the audit surface: per-night shares straight from the execution log
    val meta = new graft.meta.MetaStore(spark, cfg.metaDir)
    val shares = GateDrift.gateShares(meta, "ingest_lm_")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(shares == Map("n1" -> 0.0, "n2" -> 0.0, "n3" -> 0.0, "n4" -> 0.8),
      shares.toString)
    // latest-wins on a replayed night's audit rows: hand-append a stale
    // duplicate SUCCESS row for n4 with different counts — the NEWER row
    // (already present) must keep ruling the surface... and a newer
    // replacement supersedes it
    val t0 = new java.sql.Timestamp(0L) // far in the past
    meta.appendExecutionLog(Seq(graft.meta.ExecutionLogRow(
      "x", t0, t0, "SUCCESS", "ingest_lm_n4", 10L, 0L, 1L, "", "")))
    val still = GateDrift.gateShares(meta, "ingest_lm_")
      .filter(col("night") === "n4").collect().head.getDouble(3)
    assert(still == 0.8, s"stale replay row must not win: $still")
    // pure trigger edges: no baseline under MinTrailing nights; both the
    // factor and the absolute gap must clear
    assert(!GateDrift.drifted(0.9, Seq(0.1)))
    assert(GateDrift.drifted(0.8, Seq(0.0, 0.0, 0.0)))
    assert(!GateDrift.drifted(0.04, Seq(0.0, 0.0))) // gap <= 0.05
    assert(!GateDrift.drifted(0.30, Seq(0.2, 0.18, 0.22))) // < 2x median
    assert(GateDrift.drifted(0.50, Seq(0.2, 0.18, 0.22)))
    // the exact/eval gates monitor through the same surface: a hand-
    // seeded re-crawl storm (share 0.02 → 0.60) fires for ingest_exact_
    def seeded(nightK: String, in: Long, del: Long, ts: Long) =
      graft.meta.ExecutionLogRow("x", new java.sql.Timestamp(ts),
        new java.sql.Timestamp(ts), "SUCCESS", s"ingest_exact_$nightK",
        in, 0L, del, "", "")
    meta.appendExecutionLog(Seq(
      seeded("m1", 100L, 2L, 1000L), seeded("m2", 100L, 2L, 2000L),
      seeded("m3", 100L, 3L, 3000L), seeded("m4", 100L, 60L, 4000L)))
    val (_, stormWarn) = graft.core.Warn.capturing {
      GateDrift.checkAfterNight(meta, "ingest_exact_", "m4", 100L, 60L)
    }
    assert(stormWarn.exists(_.contains("ingest_exact_m4")), stormWarn.toString)
    val (_, calmWarn) = graft.core.Warn.capturing {
      GateDrift.checkAfterNight(meta, "ingest_exact_", "m3", 100L, 3L)
    }
    assert(!calmWarn.exists(_.contains("flagged share")), calmWarn.toString)
    // zero-input nights (empty weekend batches) must not drag the
    // baseline median to 0 and false-fire the next ordinary night
    def nb(nightK: String, in: Long, del: Long, ts: Long) =
      graft.meta.ExecutionLogRow("x", new java.sql.Timestamp(ts),
        new java.sql.Timestamp(ts), "SUCCESS", s"ingest_nb_$nightK",
        in, 0L, del, "", "")
    meta.appendExecutionLog(Seq(
      nb("k1", 100L, 10L, 1000L), nb("k2", 100L, 11L, 2000L),
      nb("k3", 0L, 0L, 3000L), nb("k4", 0L, 0L, 4000L),
      nb("k5", 0L, 0L, 5000L), nb("k6", 0L, 0L, 6000L),
      nb("k7", 100L, 10L, 7000L)))
    val (_, emptyCalm) = graft.core.Warn.capturing {
      GateDrift.checkAfterNight(meta, "ingest_nb_", "k7", 100L, 10L)
    }
    assert(!emptyCalm.exists(_.contains("flagged share")),
      s"a steady share after empty nights must not fire: $emptyCalm")
  }

  test("bloom maintain cadence: heavy retraction triggers a nightly rebuild, restoring precision") {
    import spark.implicits._
    val root = TempDirs.create("graft-ingest-bloom-rebuild")
    val bloomPath = root.resolve("bloom_index").toString
    val cfg = IngestConfig(
      corpusPath = root.resolve("corpus").toString,
      bandIndexPath = root.resolve("band_index").toString,
      metaDir = root.resolve("meta").toString,
      bloomIndexPath = Some(bloomPath),
      bloomShards = 4, bloomBitsPerShard = 1L << 12)
    val n1 = IngestPipeline.runNight(spark, Seq(
        1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "pack my box with five dozen liquor jugs today",
        3L -> "amazingly few discotheques provide jukeboxes here",
        4L -> "sphinx of black quartz judge my vow tonight ok")
      .toDF("doc_id", "text"), "n1", cfg)
    assert(n1.accepted == 4 && n1.bloomRebuilt.contains(false), n1.toString)
    // takedown of 3 of 4: the stale-bit share jumps to 75% — beyond
    // cfg.bloomRebuildShare — and the NEXT night's maintenance must heal
    // it on its own cadence (no manual rebuildBlooms)
    IngestPipeline.retract(spark, Seq(1L, 2L, 3L).toDF("doc_id"),
      "bulk-takedown", cfg)
    assert(graft.operators.BloomIndex.staleShare(spark, bloomPath) > 0.5)
    val n2 = IngestPipeline.runNight(spark, Seq(
        5L -> "how vexingly quick daft zebras jump over fences")
      .toDF("doc_id", "text"), "n2", cfg)
    assert(n2.bloomRebuilt.contains(true),
      s"heavy retraction must trigger the nightly rebuild: $n2")
    assert(graft.operators.BloomIndex.staleShare(spark, bloomPath) == 0.0,
      "the rebuild must reset the stale share")
    // the rebuild logged loudly (rows_deleted=1 on the maintenance row)
    val meta = new MetaStore(spark, cfg.metaDir)
    val maint = meta.executionLog
      .filter(col("target_table") === "ingest_compact_bloom_n2")
      .select("records_deleted").head().getLong(0)
    assert(maint == 1L, "the audit row must flag the rebuild")
    // precision restored AND answers exact: retracted content re-admits,
    // standing content still drops
    val n3 = IngestPipeline.runNight(spark, Seq(
        61L -> "the quick brown fox jumps over the lazy dog", // retracted → new
        62L -> "how vexingly quick daft zebras jump over fences") // standing dup
      .toDF("doc_id", "text"), "n3", cfg)
    assert(n3.accepted == 1 && n3.bloomRebuilt.contains(false), n3.toString)
    val landed = spark.read.parquet(cfg.corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == Set(4L, 5L, 61L), landed.toString)
  }
}
