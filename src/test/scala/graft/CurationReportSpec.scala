package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reports.CurationReport
import graft.reports.CurationReport.CurationConfig

class CurationReportSpec extends AnyFunSuite with SparkSpec {

  /** Long English filler that passes the quality battery: 50+ tokens,
    * stopword fraction ≈ 0.5, and enough per-sentence-numbered tokens
    * that the duplicate-token ratio stays under the 0.6 Gopher cut. */
  private val enBody: String =
    (1 to 30).map(i => s"the animal$i walks$i and jumps$i gently$i to a " +
      s"forest$i near city$i that is of note$i today$i").mkString(" ")

  private def fixture = {
    import spark.implicits._
    val rows =
      // 4 distinct good English docs, one carrying an email + ssn
      (0L to 3L).map(i => (i, enBody + s" doc copy $i" +
        (if (i == 0) " contact jane.doe@example.com ssn 123-45-6789" else ""))) ++
      // an exact duplicate pair
      Seq((10L, enBody + " unique tail ten"), (11L, enBody + " unique tail ten")) ++
      // a too-short doc
      Seq((20L, "too short"))
    rows.toDF("doc_id", "text")
  }

  private def zipSheetNames(path: String): Seq[String] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val wb = zf.entries().asScala.find(_.getName == "xl/workbook.xml").get
      val content = new String(zf.getInputStream(wb).readAllBytes, "UTF-8")
      """<sheet name="([^"]+)"""".r.findAllMatchIn(content)
        .map(_.group(1)).toSeq
    } finally zf.close()
  }

  test("run: one workbook, all sheets, audited, summary numbers exact") {
    val dir = TempDirs.create("graft-curation")
    val xlsx = dir.resolve("curation.xlsx").toString
    val summary = CurationReport.run(spark, fixture, xlsx,
      dir.resolve("meta").toString)
    assert(summary.docs == 7 && summary.exactDupDocs == 1) // 11 duplicates 10
    assert(summary.keptDocs == 6) // doc 20 fails too_few_tokens
    assert(summary.sheets == Seq("Overview", "Languages", "Quality", "PII",
      "Token Histogram", "Exact Dup Groups", "Top Vocabulary"))
    assert(zipSheetNames(xlsx) == summary.sheets)
    // the run is audited: both phases logged SUCCESS
    val log = new graft.meta.MetaStore(spark, dir.resolve("meta").toString)
      .executionLog
    val byProc = log.collect().map(r =>
      r.getAs[String]("target_table") -> r.getAs[String]("execution_status")).toMap
    assert(byProc.get("curation_sections").contains("SUCCESS"))
    assert(byProc.get("curation_render").contains("SUCCESS"))
    assert(graft.core.Caches.trackedCount == 0) // released on the way out
  }

  test("sections: quality reasons, PII patterns, dup groups, vocab size") {
    val secs = CurationReport.sections(spark, fixture,
      CurationConfig(vocabK = 5)).toMap
    val quality = secs("Quality").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quality("keep") == 6L && quality("too_few_tokens") == 1L)
    val pii = secs("PII").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pii("email") == 1L && pii("ssn") == 1L && pii("card") == 0L)
    val dups = secs("Exact Dup Groups").collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 10L
      && dups(0).getLong(1) == 2L)
    assert(secs("Top Vocabulary").count() == 5)
    val langs = secs("Languages").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.getOrElse("en", 0L) >= 6L)
    graft.core.Caches.releaseAll()
  }

  test("null-text docs are counted on their own, never as duplicates") {
    import spark.implicits._
    // three null-text docs: md5(null) is null, so naive count(*) −
    // countDistinct arithmetic would report them as 3 phantom duplicates
    val d = fixture.union(Seq((40L, Option.empty[String]),
        (41L, None), (42L, None))
      .toDF("doc_id", "text"))
    val secs = CurationReport.sections(spark, d, CurationConfig()).toMap
    val ov = secs("Overview").head()
    assert(ov.getAs[Long]("exact_dup_docs") == 1L) // still just 11 dup of 10
    assert(ov.getAs[Long]("null_text_docs") == 3L)
    // the dup-groups sheet never lumps null-text docs into a null-hash group
    val dups = secs("Exact Dup Groups").collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 10L)
    graft.core.Caches.releaseAll()
  }

  test("empty corpus: zeroed overview, workbook still renders") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val dir = TempDirs.create("graft-curation-empty")
    val summary = CurationReport.run(spark, empty,
      dir.resolve("c.xlsx").toString, dir.resolve("meta").toString)
    assert(summary.docs == 0 && summary.keptDocs == 0
      && summary.exactDupDocs == 0)
    assert(zipSheetNames(dir.resolve("c.xlsx").toString).nonEmpty)
  }

  test("nearDup sheet appears when enabled and finds the planted pair") {
    import spark.implicits._
    val d = fixture.union(
      Seq((30L, enBody + " unique tail ten zzz")).toDF("doc_id", "text"))
    val dir = TempDirs.create("graft-curation-nd")
    val summary = CurationReport.run(spark, d,
      dir.resolve("c.xlsx").toString, dir.resolve("meta").toString,
      CurationConfig(nearDup = true))
    assert(summary.sheets.last == "Near-Dup Pairs")
    assert(summary.nearDupPairs >= 1L) // 10/11 exact, 30 near of both
  }

  test("lm sheets appear when a model is configured; planted gibberish is worst") {
    import spark.implicits._
    val dir = TempDirs.create("graft-curation-lm")
    val modelPath = dir.resolve("lm_model").toString
    // train on the fixture's own good docs — in-domain text scores low
    graft.operators.NgramLm.save(spark, graft.operators.NgramLm.train(
      fixture.filter(col("doc_id") <= 3L), "doc_id", "text"), modelPath)
    val d = fixture.union(
      Seq((40L, "zzq qqz wwx rrv ttk uuj zzq wwx")).toDF("doc_id", "text"))
    val frames = CurationReport.sections(spark, d,
      CurationConfig(lmModelPath = Some(modelPath), lmWorstN = 3))
    try {
      assert(frames.map(_._1).takeRight(2) ==
        Seq("LM Quality Tiers", "LM Worst Docs"))
      val tiers = frames.toMap.apply("LM Quality Tiers").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(tiers.keySet == Set("head", "middle", "tail"))
      assert(tiers.values.sum == 8L) // every scoreable doc got a tier
      val worst = frames.toMap.apply("LM Worst Docs").collect()
      assert(worst.length == 3)
      // the all-unseen docs lead: 20 ("too short" — one unseen bigram)
      // ties the gibberish doc at ln V exactly, id breaks the tie
      assert(worst.take(2).map(_.getLong(0)).toSeq == Seq(20L, 40L),
        worst.map(_.toString).mkString("; "))
      // ordered by score, highest first
      val ces = worst.map(_.getDouble(2)).toSeq
      assert(ces == ces.sorted.reverse)
    } finally graft.core.Caches.releaseAll()
  }

  test("classifier sheets appear when a model is configured; planted spam is worst and rejected") {
    import spark.implicits._
    val dir = TempDirs.create("graft-curation-nb")
    val modelPath = dir.resolve("nb_model").toString
    val spam = "buy cheap pills now buy cheap pills now buy cheap pills"
    graft.operators.NbClassifier.save(spark, graft.operators.NbClassifier.train(
      fixture.filter(col("doc_id") <= 3L),
      Seq(900L -> spam).toDF("doc_id", "text"), "doc_id", "text"), modelPath)
    val d = fixture.union(Seq((41L, spam)).toDF("doc_id", "text"))
    val frames = CurationReport.sections(spark, d,
      CurationConfig(nbModelPath = Some(modelPath), nbWorstN = 3))
    try {
      assert(frames.map(_._1).takeRight(2) ==
        Seq("Classifier Keep Audit", "Classifier Worst Docs"))
      val audit = frames.toMap.apply("Classifier Keep Audit").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // the audit previews the gate: the spam doc rejects, and counts
      // cover every scoreable doc
      assert(audit.getOrElse("reject", 0L) >= 1L, audit.toString)
      assert(audit.values.sum == 8L, audit.toString) // 7 fixture + spam
      val worst = frames.toMap.apply("Classifier Worst Docs").collect()
      assert(worst.length == 3)
      assert(worst.head.getLong(0) == 41L,
        worst.map(_.toString).mkString("; "))
      // ordered by score, lowest (most negative-seed-like) first
      val los = worst.map(_.getDouble(2)).toSeq
      assert(los == los.sorted)
      // the audit's keep/reject split is EXACTLY paretoKeep's
      val m = graft.operators.NbClassifier.load(spark, modelPath)
      val keptIds = graft.operators.NbClassifier.paretoKeep(
          graft.operators.NbClassifier.logOdds(d, "doc_id", "text", m),
          "doc_id").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(audit.getOrElse("keep", 0L) == keptIds.size.toLong)
    } finally graft.core.Caches.releaseAll()
  }

  test("dupSpans sheet appears when enabled and surfaces the shared body") {
    val frames = CurationReport.sections(spark, fixture,
      CurationConfig(dupSpans = true, spanK = 8, spanTopN = 5))
    assert(frames.last._1 == "Duplicated Spans")
    val rows = frames.last._2.collect()
    assert(rows.length == 5) // enBody repeats across 6 docs: top-5 is full
    // every reported span occurs in all six enBody-carrying docs
    assert(rows.forall(_.getAs[Long]("n_docs") == 6L), rows.mkString("; "))
  }
}
