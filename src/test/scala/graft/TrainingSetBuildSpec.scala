package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reports.TrainingSetBuild
import graft.reports.TrainingSetBuild.BuildConfig

class TrainingSetBuildSpec extends AnyFunSuite with SparkSpec {

  /** Quality-passing filler (the CurationReportSpec recipe). */
  private val body: String =
    (1 to 30).map(i => s"the animal$i walks$i and jumps$i gently$i to a " +
      s"forest$i near city$i that is of note$i today$i").mkString(" ")

  private def corpus = {
    import spark.implicits._
    ((0L to 19L).map(i =>
      (i, body + s" doc $i", if (i % 2 == 0) "web" else "wiki", 100L + i)) ++
      Seq((90L, "too short to keep", "web", 5L)))
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  private val cfg = BuildConfig(
    weights = Map("web" -> 2.0, "wiki" -> 0.5),
    maxEpochs = 10, shuffleSpan = 1000L, budget = 300, packBuckets = 4)

  test("plan: filter -> mix -> unique keys -> contiguous offsets") {
    val p = TrainingSetBuild.plan(corpus, cfg)
    val rows = p.orderBy("pack_key").collect()
    // doc 90 filtered; web docs (10) twice, wiki (10) halved by hash
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(!byDoc.contains(90L))
    byDoc.foreach { case (id, rs) =>
      if (id % 2 == 0) assert(rs.length == 2, s"web doc $id gets 2 epochs")
      else assert(rs.length <= 1, s"wiki doc $id is sampled, not replicated")
    }
    // pack keys unique; offsets are prefix sums in key order
    val keys = rows.map(_.getAs[Long]("pack_key"))
    assert(keys.distinct.length == keys.length)
    val offs = rows.map(_.getAs[Long]("token_offset"))
    val toks = rows.map(_.getAs[Long]("n_chars"))
    assert(offs.toSeq == toks.scanLeft(0L)(_ + _).dropRight(1).toSeq)
    rows.foreach(r => assert(r.getAs[Long]("shard") ==
      r.getAs[Long]("token_offset") / cfg.budget))
  }

  test("lm filter: a rule-passing but out-of-domain doc is cut from the mix") {
    import spark.implicits._
    val dir = TempDirs.create("graft-tsb-lm")
    val modelPath = dir.resolve("lm_model").toString
    graft.operators.NgramLm.save(spark, graft.operators.NgramLm.train(
      corpus.filter(col("doc_id") <= 19L), "doc_id", "text"), modelPath)
    val model = graft.operators.NgramLm.load(spark, modelPath)
    // passes the rule battery (50+ tokens, stopwords, distinct tokens) but
    // is out-of-domain under the model: every second transition has an
    // unseen context
    val offDomain = (1 to 30).map(i => s"the zqx$i the wkv$i").mkString(" ")
    val withOff = corpus.union(
      Seq((95L, offDomain, "web", 120L)).toDF("doc_id", "text", "lang", "n_chars"))
    val ces = graft.operators.NgramLm.crossEntropy(
        Seq(1L -> (body + " doc 1"), 2L -> offDomain).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ces(1L) < ces(2L), ces.toString)
    val lmCfg = cfg.copy(lmModelPath = Some(modelPath),
      lmGateMaxCe = (ces(1L) + ces(2L)) / 2)
    val packedIds = TrainingSetBuild.plan(withOff, lmCfg)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    // the off-domain doc is cut; the in-domain mix is untouched
    assert(!packedIds.contains(95L), packedIds.toString)
    val baseline = TrainingSetBuild.plan(corpus, cfg)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(packedIds === baseline)
    // unbounded ceiling with a model path fails fast
    intercept[IllegalArgumentException](
      TrainingSetBuild.plan(withOff, cfg.copy(lmModelPath = Some(modelPath))))
  }

  test("nb filter: a rule-passing but negative-seed-like doc is cut") {
    import spark.implicits._
    val dir = TempDirs.create("graft-tsb-nb")
    val modelPath = dir.resolve("nb_model").toString
    // negative seed shares the spam doc's vocabulary; positive seed is the
    // corpus body's
    val spam = (1 to 30).map(i => s"buy$i cheap$i pills$i now$i").mkString(" ")
    graft.operators.NbClassifier.save(spark, graft.operators.NbClassifier.train(
      Seq(1L -> (body + " doc 1")).toDF("doc_id", "text"),
      Seq(2L -> spam).toDF("doc_id", "text"), "doc_id", "text"), modelPath)
    val withSpam = corpus.union(
      Seq((96L, spam, "web", 120L)).toDF("doc_id", "text", "lang", "n_chars"))
    val nbCfg = cfg.copy(nbModelPath = Some(modelPath))
    val packedIds = TrainingSetBuild.plan(withSpam, nbCfg)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!packedIds.contains(96L), packedIds.toString)
    // the in-domain mix is untouched (keep_p ~ 1 survives any draw)
    val baseline = TrainingSetBuild.plan(corpus, cfg)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(packedIds === baseline)
  }

  test("run: shards + manifest land, audit trail written, summary exact") {
    val dir = TempDirs.create("graft-trainset")
    val out = dir.resolve("out").toString
    val summary = TrainingSetBuild.run(spark, corpus, out,
      dir.resolve("meta").toString, cfg)
    assert(summary.inputDocs == 21)
    val planned = TrainingSetBuild.plan(corpus, cfg)
    assert(summary.packedRows == planned.count())
    assert(summary.keptDocs ==
      planned.select("doc_id").distinct().count())
    // jsonl shards read back as the plan, manifest covers every shard
    val back = spark.read.json(s"$out/shards")
    assert(back.count() == summary.packedRows)
    val manifest = spark.read.parquet(s"$out/manifest")
    assert(manifest.count() == summary.shards)
    assert(manifest.agg(sum("n_tokens")).head().getLong(0) == summary.totalTokens)
    // audited
    val log = new graft.meta.MetaStore(spark, dir.resolve("meta").toString)
      .executionLog
    val status = log.collect().map(r =>
      r.getAs[String]("target_table") -> r.getAs[String]("execution_status")).toMap
    assert(status.get("trainset_stage").contains("SUCCESS"))
    assert(status.get("trainset_plan").contains("SUCCESS"))
    assert(status.get("trainset_write").contains("SUCCESS"))
    // the staged table is the battery-once resume point
    assert(spark.read.parquet(s"$out/staged").count() == summary.packedRows)
  }

  test("a fully-filtered corpus builds an empty-but-well-formed layout") {
    import spark.implicits._
    val junk = Seq((1L, "too short", "web", 2L), (2L, "also short", "web", 2L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = TempDirs.create("graft-trainset-empty")
    val summary = TrainingSetBuild.run(spark, junk,
      dir.resolve("o").toString, dir.resolve("m").toString, cfg)
    assert(summary.inputDocs == 2 && summary.keptDocs == 0
      && summary.packedRows == 0 && summary.shards == 0
      && summary.totalTokens == 0)
    assert(spark.read.parquet(s"${dir.resolve("o")}/manifest").count() == 0)
  }

  test("pack-key collision misconfiguration fails fast, never corrupts") {
    // a weight whose ceil exceeds maxEpochs would alias (doc, epoch) keys —
    // the config guard raises before any job runs
    val e = intercept[IllegalArgumentException] {
      TrainingSetBuild.plan(corpus, cfg.copy(weights = Map("web" -> 11.0)))
    }
    assert(e.getMessage.contains("maxEpochs"))
    // keys reaching shuffleSpan bleed into the next hash block — the
    // per-row guard inside Packing.shuffleKey raises instead of silently
    // reordering the pack (doc_id·maxEpochs+epoch reaches 191 here)
    val err = intercept[Exception] {
      TrainingSetBuild.plan(corpus, cfg.copy(shuffleSpan = 100L)).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("shuffleKey"),
      String.valueOf(err.getMessage))
  }

  test("resume: a committed staged table skips the battery; shards byte-identical") {
    val dir = TempDirs.create("graft-trainset-resume")
    val out = dir.resolve("out").toString
    def lines(root: String): Seq[(String, Seq[String])] =
      new java.io.File(s"$root/shards").listFiles().filter(_.isDirectory)
        .sortBy(_.getName).toSeq.map { d =>
          val fs = d.listFiles().filter(_.getName.endsWith(".json"))
            .sortBy(_.getName)
          d.getName -> fs.toSeq.flatMap(f =>
            scala.io.Source.fromFile(f).getLines().toSeq)
        }
    val s1 = TrainingSetBuild.run(spark, corpus, out,
      dir.resolve("m1").toString, cfg)
    val full = lines(out)
    // crash after the stage committed, before the shard write landed:
    // the staged table (with its _SUCCESS marker) survives, the layout
    // below it is gone
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      finally walk.close()
    }
    rmTree(java.nio.file.Paths.get(s"$out/shards"))
    rmTree(java.nio.file.Paths.get(s"$out/manifest"))
    val s2 = TrainingSetBuild.run(spark, corpus, out,
      dir.resolve("m2").toString, cfg.copy(resume = true))
    assert(s2.packedRows == s1.packedRows && s2.shards == s1.shards
      && s2.totalTokens == s1.totalTokens)
    assert(lines(out) == full, "resumed shards must be byte-identical")
    // the audit trail says the stage was skipped, not silently absent
    val log = new graft.meta.MetaStore(spark, dir.resolve("m2").toString)
      .executionLog.collect().map(r =>
        r.getAs[String]("target_table") -> r.getAs[String]("execution_status"))
      .toMap
    assert(log.get("trainset_stage").contains("SKIPPED"), log.toString)
    assert(log.get("trainset_plan").contains("SUCCESS"))
    assert(log.get("trainset_write").contains("SUCCESS"))
    // default (resume = false) restages: the stage phase runs again
    val s3 = TrainingSetBuild.run(spark, corpus, out,
      dir.resolve("m3").toString, cfg)
    assert(s3.packedRows == s1.packedRows)
    val log3 = new graft.meta.MetaStore(spark, dir.resolve("m3").toString)
      .executionLog.collect().map(r =>
        r.getAs[String]("target_table") -> r.getAs[String]("execution_status"))
      .toMap
    assert(log3.get("trainset_stage").contains("SUCCESS"), log3.toString)
  }

  test("rebuild is byte-identical: same corpus, same shard lines") {
    val d1 = TempDirs.create("graft-trainset-a").resolve("o").toString
    val d2 = TempDirs.create("graft-trainset-b").resolve("o").toString
    val m = TempDirs.create("graft-trainset-m")
    TrainingSetBuild.run(spark, corpus, d1, m.resolve("m1").toString, cfg)
    TrainingSetBuild.run(spark, corpus, d2, m.resolve("m2").toString, cfg)
    def lines(root: String): Seq[(String, Seq[String])] =
      new java.io.File(s"$root/shards").listFiles().filter(_.isDirectory)
        .sortBy(_.getName).toSeq.map { d =>
          val fs = d.listFiles().filter(_.getName.endsWith(".json"))
            .sortBy(_.getName)
          d.getName -> fs.toSeq.flatMap(f =>
            scala.io.Source.fromFile(f).getLines().toSeq)
        }
    assert(lines(d1) == lines(d2))
  }
}
