package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.operators.Multimodal
import graft.meta.{ExecutionLogRow, MetaStore}

class StreamsSpec extends AnyFunSuite with SparkSpec {

  test("windowedEventAgg over a file stream matches the batch result") {
    import spark.implicits._
    val dir = TempDirs.create("graftstream").toString
    val batch = Seq(
      ("click", java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 1.0),
      ("click", java.sql.Timestamp.valueOf("2024-01-01 00:00:40"), 2.0),
      ("view", java.sql.Timestamp.valueOf("2024-01-01 00:01:10"), 5.0)
    ).toDF("event_type", "ts", "value")
    batch.write.parquet(dir + "/in")

    val stream = Streams.parquetStream(spark, dir + "/in", batch.schema)
    val q = Streams.startMemorySink(
      Streams.windowedEventAgg(stream, "1 minute", "10 seconds"),
      "agg_smoke", outputMode = "complete")
    try {
      q.processAllAvailable()
      val out = spark.table("agg_smoke")
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("total_value"))).toSeq
      assert(out == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("latestVersionStream keeps the newest version per key across triggers") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = TempDirs.create("graftlv").toString
    val schema = Seq(("u1", ts("2024-01-01 00:00:00"), 1L, "v1"))
      .toDF("user_id", "ts", "seq", "payload").schema
    // two files → two triggers (maxFilesPerTrigger=1): state carries across
    Seq(("u1", ts("2024-01-01 00:00:00"), 1L, "v1"),
        ("u2", ts("2024-01-01 01:00:00"), 1L, "w1"))
      .toDF("user_id", "ts", "seq", "payload").coalesce(1).write.parquet(dir + "/in")
    Seq(("u1", ts("2024-01-02 00:00:00"), 2L, "v2"))
      .toDF("user_id", "ts", "seq", "payload").coalesce(1)
      .write.mode("append").parquet(dir + "/in")

    val stream = Streams.parquetStream(spark, dir + "/in", schema)
    val q = Streams.startMemorySink(
      Streams.latestVersionStream(stream, "user_id", "ts", "seq"),
      "lv_smoke", outputMode = "update")
    try {
      q.processAllAvailable()
      val latest = spark.table("lv_smoke")
        .groupBy("user_id").agg(max_by(col("payload"), col("ts")).as("payload"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(latest == Map("u1" -> "v2", "u2" -> "w1"))
    } finally q.stop()
  }

  test("sessionizeStream closes gap sessions like the batch form") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = TempDirs.create("graftsess").toString
    // u1: two sessions (gap > 5 min between 00:02 and 00:30); u2: one
    val batch = Seq(
      ("u1", ts("2024-01-01 00:00:00")), ("u1", ts("2024-01-01 00:02:00")),
      ("u1", ts("2024-01-01 00:30:00")),
      ("u2", ts("2024-01-01 00:01:00")))
      .toDF("user_id", "ts")
    batch.coalesce(1).write.parquet(dir + "/in")
    // a far-future event pushes the watermark so every session above closes
    Seq(("u9", ts("2024-01-02 00:00:00"))).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(dir + "/in")

    val stream = Streams.parquetStream(spark, dir + "/in", batch.schema)
    val q = Streams.startMemorySink(
      Streams.sessionizeStream(stream, "user_id", "ts", gapMinutes = 5,
        watermark = "0 seconds"),
      "sess_smoke", outputMode = "append")
    try {
      q.processAllAvailable()
      val got = spark.table("sess_smoke")
        .filter(col("key") =!= "u9") // the watermark-pusher itself
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      // batch reference: Cdc.sessionize extents; stream end = last + gap
      val expected = graft.ops.Cdc.sessionize(batch, "user_id", "ts", gapMinutes = 5)
        .groupBy("user_id", "session_no")
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(2), // start
          new java.sql.Timestamp(r.getTimestamp(3).getTime + 5 * 60000L),
          r.getLong(4))).toSet
      assert(got == expected, s"got $got\nexpected $expected")
    } finally q.stop()
  }

  test("multimodal plumbing: payload bytes survive and features are exact") {
    import spark.implicits._
    val df = Seq((7L, "abc")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(df, "doc_id", "text"))
      .collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.media_id == 7L && f.n_bytes == 3L &&
      f.checksum == 'a'.toLong + 'b' + 'c' && f.format == "fake/utf8")
  }

  test("multimodal chunking: overlap, tail chunk, empty payload; payload dup groups") {
    import spark.implicits._
    // payload of 10 bytes, chunk 4, stride 3: starts 0,3,6,9 → chunks
    // "0123", "3456", "6789", "9" (tail shorter than chunkBytes)
    val media = Multimodal.asMedia(
      Seq((1L, "0123456789"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text")
    val chunks = Multimodal.chunkPayload(media, chunkBytes = 4, stride = 3)
      .orderBy("media_id", "chunk_no")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]]("chunk"), "UTF-8"), r.getInt(3)))
    assert(chunks.toSeq == Seq(
      (1L, 0, "0123", 4), (1L, 1, "3456", 4), (1L, 2, "6789", 4),
      (1L, 3, "9", 1)),
      s"empty/null payloads must yield zero chunks: ${chunks.toSeq}")

    val dupMedia = Multimodal.asMedia(
      Seq((5L, "same bytes"), (9L, "same bytes"), (6L, "other"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val groups = Multimodal.payloadDupGroups(dupMedia)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((5L, 2L), (6L, 1L)),
      s"byte-identical payloads must group on the min id: $groups")
  }

  test("ExecutionLogger records success counts and sanitized failures") {
    import graft.meta.ExecutionLogger
    val dir = TempDirs.create("graftel").toString
    val ms = new MetaStore(spark, dir)
    val out = ExecutionLogger.logged(ms, "proc1", "c1",
      (r: (Long, Long, Long)) => r) { (3L, 2L, 1L) }
    assert(out == ((3L, 2L, 1L)))
    intercept[RuntimeException] {
      ExecutionLogger.logged(ms, "proc1", "c1") {
        throw new RuntimeException("bad 'quoted'\nmultiline")
      }
    }
    val rows = ms.executionLog.orderBy("execution_status").collect()
    assert(rows.length == 2)
    val failed = rows.head
    assert(failed.getAs[String]("execution_status") == "FAILED")
    assert(failed.getAs[String]("error_message") == "bad quotedmultiline")
    val ok = rows(1)
    assert(ok.getAs[Long]("records_inserted") == 3L &&
      ok.getAs[Long]("records_deleted") == 1L)
  }

  test("MetaStore watermark roundtrip and execution log append") {
    val dir = TempDirs.create("graftmeta").toString
    val ms = new MetaStore(spark, dir)
    assert(ms.lastLoadTimestamp("p1", "c1").isEmpty)
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    ms.recordLoad("p1", "c1", t1)
    ms.recordLoad("p1", "c1", t2)
    assert(ms.lastLoadTimestamp("p1", "c1").contains(t2))
    ms.appendExecutionLog(Seq(ExecutionLogRow("e1", t1, t2, "SUCCESS", "t",
      1, 2, 3, "c1", "")))
    assert(ms.executionLog.count() == 1)
  }

  test("dedupStream keeps one row per text; later-batch duplicates drop") {
    import spark.implicits._
    val dir = TempDirs.create("graftdedupstream").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq(
      (1L, "alpha doc", ts("2024-01-01 00:00:01")),
      (2L, "alpha doc", ts("2024-01-01 00:00:02")), // in-batch dup → one survives
      (3L, "beta doc", ts("2024-01-01 00:00:03"))
    ).toDF("doc_id", "text", "ts")
    b1.write.parquet(dir + "/in")
    val stream = Streams.parquetStream(spark, dir + "/in", b1.schema)
    val q = Streams.startMemorySink(
      Streams.dedupStream(stream, "text", "ts", "10 minutes"), "dedup_smoke")
    try {
      q.processAllAvailable()
      // second micro-batch: cross-batch duplicate must drop, new doc lands
      Seq((4L, "beta doc", ts("2024-01-01 00:00:04")),
          (5L, "gamma doc", ts("2024-01-01 00:00:05")))
        .toDF("doc_id", "text", "ts")
        .write.mode("append").parquet(dir + "/in")
      q.processAllAvailable()
      val out = spark.table("dedup_smoke").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      // exactly one survivor per distinct text
      assert(out.map(_._2).sorted == Seq("alpha doc", "beta doc", "gamma doc"))
      // cross-batch guarantees: beta survived from batch 1 (doc 3, not 4);
      // alpha's survivor is one of the in-batch duplicates
      assert(out.exists(_ == ((3L, "beta doc"))) && !out.exists(_._1 == 4L))
      assert(out.exists(r => (r._1 == 1L || r._1 == 2L) && r._2 == "alpha doc"))
      assert(out.exists(_ == ((5L, "gamma doc"))))
      // dedup key column does not leak into the output schema
      assert(spark.table("dedup_smoke").columns.toSeq == Seq("doc_id", "text", "ts"))
    } finally q.stop()
  }

  test("queryHistory filters by id and time, newest first, limit-N") {
    val dir = TempDirs.create("graftmeta").toString
    val ms = new MetaStore(spark, dir)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-$m%02d-01 00:00:00")
    ms.appendExecutionLog((1 to 5).map(m =>
      ExecutionLogRow(s"e$m", ts(m), ts(m), "SUCCESS", "t", 0, 0, 0, "c1", "")))
    // newest first, limited
    val top3 = ms.queryHistory(limit = 3).collect().map(_.getAs[String]("execution_id"))
    assert(top3.toSeq == Seq("e5", "e4", "e3"))
    // id filter
    val byId = ms.queryHistory(id = Some("e2")).collect()
    assert(byId.length == 1 && byId.head.getAs[String]("execution_id") == "e2")
    assert(ms.queryHistory(id = Some("nope")).isEmpty)
    // not-before bound composes with the limit
    val since = ms.queryHistory(since = Some(ts(4)), limit = 10)
      .collect().map(_.getAs[String]("execution_id"))
    assert(since.toSeq == Seq("e5", "e4"))
  }

  test("nearDupIngestStream: probe → accept → append across micro-batches") {
    import spark.implicits._
    import graft.operators.{BandIndex, Dedup}
    val dir = TempDirs.create("graftingest").toString
    val idx = dir + "/idx"
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today").toDF("doc_id", "text")
    BandIndex.save(Dedup.lshBanded(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 8, bands = 4, portable = true), idx)

    // micro-batch 1: 101 dups corpus doc 1; 103/104 dup each other (keep
    // min 103); 102 is new. micro-batch 2: 201 dups 102 — a batch-1
    // SURVIVOR, so only the append to the standing index can catch it.
    Seq(101L -> "the quick brown fox jumps over the lazy dog",
        102L -> "sphinx of black quartz judge my vow tonight",
        103L -> "jinxed wizards pluck ivy from the big quilt now",
        104L -> "jinxed wizards pluck ivy from the big quilt now")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(201L -> "sphinx of black quartz judge my vow tonight",
        202L -> "how vexingly quick daft zebras jump around")
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")

    val schema = corpus.schema
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200) { (survivors, _) =>
        accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(accepted.toList == List(Set(102L, 103L), Set(202L)),
      s"got $accepted")
    // the standing index now carries corpus + every accepted survivor
    val idxIds = BandIndex.load(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 102L, 103L, 202L))
  }

  test("sketchAccepted: streaming twin of the nightly statsSketch step") {
    import spark.implicits._
    import graft.operators.Sketches
    val dir = TempDirs.create("graftingest-sketch").toString
    val idx = dir + "/idx"
    val st = dir + "/sketches"
    // batch 0: 104 dups 103 within the batch (dropped); batch 1: 202 new
    Seq((101L, "the quick brown fox jumps over the lazy dog", "a"),
        (103L, "jinxed wizards pluck ivy from the big quilt now", "b"),
        (104L, "jinxed wizards pluck ivy from the big quilt now", "b"))
      .toDF("doc_id", "text", "src").coalesce(1).write.parquet(dir + "/in")
    Seq((202L, "how vexingly quick daft zebras jump around", "a"))
      .toDF("doc_id", "text", "src").coalesce(1).write.mode("append")
      .parquet(dir + "/in")
    val schema = Seq((0L, "", "")).toDF("doc_id", "text", "src").schema
    val spec = Sketches.SketchSpec(Seq("src"), distinctCols = Seq("doc_id"))
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200) { (survivors, batchId) =>
        Streams.sketchAccepted(survivors, spec, st, batchId); ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    def stats() = Sketches.mergedStats(spark, st, spec).orderBy("src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // only SURVIVORS sketch: the dropped intra-batch dup never counts
    assert(stats() == Seq(("a", 2L, 2L), ("b", 1L, 1L)), stats().toString)
    // an at-least-once REPLAY of batch 0 overwrites its own partition —
    // lifetime stats must not double-count
    Streams.sketchAccepted(
      Seq((101L, "the quick brown fox jumps over the lazy dog", "a"),
          (103L, "jinxed wizards pluck ivy from the big quilt now", "b"))
        .toDF("doc_id", "text", "src"), spec, st, 0L)
    assert(stats() == Seq(("a", 2L, 2L), ("b", 1L, 1L)), stats().toString)
  }

  test("bm25Accepted: streaming twin of the nightly bm25IndexPath target") {
    import spark.implicits._
    import graft.operators.{Bm25, Bm25Index}
    val dir = TempDirs.create("graftingest-bm25").toString
    val idx = dir + "/idx"
    val bm25 = dir + "/bm25"
    // batch 0: 104 dups 103 within the batch (dropped); batch 1: 202 new
    Seq(101L -> "the quick brown fox jumps over the lazy dog",
        103L -> "jinxed wizards pluck ivy from the big quilt now",
        104L -> "jinxed wizards pluck ivy from the big quilt now")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(202L -> "how vexingly quick daft zebras jump around")
      .toDF("doc_id", "text").coalesce(1).write.mode("append")
      .parquet(dir + "/in")
    val schema = Seq(0L -> "").toDF("doc_id", "text").schema
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200) { (survivors, batchId) =>
        Streams.bm25Accepted(survivors, "doc_id", "text", bm25, batchId,
          buckets = 8); ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    // the standing keyword index answers ≡ a from-scratch computation over
    // exactly the accepted survivors (the dropped dup never indexes)
    val landed = Seq(
      101L -> "the quick brown fox jumps over the lazy dog",
      103L -> "jinxed wizards pluck ivy from the big quilt now",
      202L -> "how vexingly quick daft zebras jump around")
      .toDF("doc_id", "text")
    def top(qt: Seq[String]) =
      Bm25Index.query(spark, bm25, "doc_id", qt, 10).collect().toList
    assert(top(Seq("quick", "jumps")) ===
      Bm25.search(landed, "doc_id", "text", Seq("quick", "jumps"), 10)
        .collect().toList)
    // an at-least-once REPLAY of the BOOTSTRAP batch takes the append arm
    // with the same generation key — constants must not double-count
    Streams.bm25Accepted(
      Seq(101L -> "the quick brown fox jumps over the lazy dog",
          103L -> "jinxed wizards pluck ivy from the big quilt now")
        .toDF("doc_id", "text"), "doc_id", "text", bm25, 0L, buckets = 8)
    assert(top(Seq("quick", "jumps")) ===
      Bm25.search(landed, "doc_id", "text", Seq("quick", "jumps"), 10)
        .collect().toList)
  }

  test("nearDupIngestStream bloom gate: exact dups cut per micro-batch, cross-batch via the key append") {
    import spark.implicits._
    val dir = TempDirs.create("graftingest-bloom").toString
    val (idx, bloom) = (dir + "/idx", dir + "/bloom")
    // batch 1 bootstraps BOTH indexes (11 and an exact intra dup 12);
    // batch 2 re-submits batch-1 survivor content byte-identically (21 —
    // only the bloom key append can catch it) plus near-dup content (22,
    // one appended word — the minhash path must still drop it: the gate
    // composes, not replaces) plus new content (23)
    Seq(11L -> "the quick brown fox jumps over the lazy dog",
        12L -> "the quick brown fox jumps over the lazy dog",
        13L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(21L -> "pack my box with five dozen liquor jugs today",
        22L -> "the quick brown fox jumps over the lazy dog tonight",
        23L -> "amazingly few discotheques provide jukeboxes here")
      .toDF("doc_id", "text").coalesce(1).write.mode("append")
      .parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200,
        bloomIndexPath = Some(bloom), bloomShards = 4,
        bloomBitsPerShard = 1L << 12) { (survivors, _) =>
        accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(11L, 13L), Set(23L)),
      s"got $accepted")
    // the bloom ledger holds exactly the accepted survivors' keys
    val verdict = graft.operators.BloomIndex.probe(spark, bloom,
      Seq("the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs today",
        "amazingly few discotheques provide jukeboxes here",
        "never appended content").toDF("text")
        .select(md5(col("text").cast("binary")).as("k")), "k")
    val dups = verdict.filter(col("is_dup")).count()
    assert(dups == 3L, s"three survivor keys must stand, got $dups")
  }

  test("nearDupIngestStream eval gate: contaminated micro-batch docs never land nor enter the index") {
    import spark.implicits._
    import graft.operators.BandIndex
    val dir = TempDirs.create("graftingest-eval").toString
    val idx = dir + "/idx"
    val evalPath = dir + "/eval_set"
    Seq(900L -> "alpha beta gamma delta epsilon zeta")
      .toDF("doc_id", "text").write.parquet(evalPath)
    // 11 contains the whole eval doc → gate-dropped; 12 clean; batch 2's
    // 21 near-dups 12 — the PROBE path must still fire after the gate
    Seq(11L -> "alpha beta gamma delta epsilon zeta plus trailing words",
        12L -> "pack my box with five dozen liquor jugs today")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(21L -> "pack my box with five dozen liquor jugs today",
        22L -> "how vexingly quick daft zebras jump around")
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200,
        evalSetPath = Some(evalPath), evalGateK = 3) { (survivors, _) =>
        accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(12L), Set(22L)), s"got $accepted")
    // the contaminated doc entered NEITHER the corpus (accept) NOR the index
    val idxIds = BandIndex.load(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(12L, 22L), idxIds.toString)
  }

  test("nearDupIngestStream lm gate: low-quality micro-batch docs never land nor enter the index") {
    import spark.implicits._
    import graft.operators.{BandIndex, NgramLm}
    val dir = TempDirs.create("graftingest-lm").toString
    val idx = dir + "/idx"
    val modelPath = dir + "/lm_model"
    // the train corpus covers every fluent family in the stream — an
    // out-of-domain doc scores the all-unseen ln V, same as gibberish
    val trainDocs = Seq(
      800L -> "the cat sat on the mat",
      801L -> "the cat ran on the mat",
      802L -> "sphinx of black quartz judge my vow")
      .toDF("doc_id", "text")
    NgramLm.save(spark, NgramLm.train(trainDocs, "doc_id", "text"), modelPath)
    val model = NgramLm.load(spark, modelPath)
    val fluent = "the cat sat on the mat"
    val sphinx = "sphinx of black quartz judge my vow"
    val gibberish = "zz qq ww rr tt uu"
    val ces = NgramLm.crossEntropy(
        Seq(1L -> fluent, 2L -> gibberish, 3L -> sphinx)
          .toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // batch 1: 11 fluent, 12 gibberish (gate-dropped); batch 2's 21
    // byte-identical to 11 — the PROBE path must still fire after the gate
    Seq(11L -> fluent, 12L -> gibberish)
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(21L -> fluent, 22L -> sphinx)
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200,
        lmModelPath = Some(modelPath),
        lmGateMaxCe = (math.max(ces(1L), ces(3L)) + ces(2L)) / 2) { (survivors, _) =>
        accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(11L), Set(22L)), s"got $accepted")
    // the gibberish doc entered NEITHER the corpus (accept) NOR the index
    val idxIds = BandIndex.load(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(11L, 22L), idxIds.toString)
  }

  test("nearDupIngestStream nb gate: classifier-rejected micro-batch docs never land nor enter the index") {
    import spark.implicits._
    import graft.operators.{BandIndex, NbClassifier}
    val dir = TempDirs.create("graftingest-nb").toString
    val idx = dir + "/idx"
    val modelPath = dir + "/nb_model"
    val fluent = "the cat sat on the mat with the other cat"
    val sphinx = "sphinx of black quartz judge my vow tonight ok"
    val spam = "buy cheap pills now buy cheap pills now buy cheap pills"
    NbClassifier.save(spark, NbClassifier.train(
      Seq(800L -> fluent, 801L -> sphinx).toDF("doc_id", "text"),
      Seq(802L -> spam).toDF("doc_id", "text"), "doc_id", "text"), modelPath)
    val model = NbClassifier.load(spark, modelPath)
    // batch 1: 11 fluent, 12 spam (gate-dropped); batch 2's 21 is
    // byte-identical to 11 — the PROBE path must still fire after the gate
    val batch = Seq(11L -> fluent, 12L -> spam, 21L -> fluent, 22L -> sphinx)
      .toDF("doc_id", "text")
    val flaggedIds = NbClassifier.paretoGate(batch, "doc_id", "text", model)
      ._2.select("doc_id").as[Long].collect().toSet
    assert(flaggedIds == Set(12L), flaggedIds.toString)
    Seq(11L -> fluent, 12L -> spam)
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    Seq(21L -> fluent, 22L -> sphinx)
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", idx, maxBucket = 200,
        nbModelPath = Some(modelPath)) { (survivors, _) =>
        accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(11L), Set(22L)), s"got $accepted")
    // the spam doc entered NEITHER the corpus (accept) NOR the index
    val idxIds = BandIndex.load(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(11L, 22L), idxIds.toString)
  }

  test("nearDupIngestStream spanDedupK: batch boilerplate cut before hashing and accept") {
    import spark.implicits._
    val dir = TempDirs.create("graftingest-spans").toString
    // 11 and 12 share a 7-token boilerplate prefix (k = 6 → two duplicated
    // windows); 11 wins, 12 must be ACCEPTED with cleaned text — the probe
    // hashes the cleaned batch, so the pair never near-dup-drops
    Seq(11L -> "subscribe to our channel like and share alpha beta gamma delta",
        12L -> "subscribe to our channel like and share epsilon zeta eta theta")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Map[Long, String]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", dir + "/idx", maxBucket = 200,
        spanDedupK = Some(6)) { (survivors, _) =>
        accepted += survivors.select("doc_id", "text").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.size == 1 && accepted.head.keySet == Set(11L, 12L),
      accepted.toString)
    assert(accepted.head(11L) ==
      "subscribe to our channel like and share alpha beta gamma delta")
    assert(accepted.head(12L) == "epsilon zeta eta theta", accepted.head(12L))
  }

  test("nearDupIngestStream spanDedupPacked=false: ids >= 2^39 complete via the three-pass keeper") {
    import spark.implicits._
    val dir = TempDirs.create("graftingest-spans-bigid").toString
    val big = 1L << 39 // outside the packed keeper's id domain
    Seq(big + 11 -> "subscribe to our channel like and share alpha beta gamma delta",
        big + 12 -> "subscribe to our channel like and share epsilon zeta eta theta")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Map[Long, String]]
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "text", dir + "/idx", maxBucket = 200,
        spanDedupK = Some(6), spanDedupPacked = false) { (survivors, _) =>
        accepted += survivors.select("doc_id", "text").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.size == 1 &&
      accepted.head.keySet == Set(big + 11, big + 12), accepted.toString)
    assert(accepted.head(big + 12) == "epsilon zeta eta theta",
      "the fallback keeper must land the identical cleaned text")
  }

  test("nearDupIngestStream: a retraction between batches re-admits identical content") {
    import spark.implicits._
    import graft.operators.{BandIndex, Dedup}
    val dir = TempDirs.create("graftingestretract").toString
    val idx = dir + "/idx"
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today").toDF("doc_id", "text")
    BandIndex.save(Dedup.lshBanded(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 8, bands = 4, portable = true), idx)
    val schema = corpus.schema
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def drain(): Unit = {
      val q = Streams.nearDupIngestStream(
          Streams.parquetStream(spark, dir + "/in", schema),
          "doc_id", "text", idx, maxBucket = 200) { (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
        }
        .option("checkpointLocation", dir + "/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: an exact copy of standing doc 1 — dropped against the index
    Seq(301L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    drain()
    assert(accepted.toList == List(Set.empty[Long]), s"got $accepted")
    // TAKEDOWN between batches: doc 1 leaves the standing index (tombstone
    // now; probes subtract immediately — no vacuum needed for correctness)
    BandIndex.removeIds(spark, idx, Seq(1L).toDF("doc_id"))
    // batch 2: the SAME content again — the phantom is gone, so the
    // stream's probe must accept it and append it as the new standing copy
    Seq(302L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")
    drain()
    assert(accepted.toList == List(Set.empty[Long], Set(302L)),
      s"retracted content must re-admit: $accepted")
    // and a THIRD copy now drops against the re-admitted standing copy
    Seq(303L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir + "/in")
    drain()
    assert(accepted.last == Set.empty[Long], s"got $accepted")
  }

  test("nearDupIngestStream replay redelivers the same survivors (at-least-once)") {
    import spark.implicits._
    import graft.operators.{BandIndex, Dedup}
    val dir = TempDirs.create("graftreplay").toString
    val idx = dir + "/idx"
    val corpus = Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    BandIndex.save(Dedup.lshBanded(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 8, bands = 4, portable = true), idx)
    // one batch: 101 dups corpus 1; 102 new; 103/104 intra-dup (keep 103)
    Seq(101L -> "the quick brown fox jumps over the lazy dog",
        102L -> "sphinx of black quartz judge my vow tonight",
        103L -> "jinxed wizards pluck ivy from the big quilt now",
        104L -> "jinxed wizards pluck ivy from the big quilt now")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir + "/in")
    def runOnce(ckpt: String): Set[Long] = {
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = Streams.nearDupIngestStream(
          Streams.parquetStream(spark, dir + "/in", corpus.schema),
          "doc_id", "text", idx, maxBucket = 200) { (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      accepted.toList.reduce(_ ++ _)
    }
    val first = runOnce(dir + "/ckpt1")
    assert(first == Set(102L, 103L), s"got $first")
    // crash-replay: the batch's banded rows are already IN the index (the
    // append ran) but the sink offset never committed — a fresh checkpoint
    // reprocesses the same input. The survivors must be redelivered; before
    // the excludeIds fix, 104's pair with 103's appended index rows put the
    // kept survivor 103 in the drop set and its delivery was lost.
    val replayed = runOnce(dir + "/ckpt2")
    assert(replayed == first,
      s"replay must redeliver the same survivors: $replayed vs $first")
    // the index still holds exactly corpus + survivors (duplicate ROWS are
    // allowed — documented at-least-once litter — but no new ids)
    val idxIds = BandIndex.load(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 102L, 103L))

    // same crash-replay contract with the bloom gate ON: the first run's
    // key append is already standing, and the gate's verify-side exclusion
    // of the batch's own ids must keep the redelivery from self-dropping
    val dir2 = TempDirs.create("graftreplay-bloom").toString
    Seq(101L -> "the quick brown fox jumps over the lazy dog",
        102L -> "sphinx of black quartz judge my vow tonight",
        103L -> "jinxed wizards pluck ivy from the big quilt now",
        104L -> "jinxed wizards pluck ivy from the big quilt now")
      .toDF("doc_id", "text").coalesce(1).write.parquet(dir2 + "/in")
    def runGated(ckpt: String): Set[Long] = {
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = Streams.nearDupIngestStream(
          Streams.parquetStream(spark, dir2 + "/in", corpus.schema),
          "doc_id", "text", dir2 + "/idx", maxBucket = 200,
          bloomIndexPath = Some(dir2 + "/bloom"), bloomShards = 4,
          bloomBitsPerShard = 1L << 12) { (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      accepted.toList.reduce(_ ++ _)
    }
    val gatedFirst = runGated(dir2 + "/ckpt1")
    assert(gatedFirst == Set(101L, 102L, 103L), s"got $gatedFirst")
    val gatedReplay = runGated(dir2 + "/ckpt2")
    assert(gatedReplay == gatedFirst,
      s"gated replay must redeliver the same survivors: $gatedReplay vs $gatedFirst")
  }

  test("nearDupIngestStream fails fast on hash-parameter drift") {
    import spark.implicits._
    import graft.operators.{BandIndex, Dedup}
    val dir = TempDirs.create("graftdrift").toString
    val idx = dir + "/idx"
    val corpus = Seq(1L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    // index built with portable=FALSE hashing, recorded in the marker
    BandIndex.save(
      Dedup.lshBanded(corpus, "doc_id", "text",
        shingleK = 3, numHashes = 8, bands = 4, portable = false),
      idx, hashParams = Map("kind" -> "minhash", "shingleK" -> "3",
        "numHashes" -> "8", "bands" -> "4", "portable" -> "false"))
    Seq(2L -> "some new document").toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir + "/in")
    // the stream hashes portable=TRUE — different hash family; without the
    // marker this would silently miss every duplicate forever
    val q = Streams.nearDupIngestStream(
        Streams.parquetStream(spark, dir + "/in", corpus.schema),
        "doc_id", "text", idx, maxBucket = 200, portable = true) { (_, _) => () }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("hash parameters")),
      s"expected the drift error, got: ${chain(e).mkString(" | ")}")
  }

  // ------------------------------------------------- ANN streaming ingest

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("annIngestStream: probe → accept → append across micro-batches") {
    import spark.implicits._
    import graft.operators.IvfIndex
    val dir = TempDirs.create("graftanning").toString
    val idx = dir + "/idx"
    val corpus = Seq(
      1L -> vec(1, 0, 0, 0),
      2L -> vec(0, 1, 0, 0)).toDF("doc_id", "embedding")
    IvfIndex.save(corpus, "doc_id", "embedding", idx, numCentroids = 2)
    // batch 1: 101 dups corpus 1 (identical vector); 102 new; 103/104 dup
    // each other (keep min 103). batch 2: 201 dups 102 — a batch-1
    // SURVIVOR, only the index append can catch it; 202 is far from all.
    Seq(101L -> vec(1, 0, 0, 0), 102L -> vec(0, 0, 1, 0),
        103L -> vec(0, 0, 0, 1), 104L -> vec(0, 0, 0, 1))
      .toDF("doc_id", "embedding").coalesce(1).write.parquet(dir + "/in")
    Seq(201L -> vec(0, 0, 1, 0), 202L -> vec(0.5, 0.5, 0.5, 0.5))
      .toDF("doc_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir + "/in")
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.annIngestStream(
        Streams.parquetStream(spark, dir + "/in", corpus.schema),
        "doc_id", "embedding", idx, threshold = 0.9, nprobe = 2) {
        (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(102L, 103L), Set(202L)),
      s"got $accepted")
    val idxIds = IvfIndex.loadCells(spark, idx)
      .select("neighbor_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 102L, 103L, 202L))
  }

  test("annIngestStream replay redelivers the same survivors (at-least-once)") {
    import spark.implicits._
    import graft.operators.IvfIndex
    val dir = TempDirs.create("graftannreplay").toString
    val idx = dir + "/idx"
    val corpus = Seq(1L -> vec(1, 0, 0, 0)).toDF("doc_id", "embedding")
    IvfIndex.save(corpus, "doc_id", "embedding", idx, numCentroids = 1)
    // 101 dups corpus 1; 102 new; 103/104 intra-dup (keep 103)
    Seq(101L -> vec(1, 0, 0, 0), 102L -> vec(0, 0, 1, 0),
        103L -> vec(0, 0, 0, 1), 104L -> vec(0, 0, 0, 1))
      .toDF("doc_id", "embedding").coalesce(1).write.parquet(dir + "/in")
    def runOnce(ckpt: String): Set[Long] = {
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = Streams.annIngestStream(
          Streams.parquetStream(spark, dir + "/in", corpus.schema),
          "doc_id", "embedding", idx, threshold = 0.9, nprobe = 1) {
          (survivors, _) =>
            accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      accepted.toList.reduce(_ ++ _)
    }
    val first = runOnce(dir + "/ckpt1")
    assert(first == Set(102L, 103L), s"got $first")
    // crash-replay: the appends landed but the sink offset never committed;
    // a fresh checkpoint reprocesses the same batch. Without excludeIds the
    // batch docs would pair with their OWN appended rows and every
    // previously-accepted survivor's delivery would be lost.
    val replayed = runOnce(dir + "/ckpt2")
    assert(replayed == first,
      s"replay must redeliver the same survivors: $replayed vs $first")
    val idxIds = IvfIndex.loadCells(spark, idx)
      .select("neighbor_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 102L, 103L))
  }

  test("ivfPqIngestStream: probe → accept → append across micro-batches on the composed index") {
    import spark.implicits._
    import graft.operators.IvfPqIndex
    val dir = TempDirs.create("graftivfpqing").toString
    val idx = dir + "/idx"
    // one seed per axis, so the bootstrap codebooks can represent every
    // direction the batches use (an ADC index trained on 2 basis vectors
    // cannot score dims it never saw)
    val corpus = Seq(1L -> vec(1, 0, 0, 0), 2L -> vec(0, 1, 0, 0),
      3L -> vec(0, 0, 1, 0), 4L -> vec(0, 0, 0, 1)).toDF("doc_id", "embedding")
    IvfPqIndex.save(corpus, "doc_id", "embedding", idx,
      numCells = 2, m = 4, ksub = 4)
    // batch 1: 101 dups corpus 1 (ADC score 1.0); 102 is nobody's match
    // (best ADC 0.8 < threshold); 103/104 dup each other (exact intra
    // pairwise, keep min 103). batch 2: 201 dups 103 — a batch-1 SURVIVOR,
    // only the index append can catch it; 202 is far from everything.
    Seq(101L -> vec(1, 0, 0, 0), 102L -> vec(0.8, -0.6, 0, 0),
        103L -> vec(0.6, 0.8, 0, 0), 104L -> vec(0.6, 0.8, 0, 0))
      .toDF("doc_id", "embedding").coalesce(1).write.parquet(dir + "/in")
    Seq(201L -> vec(0.6, 0.8, 0, 0), 202L -> vec(0, 0, 0.6, -0.8))
      .toDF("doc_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir + "/in")
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.ivfPqIngestStream(
        Streams.parquetStream(spark, dir + "/in", corpus.schema),
        "doc_id", "embedding", idx, threshold = 0.93, nprobe = 2) {
        (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(102L, 103L), Set(202L)),
      s"got $accepted")
    val idxIds = IvfPqIndex.loadCells(spark, idx)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 3L, 4L, 102L, 103L, 202L))
  }

  test("ivfPqIngestStream replay redelivers the same survivors (at-least-once)") {
    import spark.implicits._
    import graft.operators.IvfPqIndex
    val dir = TempDirs.create("graftivfpqreplay").toString
    val idx = dir + "/idx"
    val corpus = Seq(1L -> vec(1, 0, 0, 0), 2L -> vec(0, 1, 0, 0),
      3L -> vec(0, 0, 1, 0), 4L -> vec(0, 0, 0, 1)).toDF("doc_id", "embedding")
    IvfPqIndex.save(corpus, "doc_id", "embedding", idx,
      numCells = 2, m = 4, ksub = 4)
    Seq(101L -> vec(1, 0, 0, 0), 102L -> vec(0.8, -0.6, 0, 0),
        103L -> vec(0.6, 0.8, 0, 0), 104L -> vec(0.6, 0.8, 0, 0))
      .toDF("doc_id", "embedding").coalesce(1).write.parquet(dir + "/in")
    def runOnce(ckpt: String): Set[Long] = {
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = Streams.ivfPqIngestStream(
          Streams.parquetStream(spark, dir + "/in", corpus.schema),
          "doc_id", "embedding", idx, threshold = 0.93, nprobe = 2) {
          (survivors, _) =>
            accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      accepted.toList.reduce(_ ++ _)
    }
    val first = runOnce(dir + "/ckpt1")
    assert(first == Set(102L, 103L), s"got $first")
    // crash-replay: appends landed, sink offset never committed; a fresh
    // checkpoint reprocesses the batch. Without excludeIds the batch docs
    // would pair with their OWN appended code rows and drop.
    val replayed = runOnce(dir + "/ckpt2")
    assert(replayed == first,
      s"replay must redeliver the same survivors: $replayed vs $first")
    val idxIds = IvfPqIndex.loadCells(spark, idx)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 3L, 4L, 102L, 103L))
  }

  test("annIngestStream bootstraps from the first batch, then fails fast on dim drift") {
    import spark.implicits._
    import graft.operators.IvfIndex
    val dir = TempDirs.create("graftannboot").toString
    val idx = dir + "/idx"
    val schema = Seq(1L -> vec(1, 0, 0, 0)).toDF("doc_id", "embedding").schema
    Seq(11L -> vec(1, 0, 0, 0), 12L -> vec(0, 1, 0, 0))
      .toDF("doc_id", "embedding").coalesce(1).write.parquet(dir + "/in")
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Streams.annIngestStream(
        Streams.parquetStream(spark, dir + "/in", schema),
        "doc_id", "embedding", idx, threshold = 0.9, numCentroids = 2) {
        (survivors, _) =>
          accepted += survivors.select("doc_id").as[Long].collect().toSet; ()
      }
      .option("checkpointLocation", dir + "/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    assert(accepted.toList == List(Set(11L, 12L)))
    assert(IndexMetaReadable(idx)) // geometry marker recorded at bootstrap
    // a 3-dim batch against the 4-dim index must fail fast, not mis-rank
    Seq(21L -> vec(1, 0, 0)).toDF("doc_id", "embedding")
      .coalesce(1).write.parquet(dir + "/in2")
    val q2 = Streams.annIngestStream(
        Streams.parquetStream(spark, dir + "/in2",
          Seq(1L -> vec(1, 0, 0)).toDF("doc_id", "embedding").schema),
        "doc_id", "embedding", idx, threshold = 0.9) { (_, _) => () }
      .option("checkpointLocation", dir + "/ckpt2").start()
    val e = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("dimensions")),
      s"expected the dim-drift error, got: ${chain(e).mkString(" | ")}")
  }

  // IndexMeta is private[operators]; the marker file on disk is the
  // observable contract (underscore-hidden JSON next to the index data)
  private def IndexMetaReadable(idx: String): Boolean = {
    val f = java.nio.file.Paths.get(idx, "_graft_index_meta.json")
    java.nio.file.Files.exists(f) &&
      java.nio.file.Files.readString(f).contains("dims")
  }
}
