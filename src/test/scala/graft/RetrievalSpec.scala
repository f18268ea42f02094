package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bm25, Bm25Index}

/**
 * BM25 retrieval: the score algebra against a hand-computed fixture, the
 * persisted index path against the in-memory frame path, and the scale
 * property that matters — a query's scan prunes to its own terms' bucket
 * directories.
 */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 3 scoreable docs; doc 4 is whitespace-only and must not count toward
  // N or avgdl, nor ever score
  private val corpus = docs(
    1L -> "spark shuffle spark join",
    2L -> "spark window",
    3L -> "merge sort batch stream scan scan",
    4L -> "   ")

  /** Okapi BM25 with Lucene idf, straight from the definition. */
  private def bm25(tf: Long, df: Long, dl: Double, n: Double, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("scores match the hand-computed definition; empty docs don't count") {
    val res = Bm25.search(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toList
    // n = 3 docs with tokens, avgdl = (4 + 2 + 6) / 3 = 4.0, df(spark) = 2
    val exp1 = BigDecimal(bm25(tf = 2, df = 2, dl = 4.0, n = 3, avgdl = 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(bm25(tf = 1, df = 2, dl = 2.0, n = 3, avgdl = 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res === List(1L -> exp1, 2L -> exp2))
  }

  test("multi-term query sums per-term contributions; unknown terms add 0") {
    val both = Bm25.search(corpus, "doc_id", "text",
      Seq("spark", "window", "nosuchterm"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sparkOnly = Bm25.search(corpus, "doc_id", "text", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val windowOnly = Bm25.search(corpus, "doc_id", "text", Seq("window"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2 holds both terms: its combined score is the sum of the
    // single-term scores (within the 6-dp rounding of each side)
    assert(math.abs(both(2L) - (sparkOnly(2L) + windowOnly(2L))) < 2e-6)
    assert(both(1L) === sparkOnly(1L)) // no window/nosuchterm in doc 1
    assert(!both.contains(3L) && !both.contains(4L))
  }

  test("query made only of absent terms returns no rows") {
    assert(Bm25.search(corpus, "doc_id", "text", Seq("zzz"), 5).count() === 0)
  }

  test("duplicate docs tie on score and order by id; k truncates") {
    val dup = docs(1L -> "alpha beta", 2L -> "alpha beta", 3L -> "alpha")
    val r = Bm25.topK(Bm25.postings(dup, "doc_id", "text"),
      Bm25.corpusStats(dup, "text"), "doc_id", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0)).toList
    // doc 3 (shorter) scores highest; the two dups tie, id 1 wins the cut
    assert(r === List(3L, 1L))
  }

  test("persisted index equals the frame path and prunes to query buckets") {
    val path = TempDirs.create("graft-bm25").resolve("idx").toString
    Bm25Index.save(corpus, "doc_id", "text", path, buckets = 8)
    val q = Seq("spark", "window")
    val fromIndex = Bm25Index.query(spark, path, "doc_id", q, k = 10)
    val fromFrames = Bm25.search(corpus, "doc_id", "text", q, k = 10)
    assert(fromIndex.collect().toList === fromFrames.collect().toList)

    // scale property: the postings scan must carry a tb partition filter —
    // pruned directories, not a full-index read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      s"expected tb partition pruning in:\n$plan")
    // and the wanted buckets are a strict subset of the 8 written
    val dirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName).toSet
    assert(dirs.size > 2, "fixture should spread terms over several buckets")
  }

  test("lifecycle: append extends, retraction hides immediately, vacuum " +
      "is physical and restores exact constants") {
    import spark.implicits._
    val path = TempDirs.create("graft-bm25-life").resolve("idx").toString
    val c1 = docs(1L -> "spark shuffle join", 2L -> "merge sort batch")
    val c2 = docs(3L -> "spark spark window", 4L -> "scan filter project")
    Bm25Index.save(c1, "doc_id", "text", path, buckets = 8)
    Bm25Index.append(c2, "doc_id", "text", path, gen = "n1")
    val union = c1.union(c2)
    val q = Seq("spark", "window")
    // appended index ≡ a from-scratch frame computation over the union —
    // stats generations sum additively, df comes off the live postings
    assert(Bm25Index.query(spark, path, "doc_id", q, 10).collect().toList ===
      Bm25.search(union, "doc_id", "text", q, 10).collect().toList)

    // crash-replay: re-appending the SAME generation must not change any
    // score — the stats generation replaces itself and the duplicated
    // posting rows collapse in the query's candidate distinct
    Bm25Index.append(c2, "doc_id", "text", path, gen = "n1")
    assert(Bm25Index.query(spark, path, "doc_id", q, 10).collect().toList ===
      Bm25.search(union, "doc_id", "text", q, 10).collect().toList)

    // retraction: doc 3 must vanish from results IMMEDIATELY (tombstone
    // subtraction), before any physical rewrite
    Bm25Index.removeIds(spark, path, Seq(3L).toDF("doc_id"))
    val afterRetract = Bm25Index.query(spark, path, "doc_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(!afterRetract.contains(3L) && afterRetract.contains(1L))

    // vacuum: physical removal + exact constants — the index must now
    // equal a from-scratch computation over the survivors
    val removed = Bm25Index.vacuum(spark, path, "doc_id")
    assert(removed > 0)
    val survivors = union.filter(col("doc_id") =!= 3L)
    assert(Bm25Index.query(spark, path, "doc_id", q, 10).collect().toList ===
      Bm25.search(survivors, "doc_id", "text", q, 10).collect().toList)
    // the generation files folded to one exact stats row
    assert(spark.read.parquet(s"$path/stats").count() === 1)
    // idempotent re-vacuum is a no-op
    assert(Bm25Index.vacuum(spark, path, "doc_id") === 0L)
  }

  test("stats 1-row frame carries n/avgdl over non-empty docs only") {
    val st = Bm25.corpusStats(corpus, "text").collect()(0)
    assert(st.getDouble(0) === 3.0 && st.getDouble(1) === 4.0)
  }

  test("compact folds replay litter physically; queries unchanged; clean buckets untouched") {
    val path = TempDirs.create("graft-bm25-compact").resolve("idx").toString
    val c1 = docs(1L -> "spark shuffle join", 2L -> "merge sort batch")
    val c2 = docs(3L -> "spark spark window", 4L -> "scan filter project")
    Bm25Index.save(c1, "doc_id", "text", path, buckets = 8)
    Bm25Index.append(c2, "doc_id", "text", path, gen = "n1")
    val clean = spark.read.parquet(s"$path/postings").count()
    val q = Seq("spark", "window")
    val before = Bm25Index.query(spark, path, "doc_id", q, 10).collect().toList

    // a crash-replayed night: the same generation appends again —
    // byte-identical posting rows duplicate in storage
    Bm25Index.append(c2, "doc_id", "text", path, gen = "n1")
    val littered = spark.read.parquet(s"$path/postings").count()
    assert(littered > clean, "replay must have duplicated posting rows")

    // which bucket dirs the replay touched vs not (c2's terms' buckets)
    def dirSnapshot(): Map[String, Long] =
      new java.io.File(s"$path/postings").listFiles()
        .filter(_.getName.startsWith("tb=")).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName.hashCode.toLong + f.length() + f.lastModified())
            .sum
        }.toMap
    val preCompact = dirSnapshot()

    val folded = Bm25Index.compact(spark, path, "doc_id")
    assert(folded === littered - clean, s"folded $folded of ${littered - clean}")
    // storage row count is back to the dedup'd count
    assert(spark.read.parquet(s"$path/postings").count() === clean)
    // queries unchanged (they collapsed the litter already; now it's gone)
    assert(Bm25Index.query(spark, path, "doc_id", q, 10).collect().toList
      === before)
    // buckets holding no litter were not rewritten (byte-untouched files)
    val postCompact = dirSnapshot()
    val dupBuckets = preCompact.keySet.filter(k =>
      postCompact.get(k) != preCompact.get(k))
    assert(dupBuckets.nonEmpty, "compact must have rewritten the touched buckets")
    assert(dupBuckets != preCompact.keySet,
      "compact must leave litter-free buckets byte-untouched")
    // idempotent: a second compact finds nothing
    assert(Bm25Index.compact(spark, path, "doc_id") === 0L)
  }

  test("ranked structurally bounds an unbounded frame — no corpus-wide single-partition sort") {
    import spark.implicits._
    import graft.operators.Fusion
    // a deliberately-unbounded scored frame (no top-k upstream)
    val scored = spark.range(0, 5000)
      .select(col("id").as("doc_id"), (col("id") % 97).cast("double").as("score"))
    val r = Fusion.ranked(scored, "doc_id", "score", bound = 50)
    val rows = r.collect()
    // the guard cuts to the bound BEFORE the one-partition window
    assert(rows.length === 50)
    // ranks agree with the unbounded total order's first 50: score desc
    // (rounded), then id — 96.0 docs first (ids 96, 193, ...)
    assert(rows.head.getLong(0) === 96L && rows.head.getInt(1) === 1)
    assert(rows.map(_.getInt(1)).toList === (1 to 50).toList)
    // the cut compiles to TakeOrderedAndProject (per-partition heap +
    // driver merge), never a global Sort of the full frame
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    // default bound applies when the caller says nothing
    assert(Fusion.ranked(scored, "doc_id", "score").count()
      === math.min(5000, Fusion.RankedDefaultBound))
    intercept[IllegalArgumentException] {
      Fusion.ranked(scored, "doc_id", "score", bound = 0)
    }
  }

  test("hybrid fusion takes a third IVFPQ arm; two-arm behavior unchanged") {
    import spark.implicits._
    import graft.operators.{Fusion, IvfIndex, IvfPqIndex}
    val root = TempDirs.create("graft-hybrid3")
    val bm25Path = root.resolve("bm25").toString
    val ivfPath = root.resolve("ivf").toString
    val pqPath = root.resolve("ivfpq").toString
    val texts = docs(
      1L -> "spark shuffle spark join",
      2L -> "spark window frame",
      3L -> "merge sort batch stream",
      4L -> "scan filter project spark")
    // 4-dim vectors so m=2 divides dims; one cell → probes cover the index
    val vecs = Seq(
      1L -> Array(1.0f, 0.1f, 0.0f, 0.0f),
      2L -> Array(0.9f, 0.2f, 0.1f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.9f, 0.1f),
      4L -> Array(0.2f, 0.8f, 1.0f, 0.0f)).toDF("doc_id", "embedding")
    Bm25Index.save(texts, "doc_id", "text", bm25Path, buckets = 8)
    IvfIndex.save(vecs, "doc_id", "embedding", ivfPath, numCentroids = 1)
    IvfPqIndex.save(vecs, "doc_id", "embedding", pqPath,
      numCells = 1, m = 2, ksub = 4)
    val qVec = Array(1.0f, 0.15f, 0.05f, 0.0f)
    val terms = Seq("spark", "window")

    val threeArm = Fusion.hybridTopK(spark, bm25Path, ivfPath, "doc_id",
        terms, qVec, kPerArm = 3, topK = 4, ivfPqPath = Some(pqPath))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList

    // expected: the two standing arms plus a separately-computed PQ arm,
    // fused by the same RRF
    val lex = Fusion.ranked(
      Bm25Index.query(spark, bm25Path, "doc_id", terms, 3), "doc_id", "score")
    val q = Seq((-1L, qVec)).toDF("__hq_id", "__hq_vec")
    val dense = IvfIndex.probe(spark, ivfPath, q, "__hq_id", "__hq_vec", 3)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    val pq = IvfPqIndex.probe(spark, pqPath, q, "__hq_id", "__hq_vec",
        candidates = 3)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    val expected = Fusion.rrf(Seq(lex, dense, pq), "doc_id", topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(threeArm === expected)
    // every fused doc carries up to 3 arm votes now
    assert(threeArm.map(_._3).max === 3L)
    // and the 2-arm call (no path) is byte-identical to the pre-overload shape
    val twoArm = Fusion.hybridTopK(spark, bm25Path, ivfPath, "doc_id",
        terms, qVec, kPerArm = 3, topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(twoArm.map(_._3).max === 2L)
  }

  test("persisted hybrid RRF equals the frame-arm fusion, both arms index-pruned") {
    import spark.implicits._
    import graft.operators.{Fusion, IvfIndex, Similarity}
    val root = TempDirs.create("graft-hybrid")
    val bm25Path = root.resolve("bm25").toString
    val ivfPath = root.resolve("ivf").toString
    // one id space: text and an embedding per doc (the documents ↔
    // embeddings contract); embeddings separate ids deliberately
    val texts = docs(
      1L -> "spark shuffle spark join",
      2L -> "spark window frame",
      3L -> "merge sort batch stream",
      4L -> "scan filter project spark")
    val vecs = Seq(
      1L -> Array(1.0f, 0.1f, 0.0f),
      2L -> Array(0.9f, 0.2f, 0.1f),
      3L -> Array(0.0f, 1.0f, 0.9f),
      4L -> Array(0.2f, 0.8f, 1.0f)).toDF("doc_id", "embedding")
    Bm25Index.save(texts, "doc_id", "text", bm25Path, buckets = 8)
    // one centroid: every probe covers the whole index, so the dense arm
    // must equal brute force and the equivalence below is exact
    IvfIndex.save(vecs, "doc_id", "embedding", ivfPath, numCentroids = 1)
    val qVec = Array(1.0f, 0.15f, 0.05f)
    val terms = Seq("spark", "window")

    val hybrid = Fusion.hybridTopK(spark, bm25Path, ivfPath, "doc_id",
        terms, qVec, kPerArm = 3, topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList

    val lexArm = Fusion.ranked(
      Bm25.search(texts, "doc_id", "text", terms, k = 3), "doc_id", "score")
    val denseArm = Similarity.bruteForceTopK(
        Seq(-1L -> qVec).toDF("doc_id", "embedding"), vecs,
        "doc_id", "doc_id", "embedding", "embedding", k = 3)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    val expected = Fusion.rrf(Seq(lexArm, denseArm), "doc_id", topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(hybrid === expected)
    // docs in both arms outrank single-arm docs at equal ranks
    assert(hybrid.head._3 === 2L)
  }
}
