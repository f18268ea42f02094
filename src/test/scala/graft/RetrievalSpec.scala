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
