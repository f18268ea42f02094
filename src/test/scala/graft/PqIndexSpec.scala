package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PqIndex, Similarity}

class PqIndexSpec extends AnyFunSuite with SparkSpec {

  /** Deterministic clustered corpus: `n` vectors of `dims` dims in four
    * quadrant-ish clusters keyed by id — near neighbors share a cluster, so
    * ADC ranking has real structure to find. */
  private def corpus(n: Int, dims: Int = 8): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 4
      val base = Array.tabulate(dims) { d =>
        val centre = if ((c >> (d % 2)) % 2 == 0) 1.0f else -1.0f
        centre + 0.05f * (((i * 31 + d * 7) % 11) - 5)
      }
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def newPath(): String =
    TempDirs.create("graft-pq").resolve("idx").toString

  // --------------------------------------------------------------- training

  test("trainCodebooks: dense codes 0..ksub-1 in every subspace") {
    val books = PqIndex.trainCodebooks(corpus(64), "vec_id", "embedding",
      m = 4, ksub = 4, iterations = 2)
    val bySub = books.collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) => s -> rows.map(_.getInt(1)).sorted.toSeq }
    assert(bySub.keySet == Set(0, 1, 2, 3))
    bySub.values.foreach(codes => assert(codes == Seq(0, 1, 2, 3)))
    // codewords carry dsub = 8/4 = 2 dims
    assert(books.select(size(col("cvec"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(2))
  }

  test("trainCodebooks: rejects m not dividing dims") {
    intercept[IllegalArgumentException] {
      PqIndex.trainCodebooks(corpus(16), "vec_id", "embedding", m = 3, ksub = 2)
    }
  }

  // ------------------------------------------------------------ save/probe

  test("save records geometry; codes are m ints within [0, ksub)") {
    val path = newPath()
    PqIndex.save(corpus(64), "vec_id", "embedding", path, m = 4, ksub = 4)
    val meta = PqIndex.readParams(spark, path)
    assert(meta("kind") == "pq" && meta("dims") == "8" && meta("m") == "4"
      && meta("ksub") == "4" && meta("scheme") == PqIndex.SchemeVersion)
    val codes = PqIndex.loadCodes(spark, path).collect()
    assert(codes.length == 64)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 4))
    }
  }

  test("ADC scores match a driver-side reference computation") {
    val path = newPath()
    val c = corpus(32)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    val q = c.filter(col("vec_id") === 3)
    val got = PqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 31)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // reference: unit-normalize in Scala, look up each stored code's word
    val books = PqIndex.loadCodebooks(spark, path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val vecs = c.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val codes = PqIndex.loadCodes(spark, path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qn = unit(vecs(3L))
    got.foreach { case (nid, score) =>
      val expected = codes(nid).zipWithIndex.map { case (code, s) =>
        val cw = books((s, code))
        qn.slice(s * 2, s * 2 + 2).zip(cw).map { case (a, b) => a * b }.sum
      }.sum
      assert(math.abs(score - expected) < 1e-9,
        s"neighbor $nid: got $score, expected $expected")
    }
    assert(got.size == 31 && !got.contains(3L)) // self excluded
  }

  test("probe + exact re-rank over ALL candidates equals brute force") {
    val path = newPath()
    val c = corpus(60)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    val q = c.filter(col("vec_id") < 3)
    val got = PqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 60, rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("narrow candidate budget still recalls most true neighbors") {
    val path = newPath()
    val c = corpus(200)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 8)
    val q = c.filter(col("vec_id") < 4)
    val truth = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = PqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 30, rerank = Some((c, "vec_id", "embedding")), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall@10 with 30/200 candidates = $recall")
  }

  test("append: new vectors are probe-able; drift guards fail fast") {
    import spark.implicits._
    val path = newPath()
    val c = corpus(40)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    // append an exact copy of vector 5 under a new id → after exact
    // re-rank it must come first for query 5 (cosine exactly 1). The ADC
    // candidate budget covers the corpus: with 4×4 codebooks the twin's
    // codes tie with its whole cluster and the id tie-break would
    // otherwise cut the HIGH id out of a narrow candidate set
    val twin = c.filter(col("vec_id") === 5)
      .select(lit(1005L).as("vec_id"), col("embedding"))
    PqIndex.append(twin, "vec_id", "embedding", path)
    val top = PqIndex.probe(spark, path, c.filter(col("vec_id") === 5),
        "vec_id", "embedding", candidates = 41,
        rerank = Some((c.unionByName(twin), "vec_id", "embedding")), k = 1)
      .collect()
    assert(top.head.getLong(1) == 1005L && top.head.getDouble(3) > 0.999999)
    // dim drift: 6-dim batch against the 8-dim index
    val drifted = Seq((9000L, Seq.fill(6)(0.5f))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalStateException] {
      PqIndex.append(drifted, "vec_id", "embedding", path)
    }
    assert(e1.getMessage.contains("8-dim"))
    val e2 = intercept[IllegalStateException] {
      PqIndex.probe(spark, path, drifted, "vec_id", "embedding", 5)
    }
    assert(e2.getMessage.contains("dims"))
  }

  test("zero-norm vectors: dropped at save, no candidates as queries") {
    import spark.implicits._
    val zero = Seq((100L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val path = newPath()
    PqIndex.save(corpus(16).unionByName(zero), "vec_id", "embedding", path,
      m = 4, ksub = 4)
    assert(PqIndex.loadCodes(spark, path).filter(col("vec_id") === 100).count() == 0)
    assert(PqIndex.probe(spark, path, zero, "vec_id", "embedding", 5).count() == 0)
  }

  test("trainFraction below the 1% hash granularity floors to one bucket") {
    val path = newPath()
    // 0.001 used to round its bucket threshold to 0 — an empty training set
    // surfacing as "cannot infer vector dims" on a non-empty corpus
    PqIndex.save(corpus(64), "vec_id", "embedding", path, m = 4, ksub = 4,
      trainFraction = 0.001)
    assert(PqIndex.loadCodes(spark, path).count() == 64)
  }

  test("probe with an empty query batch returns empty (no job explosion)") {
    val path = newPath()
    val c = corpus(16)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    val none = c.filter(col("vec_id") < 0)
    assert(PqIndex.probe(spark, path, none, "vec_id", "embedding", 5).count() == 0)
    assert(PqIndex.probe(spark, path, none, "vec_id", "embedding", 5,
      rerank = Some((c, "vec_id", "embedding"))).count() == 0)
  }

  test("candidates=1 probe equals the rank-1 rows of a wider probe, ties included") {
    import spark.implicits._
    val path = newPath()
    // ids 30 and 31 carry the SAME vector: identical codes, identical ADC
    // score — the (score desc, id ASC) tie must pick the lower id at any k
    val twin = corpus(64).filter(col("vec_id") === 30)
      .select(lit(31L).as("vec_id"), col("embedding"))
    val c = corpus(64).filter(col("vec_id") =!= 31).unionByName(twin)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    val q = c.filter(col("vec_id") < 6)
    def rows(cand: Int) =
      PqIndex.probe(spark, path, q, "vec_id", "embedding", candidates = cand)
        .filter(col("rank") === 1)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    assert(rows(1) == rows(5), s"${rows(1)} vs ${rows(5)}")
  }

  test("codeStats: per-subspace histogram covers every stored row") {
    val path = newPath()
    PqIndex.save(corpus(48), "vec_id", "embedding", path, m = 4, ksub = 4)
    val stats = PqIndex.codeStats(spark, path).collect()
    val bySub = stats.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySub.keySet == Set(0, 1, 2, 3))
    bySub.values.foreach(total => assert(total == 48L))
  }

  test("retrainSubspace: one subspace heals, the others' codes stay bit-identical") {
    import spark.implicits._
    val path = newPath()
    // seed sabotage: ids 0..3 (the deterministic Lloyd seeds) are all the
    // SAME direction, so with iterations = 0 every subspace's codebook is
    // four near-identical codewords and the code histogram collapses
    val skewSeeds = (0 until 4).map(i =>
      (i.toLong, Array.tabulate(8)(d => 1.0f + 0.001f * (i + d)).toSeq))
    val rest = (4 until 64).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8) { d =>
        (if ((c >> (d % 2)) % 2 == 0) 1.0f else -1.0f) +
          0.05f * (((i * 31 + d * 7) % 11) - 5)
      }.toSeq)
    }
    val c = (skewSeeds ++ rest).toDF("vec_id", "embedding")
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 0)
    def imbalance(sub: Int): Double = {
      val ns = PqIndex.codeStats(spark, path)
        .filter(col("s") === sub).collect().map(_.getLong(2))
      ns.max.toDouble / ns.sum
    }
    def codesBySub(): Map[Int, Map[Long, Int]] = {
      val rows = PqIndex.loadCodes(spark, path).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1))
      (0 until 4).map(sub =>
        sub -> rows.map { case (id, cs) => id -> cs(sub) }.toMap).toMap
    }
    val skewBefore = imbalance(1)
    val before = codesBySub()
    assert(skewBefore > 0.8, s"sabotaged codebook must be collapsed: $skewBefore")

    PqIndex.retrainSubspace(c, "vec_id", "embedding", path, s = 1)

    // the retrained subspace spreads out; the untouched subspaces'
    // codebooks AND codes reproduce bit-identically (codes are a pure
    // function of codebooks + vector — the no-bump contract)
    assert(imbalance(1) < skewBefore, s"${imbalance(1)} !< $skewBefore")
    assert(imbalance(1) <= 0.5, s"retrained subspace still collapsed: ${imbalance(1)}")
    val after = codesBySub()
    assert(after(0) == before(0) && after(2) == before(2)
      && after(3) == before(3))
    assert(after(1) != before(1), "the skewed subspace must re-encode")
    // scheme/geometry markers never bump — appends still compose
    assert(PqIndex.readParams(spark, path) ==
      PqIndex.readParams(spark, path).updated("ksub", "4"))
    // exactness is unaffected: all-covering re-rank still equals brute
    // force (q82's oracle contract survives maintenance)
    val q = c.filter(col("vec_id") < 2)
    val got = PqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 64, rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    // a corpus missing indexed rows must fail BEFORE touching the index —
    // including a SAME-SIZED snapshot whose id set drifted
    val e = intercept[IllegalStateException] {
      PqIndex.retrainSubspace(c.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, s = 0)
    }
    assert(e.getMessage.contains("FULL indexed corpus"))
    val swapped = c.withColumn("vec_id",
      when(col("vec_id") === 0L, lit(999L)).otherwise(col("vec_id")))
    val e2 = intercept[IllegalStateException] {
      PqIndex.retrainSubspace(swapped, "vec_id", "embedding", path, s = 0)
    }
    assert(e2.getMessage.contains("uncovered"), e2.getMessage)
    assert(PqIndex.loadCodes(spark, path).count() == 64,
      "the failed retrains must leave the index intact")
  }

  test("calibrate: exactly-reconstructable geometry collapses ADC onto exact cosine") {
    import spark.implicits._
    val path = newPath()
    // 64 rows = exact copies of 4 distinct prototypes, seeds (ids 0..3)
    // one per prototype: every subspace codebook learns the exact
    // subvector values, reconstruction is exact, and ADC ≡ exact cosine —
    // so the calibration curve must sit ON the cosine diagonal
    val protos = (0 until 4).map { c =>
      Array.tabulate(8) { d =>
        if ((c >> (d % 2)) % 2 == 0) 1.0f else -1.0f
      }
    }
    val c = (0 until 64).map(i => (i.toLong, protos(i % 4).toSeq))
      .toDF("vec_id", "embedding")
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 1)
    val sample = c.filter(col("vec_id") < 16)
    val curve = PqIndex.calibrate(spark, path, sample, "vec_id", "embedding",
      bins = 10).collect()
    assert(curve.nonEmpty)
    curve.foreach { r =>
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      Seq(3, 4, 5).foreach { i => // p05, p50, p95 all inside the cosine bin
        assert(r.getDouble(i) >= lo - 1e-4 && r.getDouble(i) <= hi + 1e-4,
          s"exact geometry: ADC quantile ${r.getDouble(i)} outside " +
            s"cosine bin [$lo, $hi)")
      }
    }
    // identical-prototype pairs live at cosine 1.0: the calibrated
    // threshold for target 0.9 is ~1.0, and filtering by it is the same
    // drop set as filtering by the exact cosine — calibrated ≡ exact
    val t = PqIndex.adcThresholdFor(spark, path, sample, "vec_id",
      "embedding", targetCosine = 0.9)
    assert(math.abs(t - 1.0) < 1e-3, s"exact geometry: threshold $t != 1.0")

    // a target no sample pair reaches must throw, not hand back a
    // zero-evidence threshold
    val e = intercept[IllegalArgumentException] {
      PqIndex.adcThresholdFor(spark, path, sample, "vec_id", "embedding",
        targetCosine = 1.5)
    }
    assert(e.getMessage.contains("zero evidence"), e.getMessage)
  }

  test("calibrate: coarse geometry yields a materially lower threshold than the naive one") {
    val path = newPath()
    // the noisy clustered corpus under a COARSE codebook (ksub = 2):
    // reconstructions sit far from the vectors, so near-dup pairs score
    // well below their exact cosine — the SCALE.md round-14 footgun. The
    // calibrated threshold for "exact cosine >= 0.95" must come out
    // materially below 0.95 (the naive threshold that never fired)
    val c = corpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 2,
      iterations = 2)
    val sample = c.filter(col("vec_id") < 32)
    val t = PqIndex.adcThresholdFor(spark, path, sample, "vec_id",
      "embedding", targetCosine = 0.95)
    assert(t < 0.95, s"coarse geometry must calibrate below naive 0.95: $t")
    assert(t > 0.0, s"threshold must still be a positive score: $t")
    // and the calibrated threshold actually fires on true matches where
    // the naive one does not: count sample pairs with exact cosine >=
    // 0.95 whose ADC clears each threshold
    val pairs = {
      import org.apache.spark.sql.functions.broadcast
      val l = sample.select(col("vec_id").as("__ia"), col("embedding").as("__va"))
      val r = sample.select(col("vec_id").as("__ib"), col("embedding").as("__vb"))
      l.join(broadcast(r), col("__ia") =!= col("__ib"))
        .filter(graft.functions.Vectors.cosineExact(col("__va"), col("__vb")) >= 0.95)
    }
    val truePairs = pairs.count()
    assert(truePairs > 0, "the clustered corpus must contain near-dup pairs")
    val adc = PqIndex.calibrate(spark, path, sample, "vec_id", "embedding",
      bins = 40).filter(col("cos_lo") >= 0.9)
    assert(adc.collect().map(_.getDouble(4)).forall(_ < 0.95),
      "median ADC of true near-dups sits below the naive threshold")
  }

  test("retrainSubspace: an interrupted codes swap repairs on re-run") {
    val path = newPath()
    val c = corpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    // simulate the worst crash point of a rename-aside swap — after the
    // live codes directory moved aside, before the staged directory
    // renamed in: the index has NO codes directory, only a fully-staged
    // `codes__retrain` (staging always completes before any swap starts)
    // and the aside copy. The old delete-then-rename discipline left this
    // state unrepairable by the documented "re-run the retrain" (it died
    // reading the absent codes path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
    org.apache.hadoop.fs.FileUtil.copy(fs, p("codes"), fs,
      p("codes__retrain"), false, conf)
    // swap() attests the staged dir with the ready marker BEFORE the first
    // rename, so every reachable mid-swap crash state carries it — the
    // simulation must too (an unmarked stage is a partial write and is
    // deliberately never rolled forward)
    fs.create(p("codes__retrain/_graft_swap_ready"), true).close()
    assert(fs.rename(p("codes"), p("codes__old")))
    assert(!fs.exists(p("codes")), "simulated crash: live codes gone")
    // the documented repair — re-run the retrain — must now work: entry
    // rolls the staged directory forward, then the retrain completes
    PqIndex.retrainSubspace(c, "vec_id", "embedding", path, s = 0,
      iterations = 1)
    assert(fs.exists(p("codes")), "repair must restore the codes directory")
    assert(!fs.exists(p("codes__old")) && !fs.exists(p("codes__retrain")),
      "a completed retrain leaves no stranded swap directories")
    // and the repaired + retrained index is exact under the all-covering
    // probe, the maintenance-invisibility contract
    val q = c.filter(col("vec_id") < 2)
    val got = PqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 64, rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("probe scans codes only — the full-vector table stays untouched") {
    val path = newPath()
    val c = corpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4)
    val plan = PqIndex.probe(spark, path,
        c.filter(col("vec_id") === 0).localCheckpoint(true),
        "vec_id", "embedding", candidates = 10)
      .queryExecution.executedPlan.toString
    // the data-sized file scan in the ADC plan is the codes table — the
    // corpus's full-vector parquet never appears (no rerank requested);
    // the query/codebook sides enter through broadcast exchanges
    assert(plan.contains("/codes]"), plan)
    assert(!plan.contains("docs") && !plan.contains("embeddings.parquet"),
      s"ADC scoring must not scan a full-vector table:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
  }
}
