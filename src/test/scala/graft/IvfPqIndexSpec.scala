package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfPqIndex, PqIndex, Similarity}

class IvfPqIndexSpec extends AnyFunSuite with SparkSpec {

  /** Same clustered corpus family as PqIndexSpec — four directions, so
    * both the coarse cells and the PQ codes have structure. */
  private def corpus(n: Int, dims: Int = 8) = {
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
    TempDirs.create("graft-ivfpq").resolve("idx").toString

  test("save: cells partitioned on disk, meta records both parents' params") {
    val path = newPath()
    IvfPqIndex.save(corpus(64), "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 2)
    val meta = IvfPqIndex.readParams(spark, path)
    assert(meta("kind") == "ivfpq" && meta("dims") == "8" &&
      meta("numCentroids") == "4" && meta("m") == "4" && meta("ksub") == "4" &&
      meta("scheme") == PqIndex.SchemeVersion)
    // physical layout: one directory per cell
    val cellsDir = new java.io.File(s"$path/cells")
    val dirs = cellsDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("cell=")) && dirs.nonEmpty)
    assert(IvfPqIndex.loadCells(spark, path).count() == 64)
  }

  test("probe with nprobe = all cells + all-covering re-rank ≡ brute force") {
    val path = newPath()
    val c = corpus(60)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    val q = c.filter(col("vec_id") < 3)
    val got = IvfPqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 60, nprobe = 4,
        rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("probe reads ONLY its touched cell directories (partition pruning)") {
    val path = newPath()
    val c = corpus(120)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 2)
    val one = c.filter(col("vec_id") === 0)
    val probed = IvfPqIndex.probe(spark, path, one, "vec_id", "embedding",
      candidates = 10, nprobe = 1)
    // descend through AQE wrappers (IvfIndexSpec's pruning pattern)
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(s.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val scans = scansIn(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cells")))
    assert(scans.nonEmpty, "probe plan must scan the persisted cells")
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("cell"))),
      s"cell list must prune partitions:\n${scans.map(_.partitionFilters)}")
    // a single query reads exactly its own cell directory
    val filesRead = scans.map(f =>
      f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
        .flatMap(_.files).map(_.getPath.toString)).head
    val dirs = filesRead.map(_.replaceAll(".*/(cell=\\d+)/.*", "$1")).distinct
    assert(dirs.size == 1,
      s"a single query probes exactly its own cell, read: $dirs")
  }

  test("nprobe widens candidates monotonically; results stay ranked") {
    val path = newPath()
    val c = corpus(120)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 2)
    val q = c.filter(col("vec_id") === 1)
    def ids(nprobe: Int) =
      IvfPqIndex.probe(spark, path, q, "vec_id", "embedding",
          candidates = 200, nprobe = nprobe)
        .collect().map(_.getLong(1)).toSet
    val n1 = ids(1); val n4 = ids(4)
    assert(n1.subsetOf(n4) && n1.size < n4.size && n4.size == 119)
  }

  test("append routes to touched cells only; drift guards fail fast") {
    import spark.implicits._
    val path = newPath()
    val c = corpus(64)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    val before = IvfPqIndex.cellStats(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // append twins of vec 2 — all land in vec 2's cell
    val twins = c.filter(col("vec_id") === 2)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    IvfPqIndex.append(twins, "vec_id", "embedding", path)
    val after = IvfPqIndex.cellStats(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after.values.sum == before.values.sum + 1)
    assert(after.count { case (cell, n) => n != before.getOrElse(cell, 0L) } == 1)
    val drifted = Seq((9000L, Seq.fill(6)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      IvfPqIndex.probe(spark, path, drifted, "vec_id", "embedding", 5)
    }
    assert(e.getMessage.contains("8-dim"))
  }

  test("retrainSubspace: one subspace heals in place; cells, centroids and other books untouched") {
    import spark.implicits._
    val path = newPath()
    // PqIndexSpec's seed sabotage on the composed layout: ids 0..3 (the
    // deterministic Lloyd seeds) all share one direction, so with
    // iterations = 0 every subspace's codebook is four near-identical
    // codewords and the code histogram collapses
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
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 0)
    def imbalance(sub: Int): Double = {
      val ns = IvfPqIndex.codeStats(spark, path)
        .filter(col("s") === sub).collect().map(_.getLong(2))
      ns.max.toDouble / ns.sum
    }
    def state() = {
      val rows = IvfPqIndex.loadCells(spark, path).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1),
          r.getAs[Int]("cell")))
      (rows.map(r => r._1 -> r._3).toMap, // cell assignment
        (0 until 4).map(sub =>
          sub -> rows.map(r => r._1 -> r._2(sub)).toMap).toMap) // codes
    }
    def booksOf() = IvfPqIndex.loadCodebooks(spark, path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val skewBefore = imbalance(1)
    assert(skewBefore > 0.8, s"sabotaged codebook must be collapsed: $skewBefore")
    val (cellsBefore, codesBefore) = state()
    val booksBefore = booksOf()
    val centsBefore = IvfPqIndex.loadCentroids(spark, path).collect()
      .map(_.toSeq).toSet

    IvfPqIndex.retrainSubspace(c, "vec_id", "embedding", path, s = 1)

    // the retrained subspace spreads out; everything else reproduces
    // exactly — untouched subspaces' codewords AND codes, the coarse
    // centroid file, and every row's cell assignment (cells are a pure
    // function of centroids + vector; no resplit happened here)
    assert(imbalance(1) < skewBefore && imbalance(1) <= 0.5,
      s"retrained subspace still collapsed: ${imbalance(1)}")
    val (cellsAfter, codesAfter) = state()
    assert(cellsAfter == cellsBefore, "cell assignment must reproduce")
    assert(codesAfter(0) == codesBefore(0) && codesAfter(2) == codesBefore(2)
      && codesAfter(3) == codesBefore(3))
    assert(codesAfter(1) != codesBefore(1), "the skewed subspace must re-encode")
    val booksAfter = booksOf()
    assert(booksAfter.filter(_._1._1 != 1) == booksBefore.filter(_._1._1 != 1),
      "other subspaces' codewords must be identical")
    assert(IvfPqIndex.loadCentroids(spark, path).collect()
      .map(_.toSeq).toSet == centsBefore, "coarse centroids never move")
    // geometry markers never bump — appends still compose
    assert(IvfPqIndex.readParams(spark, path).get("numCentroids").contains("4"))
    // maintenance invisibility: all-cells probe + all-covering re-rank
    // still equals brute force (q87's oracle contract)
    val q = c.filter(col("vec_id") < 2)
    val got = IvfPqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 64, nprobe = 4,
        rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    // a corpus missing indexed rows must fail BEFORE touching the index
    val e = intercept[IllegalStateException] {
      IvfPqIndex.retrainSubspace(c.filter(col("vec_id") < 10), "vec_id",
        "embedding", path, s = 0)
    }
    assert(e.getMessage.contains("FULL indexed corpus"))
    assert(IvfPqIndex.loadCells(spark, path).count() == 64,
      "the failed retrain must leave the index intact")
  }

  test("retrainSubspace: an interrupted cells swap repairs on re-run") {
    val path = newPath()
    val c = corpus(64)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    // the worst crash point of the rename-aside swap: live cells moved
    // aside, fully-staged cells__retrain not yet renamed in
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
    org.apache.hadoop.fs.FileUtil.copy(fs, p("cells"), fs,
      p("cells__retrain"), false, conf)
    // the new swap() marks the stage ready before any rename — simulate
    // the reachable crash state, marker included (see PqIndexSpec's twin)
    fs.create(p("cells__retrain/_graft_swap_ready"), true).close()
    assert(fs.rename(p("cells"), p("cells__old")))
    assert(!fs.exists(p("cells")), "simulated crash: live cells gone")
    IvfPqIndex.retrainSubspace(c, "vec_id", "embedding", path, s = 0,
      iterations = 1)
    assert(fs.exists(p("cells")) && !fs.exists(p("cells__old"))
      && !fs.exists(p("cells__retrain")),
      "repair + retrain must leave one consistent cells directory")
    val q = c.filter(col("vec_id") < 2)
    val got = IvfPqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 64, nprobe = 4,
        rerank = Some((c, "vec_id", "embedding")), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = Similarity.bruteForceTopKAgg(q, c, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("resplitCell: codes byte-untouched, cold cells byte-untouched, probes identical") {
    import spark.implicits._
    import graft.functions.Vectors
    val path = newPath()
    // IvfIndexSpec's hot-cell geometry: X on e1 (ids 0-9), Y on e2 (even
    // ids 100-118), Z on e3 (odd ids 101-119); centroid c1 between Y and Z
    // makes cell 1 hold 2/3 of the corpus, and the interleaved ids put one
    // k-means seed in each sub-cluster (100∈Y, 101∈Z)
    def v(main: Int, i: Int) = Array.tabulate(4)(d =>
      (if (d == main) 1.0f else 0.0f) + (if (d == 3) 0.01f * (i % 5) else 0.0f)).toSeq
    val c3 = ((0 until 10).map(i => (i.toLong, v(0, i))) ++
      (0 until 10).map(i => (100L + 2 * i, v(1, i))) ++
      (0 until 10).map(i => (101L + 2 * i, v(2, i)))).toDF("vec_id", "embedding")
    val cents = Seq(
        (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
        (1, Seq(0.0f, 0.7f, 0.7f, 0.0f))).toDF("cent_id", "cvec")
      .select(col("cent_id"), Vectors.quantize(col("cvec")).as("__cent"))
      .withColumn("__centn", Vectors.dotQ(col("__cent"), col("__cent")))
    IvfPqIndex.save(c3, "vec_id", "embedding", path,
      numCells = 2, m = 4, ksub = 4, iterations = 2, centroids = Some(cents))
    val mass = IvfPqIndex.cellStats(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mass == Map(0 -> 10L, 1 -> 20L), s"hot cell must exist: $mass")
    def codesOf() = IvfPqIndex.loadCells(spark, path)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def cell0Files() = {
      val d = new java.io.File(new java.net.URI("file://" + path + "/cells/cell=0"))
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val queries = c3.filter(col("vec_id").isin(0L, 100L, 101L))
    def probeAll(nprobe: Int) =
      IvfPqIndex.probe(spark, path, queries, "vec_id", "embedding",
          candidates = 30, nprobe = nprobe)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq
    val codesBefore = codesOf()
    val before = probeAll(nprobe = 2) // all cells
    val cell0Before = cell0Files()

    IvfPqIndex.resplitCell(spark, path, cell = 1, subCells = 2)

    // no re-encode: every row's codes are exactly the bytes it had — the
    // direct-encoding payoff this operator exists to prove
    assert(codesOf() == codesBefore, "codes must pass through untouched")
    assert(cell0Files() == cell0Before, "cell 0 must be byte-untouched")
    val after = IvfPqIndex.cellStats(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!after.contains(1) && after.keySet == Set(0, 2, 3) &&
      after(0) == 10L && after(2) == 10L && after(3) == 10L,
      s"mass must re-split into the sub-cells: $after")
    // an all-cells probe is EXACTLY unchanged (same codes, same ADC
    // scores, only the directory layout moved)
    assert(probeAll(nprobe = 3) == before)
    assert(IvfPqIndex.readParams(spark, path).get("numCentroids").contains("3"))
    // routing still works cell-scoped: each sub-cluster query finds its
    // own kin at nprobe = 1
    val n1 = IvfPqIndex.probe(spark, path,
        c3.filter(col("vec_id") === 100L), "vec_id", "embedding",
        candidates = 30, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(n1.nonEmpty && n1.forall(id => id >= 100L && id % 2 == 0),
      s"query 100 must probe the Y sub-cell: $n1")
  }

  test("calibrate: exact geometry collapses onto the cosine diagonal; composed codes read") {
    import spark.implicits._
    val path = newPath()
    // exact copies of 4 prototypes (PqIndexSpec's construction): every PQ
    // codebook learns the exact subvectors, reconstruction is exact, so
    // the composed-layout curve must also sit ON the cosine diagonal
    val protos = (0 until 4).map { c =>
      Array.tabulate(8) { d =>
        if ((c >> (d % 2)) % 2 == 0) 1.0f else -1.0f
      }
    }
    val c = (0 until 64).map(i => (i.toLong, protos(i % 4).toSeq))
      .toDF("vec_id", "embedding")
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    val sample = c.filter(col("vec_id") < 16)
    val curve = IvfPqIndex.calibrate(spark, path, sample, "vec_id",
      "embedding", bins = 10).collect()
    assert(curve.nonEmpty)
    curve.foreach { r =>
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      Seq(3, 4, 5).foreach { i =>
        assert(r.getDouble(i) >= lo - 1e-4 && r.getDouble(i) <= hi + 1e-4,
          s"exact geometry: ADC quantile ${r.getDouble(i)} outside " +
            s"cosine bin [$lo, $hi)")
      }
    }
    val t = IvfPqIndex.adcThresholdFor(spark, path, sample, "vec_id",
      "embedding", targetCosine = 0.9)
    assert(math.abs(t - 1.0) < 1e-3, s"exact geometry: threshold $t != 1.0")
    // zero evidence must throw, not hand back a threshold
    val e = intercept[IllegalArgumentException] {
      IvfPqIndex.adcThresholdFor(spark, path, sample, "vec_id", "embedding",
        targetCosine = 1.5)
    }
    assert(e.getMessage.contains("zero evidence"), e.getMessage)
  }

  test("calibrate: coarse composed geometry calibrates below the naive 0.95") {
    val path = newPath()
    // noisy clustered corpus under a COARSE codebook (ksub = 2): near-dup
    // pairs ADC-score well below their exact cosine — the calibration must
    // surface a threshold materially below the naive one that never fires
    val c = corpus(64)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 2, iterations = 2)
    val sample = c.filter(col("vec_id") < 32)
    val t = IvfPqIndex.adcThresholdFor(spark, path, sample, "vec_id",
      "embedding", targetCosine = 0.95)
    assert(t < 0.95, s"coarse geometry must calibrate below naive 0.95: $t")
    assert(t > 0.0, s"threshold must still be a positive score: $t")
  }
}
