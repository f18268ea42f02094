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
}
