package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BandIndex, Dedup, IvfIndex, IvfPqIndex, PqIndex}

/**
 * Retraction lifecycle across the four persisted index families: removeIds
 * must hide rows from every probe IMMEDIATELY (O(|ids|) tombstone, no
 * rewrite), and vacuum must make the removal physical while touching only
 * the partitions that held retracted rows — with the probe answer
 * unchanged across the vacuum, equal to an index that never contained the
 * retracted ids at all.
 */
class RetractionSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  private def banded(df: org.apache.spark.sql.DataFrame) =
    Dedup.lshBanded(df, "id", "text", shingleK = 3, numHashes = 8, bands = 4)

  private def idsDf(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** Clustered float corpus (IvfPqIndexSpec's family). */
  private def vecCorpus(n: Int, dims: Int = 8) = {
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

  private def newPath(tag: String): String =
    TempDirs.create(s"graft-retract-$tag").resolve("idx").toString

  test("BandIndex: removeIds hides pairs immediately; vacuum makes it physical") {
    val path = newPath("band")
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today",
      3L -> "totally unrelated content nothing shared at all here")
    val batch = docs(
      101L -> "the quick brown fox jumps over the lazy dog", // dup of 1
      102L -> "pack my box with five dozen liquor jugs today") // dup of 2
    BandIndex.save(banded(corpus), path, Map("k" -> "3"))
    def probePairs(): Set[(Long, Long)] =
      BandIndex.probe(spark, path, banded(batch), "id", maxBucket = 200)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probePairs() == Set((1L, 101L), (2L, 102L)))

    // retraction: doc 1 is taken down — its phantom rows must stop pairing
    // NOW, before any rewrite
    BandIndex.removeIds(spark, path, idsDf(1L))
    assert(probePairs() == Set((2L, 102L)),
      "retracted id must vanish from probes before any vacuum")
    // the data is still physically there (soft delete)
    assert(BandIndex.load(spark, path).filter(col("id") === 1L).count() > 0)

    val removed = BandIndex.vacuum(spark, path, "id")
    assert(removed == 4L, s"doc 1 had one row per band (4): $removed") // 4 bands
    assert(BandIndex.load(spark, path).filter(col("id") === 1L).count() == 0,
      "vacuum must drop the rows physically")
    assert(probePairs() == Set((2L, 102L)), "probe unchanged across vacuum")
    // marker survives the rewrite; tombstones are gone; second vacuum no-ops
    assert(BandIndex.readParams(spark, path) == Map("k" -> "3"))
    assert(BandIndex.vacuum(spark, path, "id") == 0L)
  }

  test("IvfIndex: vacuum rewrites ONLY touched cells; probe ≡ rebuilt-without-ids") {
    val path = newPath("ivf")
    val c = vecCorpus(64)
    IvfIndex.save(c, "vec_id", "embedding", path, numCentroids = 4)
    val q = c.filter(col("vec_id") === 0L)
    // retract two docs from the query's own cluster (cluster c = id % 4 = 0)
    val retractIds = Seq(4L, 8L)
    val kept = c.filter(!col("vec_id").isin(retractIds.map(Long.box): _*))
    def topIds(): Seq[Long] =
      IvfIndex.probe(spark, path, q, "vec_id", "embedding", k = 10,
        nprobe = 4).orderBy("rank").collect().map(_.getLong(1)).toSeq
    val cleanPath = newPath("ivf-clean")
    // same centroids so the cell geometry matches; only the rows differ
    IvfIndex.save(kept, "vec_id", "embedding", cleanPath, numCentroids = 4,
      centroids = Some(IvfIndex.loadCentroids(spark, path)))
    val want = IvfIndex.probe(spark, cleanPath, q, "vec_id", "embedding",
      k = 10, nprobe = 4).orderBy("rank").collect().map(_.getLong(1)).toSeq

    IvfIndex.removeIds(spark, path, idsDf(retractIds: _*))
    assert(topIds() == want, "tombstoned probe ≡ index built without the ids")

    // file inventory of every cell dir before vacuum
    def cellFiles(cell: Int): Set[(String, Long)] = {
      val d = new java.io.File(
        new java.net.URI("file://" + path + s"/cells/cell=$cell"))
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).toSet
    }
    val cellsOf = IvfIndex.loadCells(spark, path)
      .select(col("cell"), col("neighbor_id")).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    val touchedCells = retractIds.map(cellsOf).toSet
    val untouched = cellsOf.values.toSet -- touchedCells
    assert(untouched.nonEmpty, "test needs at least one untouched cell")
    val before = untouched.map(cl => cl -> cellFiles(cl)).toMap

    val removed = IvfIndex.vacuum(spark, path)
    assert(removed == 2L)
    untouched.foreach { cl =>
      assert(cellFiles(cl) == before(cl), s"cell $cl must be byte-untouched")
    }
    assert(IvfIndex.loadCells(spark, path)
      .filter(col("neighbor_id").isin(retractIds.map(Long.box): _*))
      .count() == 0)
    assert(topIds() == want, "probe unchanged across vacuum")
    assert(IvfIndex.vacuum(spark, path) == 0L)
  }

  test("IvfPqIndex: retraction end to end, incl. re-admission after vacuum") {
    val path = newPath("ivfpq")
    val c = vecCorpus(60)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    val q = c.filter(col("vec_id") === 1L)
    def topIds(): Seq[Long] =
      IvfPqIndex.probe(spark, path, q, "vec_id", "embedding",
        candidates = 60, nprobe = 4, rerank = Some((c, "vec_id", "embedding")),
        k = 5).orderBy("rank").collect().map(_.getLong(1)).toSeq
    val beforeIds = topIds()
    val victim = beforeIds.head

    IvfPqIndex.removeIds(spark, path, idsDf(victim))
    val afterIds = topIds()
    assert(!afterIds.contains(victim) && afterIds.nonEmpty,
      s"retracted $victim must vanish: $afterIds")

    // an append of a RETRACTED id stays suppressed until vacuum (documented)
    IvfPqIndex.append(c.filter(col("vec_id") === victim), "vec_id",
      "embedding", path)
    assert(!topIds().contains(victim),
      "re-appended retracted id must stay suppressed until vacuum")

    val removed = IvfPqIndex.vacuum(spark, path)
    assert(removed == 2L, s"original + re-appended row: $removed")
    assert(!topIds().contains(victim), "probe unchanged across vacuum")
    // re-admission AFTER the vacuum is visible again
    IvfPqIndex.append(c.filter(col("vec_id") === victim), "vec_id",
      "embedding", path)
    assert(topIds() == beforeIds, "re-admitted id must rank exactly as before")
  }

  test("PqIndex: flat-layout retraction; vacuum swaps the codes table") {
    val path = newPath("pq")
    val c = vecCorpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 2)
    val q = c.filter(col("vec_id") === 2L)
    def topIds(): Seq[Long] =
      PqIndex.probe(spark, path, q, "vec_id", "embedding", candidates = 64,
        rerank = Some((c, "vec_id", "embedding")), k = 5)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val victim = topIds().head
    PqIndex.removeIds(spark, path, idsDf(victim))
    assert(!topIds().contains(victim))
    val removed = PqIndex.vacuum(spark, path)
    assert(removed == 1L)
    assert(PqIndex.loadCodes(spark, path)
      .filter(col("vec_id") === victim).count() == 0)
    assert(!topIds().contains(victim))
    assert(PqIndex.loadCodes(spark, path).count() == 63)
    assert(PqIndex.vacuum(spark, path) == 0L)
  }

  test("pending tombstones do not break band-subset partition pruning") {
    val path = newPath("prune")
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs today")
    val batch = docs(101L -> "the quick brown fox jumps over the lazy dog")
    BandIndex.save(banded(corpus), path)
    BandIndex.removeIds(spark, path, idsDf(2L))
    // probe a band subset WITH tombstones pending: the subtraction is an
    // anti-join above the scan, and the static band filter must still
    // reach the scan as a PartitionFilter (the isin pushes through the
    // anti-join's index side)
    val probe = BandIndex.probe(spark, path, banded(batch), "id",
      maxBucket = 200, bandSubset = Some(Seq(1)))
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(s.plan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scansIn(m.relation.cachedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val scans = scansIn(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("idx")))
      .filterNot(_.relation.location.rootPaths.exists(_.toString.contains("_tombstones")))
    assert(scans.nonEmpty, "probe plan must scan the persisted index")
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("band"))),
      s"band subset must still prune with tombstones pending:\n" +
        scans.map(_.partitionFilters).mkString)
    // and the retraction itself still holds on the subset probe
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 101L)))
  }

  test("vacuum crash repair: a stranded rename-aside rolls back, then re-runs clean") {
    val path = newPath("crash")
    val c = vecCorpus(64)
    IvfIndex.save(c, "vec_id", "embedding", path, numCentroids = 4)
    val total = IvfIndex.loadCells(spark, path).count()
    // simulate the worst crash point: a cell renamed ASIDE, live dir gone
    // (between the aside and the rename-in — survivors exist only in the
    // hidden aside and the staged dir). The aside name is hidden, so a
    // reader right now sees the index MISSING that cell — which is why
    // the tombstone subtraction staying active matters.
    val cellsDir = new java.io.File(new java.net.URI("file://" + path + "/cells"))
    val someCell = cellsDir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted.head
    val live = new java.io.File(cellsDir, someCell)
    val asideRoot = new java.io.File(cellsDir, "_vac_aside")
    assert(asideRoot.mkdirs(), "test setup: aside root")
    val aside = new java.io.File(asideRoot, someCell)
    assert(live.renameTo(aside), "test setup: stranding the cell")
    assert(IvfIndex.loadCells(spark, path).count() < total,
      "sanity: the stranded cell is invisible")
    // tombstone an id from a DIFFERENT cell and vacuum: entry repair must
    // roll the stranded cell back before the pass
    IvfIndex.removeIds(spark, path, idsDf(0L))
    val removed = IvfIndex.vacuum(spark, path)
    assert(removed == 1L)
    assert(IvfIndex.loadCells(spark, path).count() == total - 1,
      "repair must restore the stranded cell; vacuum drops only the tombstoned row")
    assert(!aside.exists(), "the aside litter is gone")
  }

  test("PartitionVacuum: escaped string values (:/%/space) and the null partition vacuum physically") {
    import spark.implicits._
    import graft.operators.{PartitionVacuum, Tombstones}
    val root = TempDirs.create("graft-vac-escape").resolve("data").toString
    // partition values Spark's writer ESCAPES on disk (: and % →
    // percent-encoding) plus a null (→ __HIVE_DEFAULT_PARTITION__): the
    // old hand-built s"$partCol=$v" directory name missed all of them,
    // the swap silently no-op'd, and retracted rows SURVIVED with the
    // tombstone protection cleared — the exact compliance failure this
    // spec pins shut
    val df = Seq(
      (1L, Option("a b"), "r1"), (2L, Option("a b"), "r2"),
      (3L, Option("c:d%e"), "r3"), (4L, Option("c:d%e"), "r4"),
      (5L, Option.empty[String], "r5"), (6L, Option.empty[String], "r6"),
      (7L, Option("plain"), "r7"), (8L, Option("plain"), "r8"))
      .toDF("id", "part", "payload")
    df.write.partitionBy("part").parquet(root)
    // the escaped names really are on disk (guards against the test
    // silently weakening if Spark's escaping rules ever move)
    val dirs = new java.io.File(new java.net.URI("file://" + root))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("part=c%3Ad%25e") &&
      dirs.contains("part=__HIVE_DEFAULT_PARTITION__"), dirs.toString)
    def plainFiles() = new java.io.File(
        new java.net.URI("file://" + root + "/part=plain"))
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).toSet
    val before = plainFiles()
    Tombstones.append(spark, root, idsDf(1L, 3L, 5L))
    val removed = PartitionVacuum.vacuum(spark, root, root, "part", "id")
    assert(removed == 3L, s"removed must be honest: $removed")
    val left = spark.read.parquet(root)
    assert(left.select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 4L, 6L, 7L, 8L),
      "retracted rows must be PHYSICALLY gone from escaped + null partitions")
    assert(left.filter(col("part") === "a b").count() == 1)
    assert(left.filter(col("part") === "c:d%e").count() == 1)
    assert(left.filter(col("part").isNull).count() == 1)
    assert(plainFiles() == before, "untouched partition byte-identical")
    // the set cleared (commit point reached); a re-run no-ops
    assert(PartitionVacuum.vacuum(spark, root, root, "part", "id") == 0L)
  }

  test("PartitionVacuum: adversarial partition-value battery round-trips the writer's naming") {
    import spark.implicits._
    import graft.operators.{PartitionVacuum, Tombstones}
    // every value class Spark's writer treats specially: path separators,
    // the partition '=' delimiter, percent (the escape char itself),
    // quotes, hash/question (URI-significant), backslash, glob and
    // bracket characters, a tab,
    // and the literal default-partition token — which writes verbatim and
    // READS BACK AS NULL, so it exercises the vacuum's null arm through
    // the round-trip. (Empty string and true null are NOT alongside it:
    // all three are distinct writer-internal values mapping to the SAME
    // directory and per-task filename, and Spark's own write task
    // collides on itself — a writer quirk upstream of vacuum; true null
    // is covered by the escaping spec above.)
    val values: Seq[Option[String]] = Seq(
      Some("a b"), Some("a=b"), Some("a/b"), Some("a:b"), Some("a%b"),
      Some("a'b"), Some("a\"b"), Some("a#b"), Some("a?b"), Some("a\\b"),
      Some("a\tb"), Some("a*b"), Some("a[b]"), Some("a^b"), Some("a{b}"),
      Some("__HIVE_DEFAULT_PARTITION__"))
    // non-ASCII values (ümlaut, CJK) are deliberately absent: Spark does
    // not escape them (legal path bytes under a UTF-8 locale) and this
    // container's JVM locale cannot create such filenames at all —
    // another writer-side constraint upstream of vacuum
    val root = TempDirs.create("graft-vac-adversarial").resolve("d").toString
    // two rows per value; tombstone the even id of each pair
    val rows = values.zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, v, s"keep$i"), (i * 2L + 1, v, s"drop$i"))
    }
    rows.toDF("id", "part", "payload").repartition(4)
      .write.partitionBy("part").parquet(root)
    val dropIds = values.indices.map(i => i * 2L + 1)
    Tombstones.append(spark, root, dropIds.toDF("id"))
    val removed = PartitionVacuum.vacuum(spark, root, root, "part", "id")
    assert(removed == values.size.toLong, s"$removed of ${values.size}")
    val left = spark.read.parquet(root).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(left == values.indices.map(i => i * 2L).toSet,
      s"every odd id must be physically gone: $left")
    assert(PartitionVacuum.vacuum(spark, root, root, "part", "id") == 0L)
  }

  test("vacuum crash walk: stale stage litter and crash-before-clear re-run clean") {
    import spark.implicits._
    import graft.operators.{PartitionVacuum, Tombstones}
    val root = TempDirs.create("graft-vac-walk").resolve("d").toString
    Seq((1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"), (4L, "p2", "d"))
      .toDF("id", "part", "payload")
      .write.partitionBy("part").parquet(root)
    Tombstones.append(spark, root, idsDf(1L))
    // crash state: the staged-survivors write died mid-flight on a PRIOR
    // run — a partial stage litters <root>__vacuum. Entry must discard it
    // and stage fresh, never swap in the partial bytes.
    val staged = new java.io.File(new java.net.URI(s"file://${root}__vacuum"))
    assert(new java.io.File(staged, "part=p1").mkdirs())
    val junk = new java.io.File(staged, "part=p1/part-junk.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    assert(PartitionVacuum.vacuum(spark, root, root, "part", "id") == 1L)
    assert(!staged.exists(), "stale stage must be discarded, then cleaned up")
    def ids(): Set[Long] = spark.read.parquet(root).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids() == Set(2L, 3L, 4L))
    // crash state: every swap completed but the crash hit BEFORE the
    // tombstone clear (the commit point) — the replay re-runs with the
    // already-removed id still tombstoned and must land on the same
    // result with removed = 0, then clear
    Tombstones.append(spark, root, idsDf(1L))
    assert(PartitionVacuum.vacuum(spark, root, root, "part", "id") == 0L)
    assert(ids() == Set(2L, 3L, 4L))
    assert(Tombstones.read(spark, root).isEmpty, "replay must reach the clear")
  }

  test("DirSwap: a swap stranded by ONE operation repairs from ANY entry point") {
    import graft.operators.PqIndex
    val path = newPath("dirswap")
    val c = vecCorpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 1)
    val codesUri = new java.net.URI("file://" + path + "/codes")
    def strandVacuumSwap(): java.io.File = {
      // crash point between rename-aside and rename-in of a VACUUM swap:
      // live codes gone, committed content sits in codes__vacuum behind
      // the ready marker (exactly what swap() stages before renaming)
      val codes = new java.io.File(codesUri)
      val staged = new java.io.File(new java.net.URI(
        "file://" + path + "/codes__vacuum"))
      assert(codes.renameTo(staged), "test setup: stranding the swap")
      assert(new java.io.File(staged, "_graft_swap_ready").createNewFile())
      staged
    }
    // (a) a RETRAIN — a different operation from the one that crashed —
    // must roll the vacuum's swap forward instead of dying on a missing
    // codes directory (the r15 defect: each op repaired only ITS suffix)
    val s1 = strandVacuumSwap()
    PqIndex.retrainSubspace(c, "vec_id", "embedding", path, s = 0,
      iterations = 1)
    assert(new java.io.File(codesUri).exists() && !s1.exists())
    // (b) a PROBE after a fresh strand repairs through the reader funnel
    val s2 = strandVacuumSwap()
    val q = c.filter(col("vec_id") === 2L)
    val top = PqIndex.probe(spark, path, q, "vec_id", "embedding",
      candidates = 16, rerank = Some((c, "vec_id", "embedding")), k = 3)
    assert(top.count() == 3, "probe must succeed after roll-forward")
    assert(new java.io.File(codesUri).exists() && !s2.exists())
    // (c) an UNMARKED partial stage must NEVER roll forward — a stage
    // without the ready marker is a crash mid-write, i.e. garbage
    val s3 = strandVacuumSwap()
    assert(new java.io.File(s3, "_graft_swap_ready").delete())
    intercept[Exception] { PqIndex.loadCodes(spark, path).count() }
    assert(s3.exists(), "partial stage left for its owner's cleanup")
    // restore for the filesystem's sake
    assert(new java.io.File(s3, "_graft_swap_ready").createNewFile())
    assert(PqIndex.loadCodes(spark, path).count() == 64)
  }

  test("DirSwap: concurrent repairs converge to ONE consistent live dir (claim marker)") {
    import graft.operators.PqIndex
    val path = newPath("dirswap-race")
    val c = vecCorpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 1)
    val codes = new java.io.File(new java.net.URI("file://" + path + "/codes"))
    val staged = new java.io.File(new java.net.URI(
      "file://" + path + "/codes__vacuum"))
    assert(codes.renameTo(staged), "test setup: stranding the swap")
    assert(new java.io.File(staged, "_graft_swap_ready").createNewFile())
    // two reader-funnel repairs race: the claim marker lets exactly one
    // roll the stage forward; the loser WAITS for the winner's rename, so
    // both callers read the repaired live dir
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence((1 to 2).map(_ =>
        Future(PqIndex.loadCodes(spark, path).count()))),
      2.minutes)
    assert(counts == Seq(64L, 64L), s"both racing readers must succeed: $counts")
    assert(codes.exists() && !staged.exists(), "one consistent live dir")
    val claim = new java.io.File(new java.net.URI(
      "file://" + path + "/codes__claim"))
    assert(!new java.io.File(codes, "_graft_swap_ready").exists() &&
      !claim.exists(), "no marker litter left behind")
    // and a STALE claim (a claimant that died before its rename) is taken
    // over rather than wedging the index forever
    assert(codes.renameTo(staged), "test setup: strand again")
    assert(new java.io.File(staged, "_graft_swap_ready").createNewFile())
    assert(claim.createNewFile())
    assert(claim.setLastModified(System.currentTimeMillis() - 120000L))
    assert(PqIndex.loadCodes(spark, path).count() == 64,
      "a stale claim must be taken over, not waited on forever")
    assert(codes.exists() && !staged.exists() && !claim.exists())
  }

  test("DirSwap: repair sweeps a ready marker stranded INSIDE live") {
    import graft.operators.PqIndex
    val path = newPath("dirswap-marker")
    val c = vecCorpus(64)
    PqIndex.save(c, "vec_id", "embedding", path, m = 4, ksub = 4,
      iterations = 1)
    // crash state between swap's rename(staged→live) and the marker
    // delete: live is current but still CARRIES the ready marker, and
    // __old is litter. The next reader must sweep both — a marker left
    // inside a live directory stops meaning "committed stage".
    val codes = new java.io.File(new java.net.URI("file://" + path + "/codes"))
    val marker = new java.io.File(codes, "_graft_swap_ready")
    assert(marker.createNewFile(), "test setup: stranding the marker")
    val old = new java.io.File(new java.net.URI(
      "file://" + path + "/codes__old"))
    assert(old.mkdir(), "test setup: __old litter")
    assert(PqIndex.loadCodes(spark, path).count() == 64)
    assert(!marker.exists(), "stranded ready marker swept from live")
    assert(!old.exists(), "__old litter swept")
  }

  test("IvfPqIndex: cells stranded mid-swap repair from append and vacuum entry") {
    val path = newPath("dirswap-ivfpq")
    val c = vecCorpus(60)
    IvfPqIndex.save(c, "vec_id", "embedding", path,
      numCells = 4, m = 4, ksub = 4, iterations = 1)
    val cellsUri = new java.net.URI("file://" + path + "/cells")
    def strand(): java.io.File = {
      val cells = new java.io.File(cellsUri)
      val staged = new java.io.File(new java.net.URI(
        "file://" + path + "/cells__retrain"))
      assert(cells.renameTo(staged), "test setup")
      assert(new java.io.File(staged, "_graft_swap_ready").createNewFile())
      staged
    }
    // vacuum entry (delegates to PartitionVacuum, which reads the path
    // directly) must repair a crashed RETRAIN's swap first
    val s1 = strand()
    IvfPqIndex.removeIds(spark, path, idsDf(0L))
    assert(IvfPqIndex.vacuum(spark, path) == 1L)
    assert(new java.io.File(cellsUri).exists() && !s1.exists())
    // append into a stranded layout must repair, not create a fresh dir
    // beside the stage
    val s2 = strand()
    IvfPqIndex.append(vecCorpus(61).filter(col("vec_id") === 60L),
      "vec_id", "embedding", path)
    assert(new java.io.File(cellsUri).exists() && !s2.exists())
    assert(IvfPqIndex.loadCells(spark, path).count() == 60L) // 59 + appended
  }
}
