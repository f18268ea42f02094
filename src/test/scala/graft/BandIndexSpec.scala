package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BandIndex, Dedup}

/**
 * Lifecycle proof for the persisted band index: the nightly-ingest cycle is
 * build corpus index → save → probe batch 1 → append accepted rows → probe
 * batch 2 — and every persisted probe must equal both the in-memory probe
 * and the full recompute's cross subset (the reference dedupes each
 * incremental load against the standing mart without reprocessing it, ref:
 * /root/reference/docs/KIMBALL_CDC_DATA_DESIGN.md:289-296).
 */
class BandIndexSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs today",
    3L -> "totally unrelated content nothing shared at all here")
  private val batch1 = docs(
    101L -> "the quick brown fox jumps over the lazy dog", // dup of 1
    102L -> "sphinx of black quartz judge my vow tonight")
  private val batch2 = docs(
    201L -> "sphinx of black quartz judge my vow tonight", // dup of 102
    202L -> "pack my box with five dozen liquor jugs today") // dup of 2

  private def banded(df: org.apache.spark.sql.DataFrame) =
    Dedup.lshBanded(df, "id", "text", shingleK = 3, numHashes = 8, bands = 4)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("save → probe → append → probe equals in-memory probe AND full recompute") {
    val path = TempDirs.create("graft-bandindex").resolve("idx").toString

    BandIndex.save(banded(corpus), path)

    // probe 1: persisted path ≡ in-memory probe ≡ full recompute's cross subset
    val p1 = pairs(BandIndex.probe(spark, path, banded(batch1), "id", maxBucket = 200))
    assert(p1 == pairs(Dedup.probeBandedPairs(banded(corpus), banded(batch1),
      "id", maxBucket = 200)), "persisted probe must equal the in-memory probe")
    assert(p1.contains((1L, 101L)), "the duplicate cross pair must surface")

    // accept batch 1 → its banded rows join the standing index
    BandIndex.append(banded(batch1), path)

    // probe 2 sees batch 1 as corpus: pairs equal the full recompute over
    // (corpus ∪ batch1) vs batch2 — the crux of the lifecycle claim
    val p2 = pairs(BandIndex.probe(spark, path, banded(batch2), "id", maxBucket = 200))
    val full = pairs(Dedup.minhashLshPairs(
      corpus.union(batch1).union(batch2), "id", "text", maxBucket = 200))
    val cross = full.filter { case (a, b) => (a >= 201L) != (b >= 201L) }
    assert(p2 == cross,
      "second persisted probe must equal the full recompute's batch2 cross subset")
    assert(p2.contains((102L, 201L)),
      "a dup of an APPENDED batch-1 doc must be caught by the standing index")
    assert(p2.contains((2L, 202L)))
  }

  test("load round-trips schema and membership; append adds only new band files") {
    val path = TempDirs.create("graft-bandindex").resolve("idx2").toString
    val b = banded(corpus)
    BandIndex.save(b, path)
    val loaded = BandIndex.load(spark, path)
    assert(loaded.columns.sorted.toSeq == b.columns.sorted.toSeq)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("band").cast("int"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(key(loaded) == key(b))
    BandIndex.append(banded(batch1), path)
    assert(key(BandIndex.load(spark, path)) == key(b) ++ key(banded(batch1)))
  }

  test("writes are (band, bucket)-range-clustered: file count ~ tasks, not tasks x bands") {
    // without the range cluster every upstream task writes into every band
    // directory (tasks × bands files — the aging tier's measured litter);
    // with it, AQE coalesces this tiny frame to one task, so each band
    // directory holds exactly ONE file after save and TWO after an append
    val path = TempDirs.create("graft-bandindex").resolve("idx5").toString
    BandIndex.save(banded(corpus).repartition(8), path)
    def perBand: Map[String, Int] =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("band="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val afterSave = perBand
    assert(afterSave.size == 4 && afterSave.values.forall(_ == 1),
      s"one clustered file per band after save, got $afterSave")
    BandIndex.append(banded(batch1).repartition(8), path)
    val afterAppend = perBand
    assert(afterAppend.values.forall(_ == 2),
      s"one new file per band per append, got $afterAppend")
  }

  test("band-subset probe prunes index partitions at the scan") {
    val path = TempDirs.create("graft-bandindex").resolve("idx3").toString
    BandIndex.save(banded(corpus), path)
    val probe = BandIndex.probe(spark, path, banded(batch1), "id",
      maxBucket = 200, bandSubset = Some(Seq(1)))
    // the static band filter must reach the index scan as a PARTITION filter
    // (directory pruning), not a post-scan predicate. AQE wraps the joined
    // plan, so recurse through AdaptiveSparkPlanExec leaves to the scans.
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(s.plan)
        // probeBandedPairs persists the pruned index frame, so the index
        // scan lives inside the cached plan of an in-memory relation
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scansIn(m.relation.cachedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val scans = scansIn(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("idx3")))
    assert(scans.nonEmpty, "probe plan must scan the persisted index")
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("band"))),
      s"band subset must prune partitions:\n${scans.map(_.partitionFilters).mkString}")
    // and files actually read are only the band=1 directory
    val filesRead = scans.map(f =>
      f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
        .flatMap(_.files).map(_.getPath.toString)).head
    assert(filesRead.nonEmpty && filesRead.forall(_.contains("band=1")),
      s"only band=1 files may survive pruning: $filesRead")
    // subset probe ≡ in-memory probe restricted to the same band
    val expected = pairs(Dedup.probeBandedPairs(
      banded(corpus).filter(col("band") === 1),
      banded(batch1).filter(col("band") === 1), "id", maxBucket = 200))
    assert(pairs(probe) == expected)
  }

  test("probe excludeIds restores the pre-append corpus view (replay idempotence)") {
    val path = TempDirs.create("graft-bandindex").resolve("idx5").toString
    BandIndex.save(banded(corpus), path)
    // the pre-append answer a first (non-replayed) run sees
    val first = pairs(BandIndex.probe(spark, path, banded(batch1), "id",
      maxBucket = 200))
    // crash-replay scenario: the batch's rows were already appended, then
    // the same batch probes again — without the exclusion, batch docs pair
    // with their batch-mates' appended copies
    BandIndex.append(banded(batch1), path)
    val replayed = pairs(BandIndex.probe(spark, path, banded(batch1), "id",
      maxBucket = 200, excludeIds = Some(batch1.select(col("id")))))
    assert(replayed == first,
      s"excluded replay must equal the pre-append probe: $replayed vs $first")
    // and WITHOUT the exclusion the poisoned pairs do appear (the hazard
    // this hook exists for): a batch with an intra-batch duplicate pair,
    // replayed after its own append, pairs each member with the OTHER
    // member's appended index rows — the pair that put the kept survivor
    // in the drop set before the fix
    val intraDup = docs(
      301L -> "grumpy wizards make toxic brew for the evil queen",
      302L -> "grumpy wizards make toxic brew for the evil queen")
    BandIndex.append(banded(intraDup), path)
    val poisoned = pairs(BandIndex.probe(spark, path, banded(intraDup), "id",
      maxBucket = 200))
    assert(poisoned.contains((301L, 302L)),
      s"un-excluded replay pairs batch docs with appended batch rows: $poisoned")
    val clean = pairs(BandIndex.probe(spark, path, banded(intraDup), "id",
      maxBucket = 200, excludeIds = Some(intraDup.select(col("id")))))
    assert(!clean.exists { case (a, b) => a >= 301L && b >= 301L },
      s"excluded replay must not see the batch's own appended rows: $clean")
  }

  test("lifecycle composes with embeddingBanded (sign-LSH long buckets)") {
    import spark.implicits._
    // 4-dim embeddings; sign pattern of all 4 dims = 1 band × 4 bits.
    // 11/12 share corpus 1's orthant, 13 is alone in its own.
    def emb(rows: (Long, Array[Float])*) = rows.toDF("id", "vec")
    val corpus = emb(
      1L -> Array(1f, 1f, -1f, 1f), 2L -> Array(-1f, 1f, 1f, -1f))
    val batch = emb(
      11L -> Array(0.9f, 1.1f, -0.5f, 0.4f), // corpus-1 orthant
      12L -> Array(1f, 2f, -2f, 0.1f),       // corpus-1 orthant
      13L -> Array(-1f, -1f, -1f, -1f))      // unshared orthant
    def eb(df: org.apache.spark.sql.DataFrame) =
      Dedup.embeddingBanded(df, "id", "vec", signBits = 4, bands = 1)
    val path = TempDirs.create("graft-bandindex").resolve("idx4").toString
    BandIndex.save(eb(corpus), path)
    val persisted = pairs(BandIndex.probe(spark, path, eb(batch), "id",
      maxBucket = 200))
    assert(persisted == pairs(Dedup.probeBandedPairs(eb(corpus), eb(batch),
      "id", maxBucket = 200)), "persisted ≡ in-memory for embedding buckets")
    assert(persisted == Set((1L, 11L), (1L, 12L)),
      s"same-orthant cross pairs only, got $persisted")
  }
}
