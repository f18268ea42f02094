package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomIndex

/**
 * Exactness and lifecycle proof for the sharded Bloom membership index.
 * The contract under test: `probe` is EXACT (is_dup true iff the key is in
 * the standing ledger) REGARDLESS of bloom geometry — a saturated filter
 * degrades cost, never answers — and the nightly cycle (save → probe →
 * append → compact → retract → vacuum → rebuild) preserves that exactness
 * at every point.
 */
class BloomIndexSpec extends AnyFunSuite with SparkSpec {

  private def keysDf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "id")
  }

  private def probeMap(path: String,
      batch: org.apache.spark.sql.DataFrame,
      exclude: Option[org.apache.spark.sql.DataFrame] = None)
      : Map[String, (Boolean, Option[Long])] =
    BloomIndex.probe(spark, path, batch, "k", exclude).collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") ->
        ((r.getBoolean(2), if (r.isNullAt(1)) None else Some(r.getLong(1)))))
      .toMap

  private def newPath(): String =
    TempDirs.create("graft-bloomindex").resolve("idx").toString

  test("save → probe is exact: dups flagged with min standing id, new keys pass") {
    val path = newPath()
    BloomIndex.save(keysDf("alpha" -> 10L, "beta" -> 20L, "alpha" -> 7L),
      "k", "id", path, shards = 8, bitsPerShard = 1L << 10,
      itemsPerShard = 64L)
    val r = probeMap(path, keysDf("alpha" -> 100L, "gamma" -> 101L))
    assert(r("alpha") == ((true, Some(7L))),
      "standing key must flag with the SMALLEST standing id")
    assert(r("gamma") == ((false, None)), "a new key must pass")
  }

  test("probe is exact even with a fully saturated bloom (everything a candidate)") {
    val path = newPath()
    // 8 bits for 50 keys: the filter saturates, every probe key becomes a
    // verify candidate — cost degrades, answers must not
    val corpus = keysDf((1 to 50).map(i => (s"doc$i", i.toLong)): _*)
    BloomIndex.save(corpus, "k", "id", path, shards = 4,
      bitsPerShard = 8L, itemsPerShard = 4L)
    val r = probeMap(path, keysDf("doc7" -> 900L, "doc50" -> 901L,
      "brand-new" -> 902L, "also-new" -> 903L))
    assert(r("doc7") == ((true, Some(7L))))
    assert(r("doc50") == ((true, Some(50L))))
    assert(r("brand-new") == ((false, None)),
      "a bloom false positive must be absorbed by the ledger verify")
    assert(r("also-new") == ((false, None)))
    // the 8-bit budget word-aligns up to 64 bits inside the filter; the
    // point is that stats reads clearly worse than a roomy filter's ~0
    val fpp = BloomIndex.stats(spark, path).agg(max(col("est_fpp"))).head().getDouble(0)
    assert(fpp > 0.1, s"an 8-bit filter over 50 keys should read saturated, got $fpp")
  }

  test("append extends membership; re-appending the same batch is a no-op; compact folds generations") {
    val path = newPath()
    BloomIndex.save(keysDf("a" -> 1L), "k", "id", path, shards = 4,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    BloomIndex.append(keysDf("b" -> 2L, "c" -> 3L), "k", "id", path)
    BloomIndex.append(keysDf("b" -> 2L, "c" -> 3L), "k", "id", path) // replay
    val before = probeMap(path, keysDf("a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L))
    assert(before == Map(
      "a" -> ((true, Some(1L))), "b" -> ((true, Some(2L))),
      "c" -> ((true, Some(3L))), "d" -> ((false, None))))

    // one bloom row per touched shard per write: 1 (save) + ≥1 + ≥1
    val gensBefore = BloomIndex.stats(spark, path)
      .agg(sum(col("generations"))).head().getLong(0)
    assert(gensBefore >= 3, s"three writes should stack generation rows, got $gensBefore")
    BloomIndex.compact(spark, path)
    val gensAfter = BloomIndex.stats(spark, path)
      .agg(max(col("generations"))).head().getInt(0)
    assert(gensAfter == 1, s"compact must fold to one row per shard, got $gensAfter")
    assert(probeMap(path, keysDf("a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L))
      == before, "compaction must not change any answer")
  }

  test("excludeIds: the replay-idempotence hook suppresses a batch's own landed rows") {
    import spark.implicits._
    val path = newPath()
    BloomIndex.save(keysDf("standing" -> 1L), "k", "id", path, shards = 4,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    // a crashed night already appended this batch's rows…
    BloomIndex.append(keysDf("mine" -> 500L), "k", "id", path)
    // …the re-delivered batch must not drop "mine" as a dup of itself
    val r = probeMap(path, keysDf("mine" -> 500L, "standing" -> 501L),
      exclude = Some(Seq(500L).toDF("doc_id")))
    assert(r("mine") == ((false, None)),
      "a batch's own partially-appended rows must not self-drop on replay")
    assert(r("standing") == ((true, Some(1L))))
  }

  test("retraction: removeIds hides immediately, vacuum makes it physical, rebuildBlooms restores precision") {
    import spark.implicits._
    val path = newPath()
    BloomIndex.save(keysDf("gone" -> 11L, "stays" -> 12L), "k", "id", path,
      shards = 4, bitsPerShard = 1L << 10, itemsPerShard = 64L)
    BloomIndex.removeIds(spark, path, Seq(11L).toDF("id"))
    assert(probeMap(path, keysDf("gone" -> 90L, "stays" -> 91L)) == Map(
      "gone" -> ((false, None)), "stays" -> ((true, Some(12L)))),
      "a tombstoned id must stop matching before any rewrite")
    val removed = BloomIndex.vacuum(spark, path)
    assert(removed == 1L, s"vacuum must remove exactly the tombstoned row, got $removed")
    assert(probeMap(path, keysDf("gone" -> 90L))("gone") == ((false, None)))
    // the retracted key's bits persist until a rebuild; after rebuild the
    // index still answers identically (precision-only operation)
    BloomIndex.rebuildBlooms(spark, path)
    assert(probeMap(path, keysDf("gone" -> 90L, "stays" -> 91L)) == Map(
      "gone" -> ((false, None)), "stays" -> ((true, Some(12L)))))
    // re-admission after vacuum: the same content appends cleanly
    BloomIndex.append(keysDf("gone" -> 300L), "k", "id", path)
    assert(probeMap(path, keysDf("gone" -> 90L))("gone") == ((true, Some(300L))))
  }

  test("null keys are never duplicates (SQL null semantics), standing nulls never match") {
    val path = newPath()
    BloomIndex.save(keysDf(("present", 1L), (null, 2L)), "k", "id", path,
      shards = 4, bitsPerShard = 1L << 10, itemsPerShard = 64L)
    val r = probeMap(path, keysDf(("present", 50L), (null, 51L)))
    assert(r("present") == ((true, Some(1L))))
    assert(r("<null>") == ((false, None)),
      "null keys must never flag as duplicates")
  }

  test("fail fast: probing without a marker, and a ledger with no blooms") {
    import spark.implicits._
    val root = TempDirs.create("graft-bloomguard")
    val noMarker = root.resolve("nomarker").toString
    val e1 = intercept[IllegalArgumentException] {
      BloomIndex.probe(spark, noMarker, keysDf("x" -> 1L), "k")
    }
    assert(e1.getMessage.contains("marker"))

    val broken = root.resolve("broken").toString
    BloomIndex.save(keysDf("a" -> 1L), "k", "id", broken, shards = 2,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    // simulate the state that would produce FALSE NEGATIVES: keys present,
    // blooms gone — the probe must refuse rather than wave dups through
    val fs = new org.apache.hadoop.fs.Path(broken)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(broken + "/blooms"), true)
    val e2 = intercept[IllegalArgumentException] {
      BloomIndex.probe(spark, broken, keysDf("a" -> 1L), "k")
    }
    assert(e2.getMessage.contains("no bloom directory"))
    val _ = spark // silence unused-import pattern if implicits unused
  }

  test("a compact swap stranded mid-crash rolls forward from the probe funnel") {
    val path = newPath()
    BloomIndex.save(keysDf("a" -> 1L, "b" -> 2L), "k", "id", path,
      shards = 4, bitsPerShard = 1L << 10, itemsPerShard = 64L)
    // crash point between a compact swap's rename-aside and rename-in:
    // live blooms gone, committed content in blooms__compact behind the
    // ready marker — exactly what DirSwap.swap stages before renaming
    val blooms = new java.io.File(new java.net.URI("file://" + path + "/blooms"))
    val staged = new java.io.File(new java.net.URI(
      "file://" + path + "/blooms__compact"))
    assert(blooms.renameTo(staged), "test setup: stranding the swap")
    assert(new java.io.File(staged, "_graft_swap_ready").createNewFile())
    // the probe must roll the marked stage forward, not trip the
    // keys-without-blooms guard
    val r = probeMap(path, keysDf("a" -> 9L, "zz" -> 9L))
    assert(r == Map("a" -> ((true, Some(1L))), "zz" -> ((false, None))), r.toString)
    assert(blooms.exists() && !staged.exists(), "stage must be committed")
  }

  test("bootstrap crash windows: marker-only and blooms-without-keys states self-serve") {
    import spark.implicits._
    val root = TempDirs.create("graft-bloomcrash")
    // (a) crash after the marker, before any data (save is marker-first):
    // the index reads as EMPTY — every key new — and the nightly re-run's
    // exists() check routes to append, which heals it
    val p1 = root.resolve("markeronly").toString
    BloomIndex.save(keysDf("seed" -> 1L), "k", "id", p1, shards = 2,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    val fs = new org.apache.hadoop.fs.Path(p1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p1 + "/blooms"), true)
    fs.delete(new org.apache.hadoop.fs.Path(p1 + "/keys"), true)
    assert(probeMap(p1, keysDf("seed" -> 9L)) == Map("seed" -> ((false, None))),
      "a marker-only index must read as empty, not throw")
    BloomIndex.append(keysDf("seed" -> 1L), "k", "id", p1) // the heal
    assert(probeMap(p1, keysDf("seed" -> 9L)) == Map("seed" -> ((true, Some(1L)))))

    // (b) crash between the blooms and keys writes: candidates fail to
    // verify — a false-positive-only state, never a passed duplicate
    val p2 = root.resolve("bloomsonly").toString
    BloomIndex.save(keysDf("solo" -> 5L), "k", "id", p2, shards = 2,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    fs.delete(new org.apache.hadoop.fs.Path(p2 + "/keys"), true)
    assert(probeMap(p2, keysDf("solo" -> 9L)) == Map("solo" -> ((false, None))),
      "blooms-without-keys must answer not-dup via the failed verify")
    // stats/rebuild also tolerate the absent ledger
    assert(BloomIndex.stats(spark, p2).count() >= 1)
    BloomIndex.rebuildBlooms(spark, p2)
    assert(probeMap(p2, keysDf("solo" -> 9L)) == Map("solo" -> ((false, None))))
  }

  test("heavy vacuum traffic warns about stale bloom bits; rebuild silences and resets") {
    import spark.implicits._
    val path = newPath()
    BloomIndex.save(keysDf((1 to 10).map(i => (s"k$i", i.toLong)): _*),
      "k", "id", path, shards = 4, bitsPerShard = 1L << 10,
      itemsPerShard = 64L)
    BloomIndex.removeIds(spark, path, (1L to 6L).toDF("id"))
    val (removed, warns) = graft.core.Warn.capturing {
      BloomIndex.vacuum(spark, path)
    }
    assert(removed == 6L)
    assert(warns.exists(_.contains("stale")),
      s"60% stale share must warn, got: $warns")
    assert(BloomIndex.staleShare(spark, path) == 0.6)
    // stats carries the per-shard share (exact small counts here: the
    // merged cardinality still counts the vacuumed keys' bits)
    val maxStale = BloomIndex.stats(spark, path)
      .agg(max(col("stale_frac"))).head().getDouble(0)
    assert(maxStale > 0.0, "stats must expose the stale share per shard")
    BloomIndex.rebuildBlooms(spark, path)
    assert(BloomIndex.staleShare(spark, path) == 0.0,
      "rebuild must reset the stale share")
    val statsAfter = BloomIndex.stats(spark, path)
      .agg(max(col("stale_frac"))).head().getDouble(0)
    assert(statsAfter == 0.0,
      s"rebuilt blooms hold exactly the live ledger, got stale $statsAfter")
    // a small follow-up retraction stays under the threshold: no warn
    BloomIndex.removeIds(spark, path, Seq(7L).toDF("id"))
    val (_, quiet) = graft.core.Warn.capturing {
      BloomIndex.vacuum(spark, path)
    }
    assert(!quiet.exists(_.contains("stale")),
      s"a 25% share must not warn (threshold is exclusive), got: $quiet")
  }

  test("maintain: fold and ledger rewrite are fragmentation-gated; stale share triggers rebuild") {
    import spark.implicits._
    val path = newPath()
    BloomIndex.save(keysDf("a" -> 1L, "b" -> 2L), "k", "id", path,
      shards = 2, bitsPerShard = 1L << 10, itemsPerShard = 64L)
    BloomIndex.append(keysDf("c" -> 3L), "k", "id", path)
    // below both gates: generations (2 < 4) and ledger excess — nothing
    // rewrites, answers unchanged
    val (comp1, rebuilt1) = BloomIndex.maintain(spark, path,
      minFoldGenerations = 4L, ledgerMinExcessFiles = 100L)
    assert(!rebuilt1 && comp1.partitionsSelected == 0,
      s"gated maintenance must skip the ledger rewrite, got $comp1")
    val gens1 = BloomIndex.stats(spark, path)
      .agg(max(col("generations"))).head().getInt(0)
    assert(gens1 >= 2, s"the fold must be skipped below the gate, got $gens1")
    // two more appends reach the generation gate: the fold runs
    BloomIndex.append(keysDf("d" -> 4L), "k", "id", path)
    BloomIndex.append(keysDf("e" -> 5L), "k", "id", path)
    BloomIndex.maintain(spark, path, minFoldGenerations = 4L,
      ledgerMinExcessFiles = 100L)
    val gens2 = BloomIndex.stats(spark, path)
      .agg(max(col("generations"))).head().getInt(0)
    assert(gens2 == 1, s"reaching the gate must fold, got $gens2")
    assert(probeMap(path, keysDf("a" -> 9L, "e" -> 9L, "zz" -> 9L)) == Map(
      "a" -> ((true, Some(1L))), "e" -> ((true, Some(5L))),
      "zz" -> ((false, None))), "gated maintenance must not change answers")
    // heavy retraction: the stale share crosses the rebuild threshold and
    // maintain self-heals (vacuum + rebuild), then re-admission works
    BloomIndex.removeIds(spark, path, (1L to 4L).toDF("id"))
    val (_, rebuilt2) = BloomIndex.maintain(spark, path,
      minFoldGenerations = 4L, ledgerMinExcessFiles = 100L)
    assert(rebuilt2, "80% stale share must trigger the rebuild")
    assert(BloomIndex.staleShare(spark, path) == 0.0)
    assert(probeMap(path, keysDf("a" -> 9L, "e" -> 9L)) == Map(
      "a" -> ((false, None)), "e" -> ((true, Some(5L)))))
  }

  test("stats on a marker-only index reports ledger-only rows instead of throwing") {
    val path = newPath()
    BloomIndex.save(keysDf("x" -> 1L), "k", "id", path, shards = 2,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/blooms"), true)
    val rows = BloomIndex.stats(spark, path).collect()
    assert(rows.nonEmpty, "ledger-only health rows expected")
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("generations"))),
      "bloom-side stats must be null when the blooms dir is absent")
    assert(rows.map(_.getAs[Long]("ledger_rows")).sum == 1L)
  }

  test("vacuum on an index with no key ledger still clears pending tombstones") {
    import spark.implicits._
    val path = newPath()
    BloomIndex.save(keysDf("seed" -> 1L), "k", "id", path, shards = 2,
      bitsPerShard = 1L << 10, itemsPerShard = 64L)
    // the empty-bootstrap shape: blooms + marker present, keys dir absent
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/keys"), true)
    BloomIndex.removeIds(spark, path, Seq(42L).toDF("id"))
    assert(BloomIndex.vacuum(spark, path) == 0L)
    // the set must be GONE: a lingering tombstone would wrongly subtract
    // id 42 if it is legitimately appended later (re-admission)
    assert(graft.operators.Tombstones.read(spark, path).isEmpty,
      "vacuum must clear the tombstone set even with no ledger to rewrite")
    BloomIndex.append(keysDf("fresh" -> 42L), "k", "id", path)
    assert(probeMap(path, keysDf("fresh" -> 9L)) ==
      Map("fresh" -> ((true, Some(42L)))),
      "a later append of a once-tombstoned id must be probe-visible")
  }

  test("probe answers match a plain exact join on a randomized corpus/batch") {
    import spark.implicits._
    val path = newPath()
    // deterministic pseudo-random corpus: 300 keys, ids not in key order
    val corpus = (1 to 300)
      .map(i => (s"key-${(i * 2654435761L) % 997}", (1000 - i).toLong))
    val batch = (250 to 400).map(i => (s"key-${(i * 2654435761L) % 997}", 0L))
    BloomIndex.save(corpus.toDF("k", "id"), "k", "id", path, shards = 8,
      bitsPerShard = 1L << 12, itemsPerShard = 256L)
    val got = probeMap(path, batch.toDF("k", "id"))
    val standing = corpus.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map(_._2).min
    }
    batch.map(_._1).distinct.foreach { k =>
      standing.get(k) match {
        case Some(minId) => assert(got(k) == ((true, Some(minId))),
          s"$k should be a dup kept by $minId, got ${got(k)}")
        case None => assert(got(k) == ((false, None)),
          s"$k should be new, got ${got(k)}")
      }
    }
  }
}
