package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"), // near dup
      (4L, "completely different content entirely here now today")
    ).toDF("id", "text")
  }

  test("exactGroups collapses identical texts to min id") {
    val g = Dedup.exactGroups(docs, "id", "text").collect()
    assert(g.length == 3)
    val dupGroup = g.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 1L)
  }

  test("dropExactDuplicates keeps one row per distinct text") {
    val kept = Dedup.dropExactDuplicates(docs, "id", "text")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("wordShingles produces distinct k-shingles, short docs give one") {
    import spark.implicits._
    val d = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val sh = Dedup.wordShingles(d, "id", "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d"), (2L, "x y")))
  }

  test("minhashLshPairs finds exact and near dups, not unrelated docs") {
    // engine-native (single-digest) and portable (md5) hash families must
    // both pair the exact duplicate and never the unrelated doc
    for (portable <- Seq(false, true)) {
      val pairs = Dedup.minhashLshPairs(docs, "id", "text",
        shingleK = 3, numHashes = 8, bands = 4, portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"portable=$portable") // identical signature
      assert(!pairs.exists { case (a, b) => a == 4L || b == 4L },
        s"portable=$portable") // unrelated
    }
  }

  test("LshGuard warns at run time when the bucket space saturates") {
    import spark.implicits._
    import graft.core.LshGuard
    // the ScaleBench-measured failure mode in miniature: signBits=2 gives
    // only 4 buckets per band, 60 docs pile ~15 per bucket, the cap of 8
    // drops them ALL — pairs collapse to zero with no error
    val emb = (1L to 60L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 31.0 + j).toFloat).toArray))
      .toDF("id", "vec")
    LshGuard.clearObservations()
    val n = Dedup.embeddingNearDupPairs(emb, "id", "vec",
      threshold = -1.0, signBits = 2, bands = 1, maxBucket = 8).count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    val obs = LshGuard.observations.filter(_.caller == "embeddingNearDupPairs")
    assert(obs.nonEmpty, "the guard observed the bucket-size frame")
    assert(obs.exists(_.saturated), obs.mkString(","))
    // most of the corpus (one sub-cap bucket may survive) was silently
    // dropped from pairing — exactly the condition the warning names
    assert(obs.exists(_.droppedRowFrac > 0.8), obs.mkString(","))
    assert(n <= 28, s"cap suppressed nearly all of the ${60 * 59 / 2} possible pairs, got $n")

    // same guard on the minhash path (shared pairsFromBanded)
    LshGuard.clearObservations()
    val same = (1L to 30L).map(i => (i, "the quick brown fox jumps over the dog"))
      .toDF("id", "text")
    Dedup.minhashLshPairs(same, "id", "text", maxBucket = 4).count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    assert(LshGuard.observations.exists(o =>
      o.caller == "minhashLshPairs" && o.saturated))

    // the SKEW trigger: one giant bucket holds most docs while singletons
    // keep the mean low — dropped-row fraction must still raise the flag
    LshGuard.clearObservations()
    // sign pattern = the binary representation of the id: 100 singleton
    // buckets, plus one giant 120-doc bucket (pattern 255) holding the
    // majority of rows — mean (220/101 ≈ 2.2) stays far below cap/2=8
    def bitVec(n: Int): Array[Float] =
      (0 until 8).map(j => if (((n >> j) & 1) == 1) 1f else -1f).toArray
    val skewed = ((1L to 100L).map(i => (i, bitVec(i.toInt))) ++
      (101L to 220L).map(i => (i, bitVec(255))))
      .toDF("id", "vec")
    Dedup.embeddingNearDupPairs(skewed, "id", "vec",
      threshold = -1.0, signBits = 8, bands = 1, maxBucket = 16).count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    val skew = LshGuard.observations.filter(_.caller == "embeddingNearDupPairs")
    assert(skew.exists(o => o.saturated && o.meanSize <= o.cap / 2.0 &&
      o.droppedRowFrac > 0.5), skew.mkString(","))

    // a healthy configuration stays silent: observed, but not saturated
    // (signBits=4 × bands=2 fits the 8-dim vectors; 16 buckets/band holds
    // the 60 docs far below the 200 cap)
    LshGuard.clearObservations()
    Dedup.embeddingNearDupPairs(emb, "id", "vec",
      threshold = 0.95, signBits = 4, bands = 2, maxBucket = 200).count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    val healthy = LshGuard.observations.filter(_.caller == "embeddingNearDupPairs")
    assert(healthy.nonEmpty && !healthy.exists(_.saturated), healthy.mkString(","))
  }

  test("strict mode aborts the saturated configuration with an actionable message") {
    import spark.implicits._
    val emb = (1L to 60L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 31.0 + j).toFloat).toArray))
      .toDF("id", "vec")
    // saturated (4 buckets for 60 docs, cap 8): the caller's own action
    // must FAIL instead of returning silently-zeroed recall
    val ex = intercept[Exception] {
      Dedup.embeddingNearDupPairs(emb, "id", "vec", threshold = -1.0,
        signBits = 2, bands = 1, maxBucket = 8, strict = true).count()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("saturated"), chain)
    assert(chain.contains("raise the bucket space"), chain)
    // a healthy configuration under strict runs to completion with the
    // same result as the default mode
    val loose = Dedup.embeddingNearDupPairs(emb, "id", "vec",
      threshold = 0.95, signBits = 4, bands = 2, maxBucket = 200).count()
    val strictN = Dedup.embeddingNearDupPairs(emb, "id", "vec",
      threshold = 0.95, signBits = 4, bands = 2, maxBucket = 200,
      strict = true).count()
    assert(strictN == loose)
  }

  test("observations are keyed per session; unrelated executions cannot fragment them") {
    import spark.implicits._
    import graft.core.LshGuard
    val s2 = spark.newSession()
    LshGuard.clearObservations()
    val emb = (1L to 60L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 31.0 + j).toFloat).toArray))
      .toDF("id", "vec")
    Dedup.embeddingNearDupPairs(emb, "id", "vec", threshold = -1.0,
      signBits = 2, bands = 1, maxBucket = 8).count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    // the run was made on `spark`: its window sees it, a concurrent
    // session in the same JVM does not
    assert(LshGuard.observations(spark).exists(_.caller == "embeddingNearDupPairs"))
    assert(LshGuard.observations(s2).isEmpty)

    // fragmentation guard: an accumulator mid-fill (simulated by
    // driver-side adds — task updates not yet tied to any finished
    // execution) must NOT be read-and-reset by an UNRELATED query's
    // execution end; only its own execution's end evaluates it
    LshGuard.clearObservations()
    val banded = Dedup.embeddingBanded(emb, "id", "vec", signBits = 2, bands = 1)
    val pairs = Dedup.pairsFromBanded(banded, "id", maxBucket = 8,
      caller = "fragtest")
    val acc = LshGuard.accsFor("fragtest").head
    acc.add(5L); acc.add(7L)
    spark.range(10).count() // unrelated execution completes
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    assert(!LshGuard.observations.exists(_.caller == "fragtest"),
      "unrelated execution stole a fragment")
    assert(!acc.isZero, "partial stats were reset by an unrelated execution")
    acc.reset() // drop the simulated partial fill; observe the real run clean
    pairs.count()
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    val obs = LshGuard.observations.filter(_.caller == "fragtest")
    assert(obs.size == 1, obs.mkString(","))
    assert(obs.head.stats.nBuckets > 0)
  }

  test("minhashLshPairs maxBucket cap drops degenerate buckets; stats report them") {
    // cap of 1 excludes every bucket (pairs need >= 2 docs) → no pairs at all
    assert(Dedup.minhashLshPairs(docs, "id", "text", maxBucket = 1).count() == 0)
    // the histogram shows the dup bucket (size >= 2) the cap would drop
    val stats = Dedup.lshBucketStats(docs, "id", "text")
      .collect().map(r => (r.getAs[Long]("bucket_size"), r.getAs[Long]("n_buckets")))
    assert(stats.exists(_._1 >= 2L), stats.mkString(","))
  }

  test("uncapped LSH pair expansion warns; capped stays silent") {
    import graft.core.Warn
    // building the frame is enough — the footgun warning fires at call
    // time, before any job runs
    val (_, warns) = Warn.capturing {
      Dedup.minhashLshPairs(docs, "id", "text")
      Dedup.embeddingNearDupPairs(
        docs.select(col("id"), array(lit(1f), lit(-1f), lit(1f), lit(1f),
          lit(-1f), lit(1f), lit(1f), lit(1f)).as("emb")),
        "id", "emb", signBits = 8)
    }
    assert(warns.length == 2 && warns.forall(_.contains("uncapped")), warns.mkString("; "))
    val (_, silent) = Warn.capturing {
      Dedup.minhashLshPairs(docs, "id", "text", maxBucket = 200)
    }
    assert(silent.isEmpty)
  }

  test("minhashLshWithStats: pairs and audit share one persisted banded frame") {
    import graft.core.Caches
    Caches.releaseAll()
    val before = {
      // the signature pipeline tracks its own shingle cache — measure the
      // combined entry point's ADDITIONAL tracked frame against it
      Dedup.minhashLshPairs(docs, "id", "text", maxBucket = 200)
      Caches.trackedCount
    }
    Caches.releaseAll()
    val (pairs, stats) = Dedup.minhashLshWithStats(docs, "id", "text",
      shingleK = 3, numHashes = 8, bands = 4, maxBucket = 200)
    assert(Caches.trackedCount == before + 1,
      s"exactly one shared banded frame must be tracked on top of the $before pipeline-internal")
    // both outputs read the persisted frame instead of re-running the
    // shingle/minhash pipeline
    assert(pairs.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    assert(stats.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    // same results as the standalone entry points
    val lonePairs = Dedup.minhashLshPairs(docs, "id", "text",
      shingleK = 3, numHashes = 8, bands = 4, maxBucket = 200)
      .collect().map(_.toSeq).toSet
    assert(pairs.collect().map(_.toSeq).toSet == lonePairs)
    val loneStats = Dedup.lshBucketStats(docs, "id", "text")
      .collect().map(_.toSeq).toSet
    assert(stats.collect().map(_.toSeq).toSet == loneStats)
    Caches.releaseAll()
  }

  test("simhashPortable: identical docs share the hash; hamming to near dup is small") {
    val sh = Dedup.simhashPortable(docs, "id", "text", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
    import spark.implicits._
    val ham = Seq((sh(1L), sh(3L)), (sh(1L), sh(4L))).toDF("a", "b")
      .select(Dedup.hammingBits(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(ham(0) < ham(1)) // near dup closer than unrelated
  }

  test("ngramJaccardPairs scores exact dup at 1.0 above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "id", "text",
      k = 3, threshold = 0.5, maxShingleDf = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("dupClusters resolves transitive chains to min-id components") {
    import spark.implicits._
    // chain 1-2-3 plus pair 10-11; isolated ids absent (not in any pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // driver union-find path
    val viaDriver = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == expect)
    // distributed pointer-doubling path (force it with limit 0)
    val viaDist = Dedup.dupClusters(pairs, driverPairLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDist == expect)
    // long chain exercises pointer doubling past naive hop-per-round
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(chain, driverPairLimit = 0L).collect()
    assert(got.forall(_.getLong(1) == 1L) && got.length == 40)
  }

  test("embeddingNearDupPairs: same-bucket high-cosine pairs only") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, 0.5f, 0.1f)),
      (2L, Array(0.5f, 0.5f, 0.1f)),     // identical → cosine 1
      (3L, Array(0.5f, 0.5f, 0.11f)),    // near dup, same signs
      (4L, Array(-0.5f, 0.5f, 0.1f))     // different bucket
    ).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "id", "vec",
      threshold = 0.95, signBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("embeddingNearDupPairs: extra bands recover pairs a single band misses") {
    import spark.implicits._
    // dim 0 sign differs (band 0 separates them) but dims 3-5 agree (band 1
    // buckets them together); cosine is still ~0.9999
    val vecs = Seq(
      (1L, Array(0.01f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Array(-0.01f, 1f, 1f, 1f, 1f, 1f))
    ).toDF("id", "vec")
    val oneBand = Dedup.embeddingNearDupPairs(vecs, "id", "vec",
      threshold = 0.95, signBits = 3, bands = 1).count()
    assert(oneBand == 0, "band 0 alone must separate the sign-flipped pair")
    val twoBands = Dedup.embeddingNearDupPairs(vecs, "id", "vec",
      threshold = 0.95, signBits = 3, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoBands == Set((1L, 2L)), "band 1 must recover the pair")
  }

  test("embeddingNearDupPairs: maxBucket drops degenerate buckets") {
    import spark.implicits._
    val vecs = (1L to 10L).map(i => (i, Array(0.5f, 0.5f, 0.1f))).toDF("id", "vec")
    assert(Dedup.embeddingNearDupPairs(vecs, "id", "vec",
      threshold = 0.9, signBits = 3, maxBucket = 5).count() == 0)
    assert(Dedup.embeddingNearDupPairs(vecs, "id", "vec",
      threshold = 0.9, signBits = 3, maxBucket = 10).count() == 45)
  }

  test("containmentPairs flags probe docs copied from the corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark execution engines")
    ).toDF("id", "text")
    val probe = Seq(
      (100L, "quick brown fox jumps over the lazy dog"), // substring of doc 1
      (200L, "unrelated evaluation sentence with novel words")
    ).toDF("id", "text")
    val out = Dedup.containmentPairs(corpus, probe, "id", "text",
        k = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment")))
    assert(out.toSeq == Seq((1L, 100L, 1.0))) // fully contained; 200 clean
    // the df cutoff drops ubiquitous shingles before the join
    val capped = Dedup.containmentPairs(corpus, probe, "id", "text",
      k = 3, minOverlap = 2, maxShingleDf = 0)
    assert(capped.count() == 0)
  }

  test("contaminationGate fails loudly on a null-id batch doc, even zero-token") {
    import spark.implicits._
    val evalSet = Seq((900L, "quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    // the anti-join algebra cannot gate a null key: a flagged null-id doc
    // would both ledger as contaminated AND land — the gate-door guard
    // fails the job instead, including for zero-token docs the shingle
    // path never sees
    val nullId = Seq((Some(1L), "clean distinct words"), (None, "  "))
      .toDF("id", "text")
    val e = intercept[Exception] {
      Dedup.contaminationGate(nullId, evalSet, "id", "text", k = 3)._1.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null-id document")), e.getMessage)
  }

  test("decontaminate drops only the containing docs; corpus side broadcasts") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark execution engines"),
      (3L, "another clean document holding its own distinct words only")
    ).toDF("id", "text")
    val probe = Seq(
      (100L, "quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val kept = Dedup.decontaminate(corpus, probe, "id", "text",
      k = 3, minOverlap = 2, minContainment = 0.8)
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
    // the >= boundary: doc 1's containment is exactly 1.0, so the maximal
    // threshold still drops it (and only it)
    assert(Dedup.decontaminate(corpus, probe, "id", "text",
      k = 3, minOverlap = 2, minContainment = 1.0).count() == 2)
    // a genuinely unreachable threshold via minOverlap keeps everything:
    // no pair reaches 9 shared rare shingles, so nothing is flagged
    assert(Dedup.decontaminate(corpus, probe, "id", "text",
      k = 3, minOverlap = 9, minContainment = 1.0).count() == 3)
    // the corpus is filtered by a BROADCAST anti-join, never reshuffled
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"), plan)
  }

  test("trainTestSplit is deterministic and proportionally sane") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 1000L).toDF("id")
    val s1 = Sampling.trainTestSplit(df, "id", 80).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val s2 = Sampling.trainTestSplit(df, "id", 80).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(s1 == s2) // reproducible across runs
    val trainFrac = s1.values.count(_ == "train").toDouble / s1.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    val sampled = Sampling.deterministicSample(df, "id", 20).count()
    assert(sampled > 100 && sampled < 300, s"20% sample gave $sampled of 1000")
  }

  test("stratifiedSample keeps per-stratum fractions; unlisted strata keep all") {
    import spark.implicits._
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val df = (0L until 3000L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "grp")
    val out = Sampling.stratifiedSample(df, "id", col("grp"), Map("a" -> 10, "b" -> 50))
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("c") == 1000L, "unlisted stratum keeps everything")
    assert(out("a") > 50 && out("a") < 200, s"10% stratum gave ${out("a")} of 1000")
    assert(out("b") > 400 && out("b") < 600, s"50% stratum gave ${out("b")} of 1000")
    // deterministic: same rows every run
    assert(Sampling.stratifiedSample(df, "id", col("grp"), Map("a" -> 10, "b" -> 50))
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap == out)
  }

  test("leakageSafeSplit: exact duplicates never straddle train/test") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = ((0L until 200L).map(i => (i, s"text body number ${i % 50}")))
      .toDF("doc_id", "text") // 4 exact copies of each of 50 texts
    val out = Sampling.leakageSafeSplit(docs, "doc_id", "text", 80)
    assert(out.count() == 200)
    val splitsPerText = out.groupBy("canonical_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("n"))
      .collect().map(_.getLong(1))
    assert(splitsPerText.forall(_ == 1L), "a dup group must land in ONE split")
    // canonical id is the min doc_id of the group
    val canon = out.filter($"doc_id" === 137L).head().getAs[Long]("canonical_id")
    assert(canon == 37L)
    // null-text rows form their own group and are still split, not dropped
    val withNull = docs.unionByName(
      Seq((900L, null.asInstanceOf[String]), (901L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val outN = Sampling.leakageSafeSplit(withNull, "doc_id", "text", 80)
    assert(outN.count() == 202)
    assert(outN.filter($"doc_id" >= 900L).select("canonical_id").distinct().count() == 1)
  }

  test("kmeansCentroids converges to cluster directions; ivfTopK accepts them") {
    import spark.implicits._
    import graft.operators.Similarity
    // two tight angular clusters: near x-axis (ids 0-9), near y-axis (10-19)
    val corpus = (0L until 20L).map { i =>
      val jitter = (i % 10).toFloat / 100f
      if (i < 10) (i, Array(1.0f, jitter)) else (i, Array(jitter, 1.0f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      k = 2, iterations = 3)
    val got = cents.orderBy("cent_id").collect()
      .map(r => r.getSeq[Long](1).toArray)
    assert(got.length == 2)
    // one centroid dominated by x, the other by y (quantized longs)
    assert(got.exists(c => c(0) > c(1) * 5) && got.exists(c => c(1) > c(0) * 5),
      got.map(_.mkString("[", ",", "]")).mkString(" "))
    // deterministic across runs
    val again = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      k = 2, iterations = 3).orderBy("cent_id").collect().map(_.getSeq[Long](1).toArray)
    assert(got.zip(again).forall { case (a, b) => a.sameElements(b) })
    // the IVF skeleton accepts the adaptive centroids: same-cluster
    // neighbors rank first for an x-cluster query
    val top = Similarity.ivfTopK(
        corpus.filter($"vec_id" === 0L), corpus, "vec_id", "vec_id",
        "embedding", "embedding", k = 3, centroids = Some(cents))
      .orderBy("rank").collect().map(_.getLong(1))
    assert(top.forall(_ < 10L), s"x-cluster query must stay in its cell: ${top.toSeq}")
  }

  test("ANN re-rank handles non-numeric ids via the window fallback") {
    import spark.implicits._
    import graft.operators.Similarity
    val corpus = Seq(
      ("doc-a", Array(1.0f, 0.05f)), ("doc-b", Array(0.9f, 0.1f)),
      ("doc-c", Array(0.8f, 0.2f)))
      .toDF("doc_uuid", "embedding")
    val top = Similarity.signLshTopK(
        corpus.filter($"doc_uuid" === "doc-a"), corpus,
        "doc_uuid", "doc_uuid", "embedding", "embedding", k = 2, bits = 2)
      .orderBy("rank").collect()
    assert(top.forall(r => r.getString(1) != null), "string ids must survive")
    assert(top.map(_.getString(1)).toSeq == Seq("doc-b", "doc-c"))
  }

  test("signBucket fails fast when the vector is shorter than offset+bits") {
    import spark.implicits._
    // 4-dim vectors with an 8-bit bucket: ANSI-off element_at would silently
    // zero the missing bits and funnel every vector into one bucket
    val d = Seq((1L, Array(1f, -1f, 1f, 1f))).toDF("id", "emb")
    val ex = intercept[Exception] {
      d.select(Similarity.signBucket(col("emb"), bits = 8)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("signBucket")), messages(ex).mkString("; "))
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 1.0f))
    ).toDF("id", "vec")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val out = Similarity.bruteForceTopK(queries, corpus, "id", "id", "vec", "vec", 2)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(out == Seq(10L, 11L))
  }

  test("probeBandedPairs: exact cross-pair parity with the full recompute, including the cap") {
    import spark.implicits._
    // 12 identical corpus docs + 5 identical batch docs: the shared bucket
    // holds 17 COMBINED members, over a cap of 16 though each side alone is
    // under it — parity requires the probe to count combined membership,
    // exactly as the full recompute's cap does
    val corpus = ((1L to 12L).map(i => (i, "same text here repeated exactly word")) ++
      Seq((21L, "the quick brown fox jumps over the lazy dog"),
          (22L, "totally unrelated content nothing shared at all"))).toDF("id", "text")
    val batch = ((101L to 105L).map(i => (i, "same text here repeated exactly word")) ++
      Seq((106L, "the quick brown fox jumps over the lazy cat"))).toDF("id", "text")
    for (cap <- Seq(16, 200)) {
      val probe = Dedup.minhashProbePairs(corpus, batch, "id", "text",
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Dedup.minhashLshPairs(corpus.union(batch), "id", "text",
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cross = full.filter { case (a, b) => (a <= 22L) != (b <= 22L) }
      assert(probe == cross, s"cap=$cap")
      if (cap == 200)
        assert(probe.nonEmpty, "uncapped run must surface the identical-text cross pairs")
      else
        assert(!probe.exists { case (a, b) => a <= 12L && b >= 101L && b <= 105L },
          "the over-cap combined bucket must be dropped")
    }
  }

  test("probeBandedPairs prunes the corpus index with a broadcast semi-join") {
    import spark.implicits._
    val corpusBanded = Dedup.lshBanded(docs, "id", "text", 3, 8, 4)
    val batchBanded = Dedup.lshBanded(
      Seq((101L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"),
      "id", "text", 3, 8, 4)
    val probe = Dedup.probeBandedPairs(corpusBanded, batchBanded, "id", maxBucket = 200)
    val plan = probe.queryExecution.executedPlan.toString
    // the corpus index must never shuffle on (band, bucket) to be pruned:
    // the batch's bucket set arrives broadcast, as a LeftSemi build side
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  // ---- SemDeDup (within-k-means-cell semantic duplicates) ----

  test("semanticDupPairs: within-cell high-cosine pairs; semanticDedup keeps min ids") {
    import spark.implicits._
    // seeds are the two smallest ids: 1 points along x, 2 along y; 3 is a
    // near-copy of 1, 4 a near-copy of 2, 5 sits between (cos ≈ 0.71 to
    // both axes — same cells, below threshold)
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0f, 0f)),
      (2L, Array(0f, 1.0f, 0f, 0f)),
      (3L, Array(0.99f, 0.012f, 0f, 0f)),
      (4L, Array(0.01f, 0.99f, 0f, 0f)),
      (5L, Array(0.7f, 0.7f, 0f, 0f))
    ).toDF("id", "vec")
    val pairs = Dedup.semanticDupPairs(vecs, "id", "vec",
        threshold = 0.95, numCells = 2, iterations = 2, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 4L)), pairs.toString)
    val kept = Dedup.semanticDedup(vecs, "id", "vec",
        threshold = 0.95, numCells = 2, iterations = 2, maxBucket = 100)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 5L), kept.toString)
  }

  // ---- exact-substring dedup (duplicated k-token spans) ----

  private def spanDocs = {
    import spark.implicits._
    // "a b c" occurs in all three; doc1 additionally continues "d e"
    Seq((1L, "a b c d e"), (2L, "x a b c y"), (3L, "a b c"))
      .toDF("id", "text")
  }

  test("duplicateGrams: one shared 3-token span across three docs") {
    val g = Dedup.duplicateGrams(spanDocs, "id", "text", k = 3).collect()
    assert(g.length == 1)
    assert(g(0).getString(0) == "a b c")
    assert(g(0).getLong(1) == 3L && g(0).getLong(2) == 3L)
  }

  test("removeDuplicateSpans keeps the smallest (id, pos) occurrence") {
    val out = Dedup.removeDuplicateSpans(spanDocs, "id", "text", k = 3)
      .select("id", "clean_text", "removed_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // winner window is (1, 0): doc 1 untouched VERBATIM; doc 2 loses
    // tokens 1..3; doc 3 loses everything (its only window duplicates)
    assert(out.toSeq == Seq(
      (1L, "a b c d e", 0L), (2L, "x y", 3L), (3L, "", 3L)))
  }

  test("removeDuplicateSpans keepOne=false shreds every occurrence") {
    val out = Dedup.removeDuplicateSpans(spanDocs, "id", "text",
        k = 3, keepOne = false)
      .select("id", "clean_text", "removed_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "d e", 3L), (2L, "x y", 3L), (3L, "", 3L)))
  }

  test("removeDuplicateSpans merges overlapping in-document repeats") {
    import spark.implicits._
    // "p q r s" repeats within ONE doc: windows (p q r)@0,4 and (q r s)@1,5
    // duplicate; winners are positions 0 and 1, cuts {4, 5} cover tokens
    // 4..7 as one merged region
    val d = Seq((4L, "p q r s p q r s")).toDF("id", "text")
    val r = Dedup.removeDuplicateSpans(d, "id", "text", k = 3)
      .select("clean_text", "removed_tokens").head()
    assert(r.getString(0) == "p q r s" && r.getLong(1) == 4L)
  }

  test("removeDuplicateSpans: lowercase matching, original-case rebuild") {
    import spark.implicits._
    val d = Seq((1L, "A B C"), (2L, "a b c")).toDF("id", "text")
    // case-sensitive default: nothing duplicates
    val strict = Dedup.removeDuplicateSpans(d, "id", "text", k = 3)
      .agg(sum("removed_tokens")).head().getLong(0)
    assert(strict == 0L)
    // lowercase matching: doc 1 wins, doc 2 is cut; doc 1 keeps its CASE
    val loose = Dedup.removeDuplicateSpans(d, "id", "text", k = 3,
        lowercase = true)
      .select("id", "clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(loose.toSeq == Seq((1L, "A B C"), (2L, "")))
  }

  test("removeDuplicateSpans: packed and unpacked keepers agree; out-of-domain ids fail fast") {
    import spark.implicits._
    val packed = Dedup.removeDuplicateSpans(spanDocs, "id", "text", k = 3)
      .select("id", "clean_text", "removed_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val unpacked = Dedup.removeDuplicateSpans(spanDocs, "id", "text", k = 3,
        packedKeeper = false)
      .select("id", "clean_text", "removed_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(packed.toSeq == unpacked.toSeq)
    // a content-hash-style id (negative long) must fail fast with the
    // actionable message, and packedKeeper = false must accept it
    val hashy = Seq((-8702723549136498523L, "a b c"), (7L, "a b c"))
      .toDF("id", "text")
    // collect, not count: a count-only plan can prune the packed column
    // out of the keeper before the guard row is ever evaluated
    val e = intercept[Exception] {
      Dedup.removeDuplicateSpans(hashy, "id", "text", k = 3).collect()
    }
    assert(e.getMessage.contains("packedKeeper"), e.getMessage)
    val ok = Dedup.removeDuplicateSpans(hashy, "id", "text", k = 3,
        packedKeeper = false)
      .select("id", "clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // the negative id is the smaller (id, pos): it wins, doc 7 is cut
    assert(ok.toSeq == Seq((-8702723549136498523L, "a b c"), (7L, "")))
  }

  test("removeDuplicateSpans passes short and empty docs through verbatim") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, ""), (3L, "a b c d e"), (4L, "a b c d e"))
      .toDF("id", "text")
    val out = Dedup.removeDuplicateSpans(d, "id", "text", k = 3)
      .select("id", "clean_text", "removed_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a b", 0L), (2L, "", 0L),
      (3L, "a b c d e", 0L), (4L, "", 5L)))
  }
}
