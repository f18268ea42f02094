package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.merge.Upsert
import graft.ops.Cdc

/**
 * Property tests for the merge/dedup/interval invariants. Uses scalacheck
 * generators with explicit seeds (deterministic, no scalatestplus bridge in
 * the offline cache); each case spins tiny Spark jobs so the sample count
 * is capped.
 */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val kvGen: Gen[List[(Int, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 8), Gen.alphaStr.map(_.take(4))))

  test("merge invariants: row accounting matches result size; keys unique") {
    import spark.implicits._
    samples(Gen.zip(kvGen, kvGen), 5).foreach { case (t, s) =>
      val target = t.toMap.toSeq.toDF("k", "v") // unique keys
      val source = s.toMap.toSeq.toDF("k", "v")
      val r = Upsert.merge(target, source, Seq("k"),
        deleteNotMatchedBySource = Some(lit(true)))
      val nT = target.count(); val nS = source.count()
      assert(r.inserted + r.updated == nS,
        s"inserted=${r.inserted} updated=${r.updated} source=$nS")
      assert(r.updated + r.deleted == nT,
        s"updated=${r.updated} deleted=${r.deleted} target=$nT")
      assert(r.result.count() == nT - r.deleted + r.inserted)
      assert(r.result.select("k").distinct().count() == r.result.count())
    }
  }

  test("latestVersion: exactly one row per key, and it is the max version") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4), Gen.choose(0, 100)))
    samples(gen, 5).foreach { rows =>
      val df = rows.toDF("k", "ver")
      val out = Cdc.latestVersion(df, Seq("k"), Seq(col("ver").desc))
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got == expect)
    }
  }

  test("effectiveIntervals: per key ordered, chained minus gap, sentinel last") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 100000L)))
    samples(gen, 5).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, ms), i) => (k, new java.sql.Timestamp(ms * 60000L), i) }
        .toDF("k", "ts", "seq")
      val out = Cdc.effectiveIntervals(df, Seq("k"), "ts", Seq(col("seq").asc))
        .select("k", "eff_dt", "exp_dt").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1), r.getTimestamp(2)))
      out.groupBy(_._1).values.foreach { iv =>
        val sorted = iv.sortBy(_._2.getTime)
        sorted.sliding(2).foreach {
          case Array((_, _, exp), (_, eff2, _)) =>
            // next interval starts 1 minute after this one expires
            // (duplicate timestamps make exp land at or before eff2 - gap)
            assert(exp.getTime <= eff2.getTime - 60000L ||
              exp.getTime == eff2.getTime - 60000L,
              s"exp=$exp eff2=$eff2")
          case _ =>
        }
        assert(sorted.last._3.getTime ==
          java.sql.Timestamp.valueOf("9999-12-31 00:00:00").getTime)
      }
    }
  }

  test("probeBandedPairs ≡ full recompute's cross subset on random corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // docs over a tiny vocab so shingle collisions (and thus shared LSH
    // buckets) actually occur; corpus ids < 1000, batch ids >= 1000
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val docsGen = Gen.listOfN(8, doc)
    samples(Gen.zip(docsGen, docsGen), 4).foreach { case (c, b) =>
      val corpus = c.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val batch = b.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("id", "text")
      def banded(df: org.apache.spark.sql.DataFrame) =
        Dedup.lshBanded(df, "id", "text", shingleK = 2, numHashes = 6, bands = 3)
      val probed = Dedup.probeBandedPairs(banded(corpus), banded(batch),
          "id", maxBucket = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Dedup.pairsFromBanded(
          banded(corpus.union(batch)), "id", maxBucket = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cross = full.filter { case (a, bb) => (a >= 1000L) != (bb >= 1000L) }
      assert(probed == cross,
        s"probe=$probed cross=$cross corpus=$c batch=$b")
    }
  }

  test("chunk: stride=size reconstructs; any stride covers every char in order") {
    import spark.implicits._
    val textGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val geomGen = Gen.zip(Gen.choose(1, 12), Gen.choose(1, 12))
      .map { case (sz, st) => (sz, math.min(st, sz)) }
    samples(Gen.zip(textGen, geomGen), 8).foreach { case (text, (size, stride)) =>
      val chunks = graft.operators.Chunking.chunk(
          Seq((1L, text)).toDF("doc_id", "text"), "text", size, stride)
        .orderBy("chunk_id").collect()
        .map(r => (r.getAs[Int]("chunk_start"), r.getAs[String]("chunk_text")))
      // exact tiling reconstructs the text
      if (stride == size)
        assert(chunks.map(_._2).mkString == text, s"size=$size text='$text'")
      // every chunk is the substring its start claims; consecutive starts
      // advance by stride; the windows cover the full length
      chunks.foreach { case (start, ct) =>
        assert(ct == text.slice(start - 1, start - 1 + size)) }
      assert(chunks.map(_._1).toSeq ==
        chunks.indices.map(i => i * stride + 1))
      assert(chunks.last._1 - 1 + size >= text.length)
    }
  }

  test("packShards: offsets are the prefix sums of tokens in key order") {
    import spark.implicits._
    val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(1L, 30L)))
      .map(_.toMap.toSeq) // unique keys
    samples(Gen.zip(rowsGen, Gen.choose(5L, 60L)), 6).foreach {
      case (rows, budget) =>
        if (rows.nonEmpty) {
          val packed = graft.operators.Packing.packShards(
              rows.toDF("k", "tok"), "k", "tok", budget, buckets = 4)
            .orderBy("k").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          val expectOffsets = rows.sortBy(_._1)
            .scanLeft(0L)(_ + _._2).dropRight(1)
          assert(packed.map(_._3).toSeq == expectOffsets, s"rows=$rows")
          packed.foreach { case (_, _, off, shard) =>
            assert(shard == off / budget) }
        }
    }
  }

  test("PQ probe with all-covering re-rank ≡ brute force on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(4, Gen.choose(-5, 5).map(_.toFloat / 5f))
    val corpusGen = Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, vecGen))
    samples(corpusGen, 3).zipWithIndex.foreach { case (vecs, i) =>
      // skip zero-norm rows up front — brute force cannot rank them either
      val rows = vecs.zipWithIndex.collect {
        case (v, id) if v.exists(_ != 0f) => (id.toLong, v)
      }
      val c = rows.toDF("vec_id", "embedding")
      val path = TempDirs.create(s"graft-pq-prop$i").resolve("idx").toString
      graft.operators.PqIndex.save(c, "vec_id", "embedding", path,
        m = 2, ksub = 2, iterations = 1)
      val q = c.limit(2)
      val got = graft.operators.PqIndex.probe(spark, path, q, "vec_id",
          "embedding", candidates = rows.size,
          rerank = Some((c, "vec_id", "embedding")), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = graft.operators.Similarity.bruteForceTopKAgg(q, c, "vec_id",
          "vec_id", "embedding", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"vectors=$rows")
    }
  }

  test("WorkingDaysBetween.compute matches brute force on random epoch days") {
    // pure JVM closed form — no Spark jobs, so the sample count can be large
    val dayGen = Gen.choose(18000, 23000) // ~2019..2032
    val spanGen = Gen.choose(-10, 400)
    samples(Gen.zip(dayGen, spanGen), 500).foreach { case (s, span) =>
      val e = s + span
      def brute(s: Int, e: Int): Long =
        (s to e).count { d =>
          val dow = java.time.LocalDate.ofEpochDay(d.toLong).getDayOfWeek.getValue
          dow <= 5
        }.toLong
      val expect = if (e < s) 0L else brute(s, e)
      val got = graft.plans.WorkingDaysBetween.compute(s, e)
      assert(got == expect, s"epoch days [$s,$e]: got $got want $expect")
    }
  }

  test("removeDuplicateSpans: packed ≡ three-pass keeper on random corpora; token accounting") {
    import spark.implicits._
    import graft.operators.Dedup
    // tiny vocab so k-gram repeats are common; both keepers must pick the
    // identical lexicographic-min winner and cut the identical spans —
    // the documented equivalence the packed fold rides on, checked here
    // on corpora no one hand-picked
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(doc).map(_.take(6))
    samples(Gen.zip(corpusGen, Gen.choose(2, 3)), 6).foreach {
      case (docs, k) =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
        def run(packed: Boolean): Seq[(Long, String, Long)] =
          Dedup.removeDuplicateSpans(df, "id", "text", k = k,
              packedKeeper = packed)
            .select("id", "clean_text", "removed_tokens").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            .sortBy(_._1).toSeq
        val p = run(packed = true)
        assert(p == run(packed = false), s"k=$k docs=$docs")
        // token accounting: removed_tokens is exactly the per-doc token
        // count delta, and cleaned docs never gain tokens
        p.foreach { case (id, clean, removed) =>
          val orig = docs(id.toInt).split("\\s+").count(_.nonEmpty)
          val kept = clean.split("\\s+").count(_.nonEmpty)
          assert(removed == orig - kept,
            s"doc $id: $orig -> $kept but removed=$removed (k=$k)")
        }
    }
  }

  test("sketch merged stats equal exact aggregation on random small-cardinality corpora") {
    import spark.implicits._
    import graft.operators.Sketches
    // q95's oracle hash-match rides on HLL being EXACT below the coupon
    // threshold; this property checks the whole night-split → union path
    // against the exact aggregation on corpora no one hand-picked, with
    // per-group cardinalities up to ~100 (well inside coupon range but an
    // order past what the oracle table exercises)
    val row = Gen.zip(Gen.choose(0, 2), Gen.choose(0, 99), Gen.choose(1, 9))
    val gen = Gen.zip(Gen.nonEmptyListOf(row).map(_.take(300)),
      Gen.choose(1, 4))
    samples(gen, 5).foreach { case (rows, nights) =>
      val path = TempDirs.create("graft-prop-sketch").resolve("s").toString
      val spec = Sketches.SketchSpec(Seq("grp"),
        distinctCols = Seq("src"), sumCols = Seq("v"))
      val df = rows.zipWithIndex.map { case ((g, s, v), i) =>
        (i % nights, s"g$g", s"s$s", v.toLong)
      }.toDF("night", "grp", "src", "v")
      (0 until nights).foreach(k => Sketches.appendNight(
        df.filter(col("night") === k).drop("night"), spec, path, s"n$k"))
      val got = Sketches.mergedStats(spark, path, spec).orderBy("grp")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val want = df.groupBy("grp").agg(count(lit(1)), sum(col("v")),
          count_distinct(col("src"))).orderBy("grp")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == want, s"nights=$nights rows=${rows.size}")
    }
  }
}
