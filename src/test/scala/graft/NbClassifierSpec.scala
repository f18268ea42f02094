package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NbClassifier

/**
 * Seed-supervised Naive-Bayes quality classifier (the GPT-3 curation
 * discipline): the smoothed log-odds algebra against a hand-computed
 * fixture, the vocabulary-pruning contract, the deterministic Pareto keep
 * rule, and the scale properties — scoring must not plan a cartesian
 * product or a window, and the model round-trips through parquet.
 */
class NbClassifierSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // seeds: counts good->(2,0), text->(1,1), bad->(0,1);
  // t_pos=3, t_neg=2, V=3, n_pos=n_neg=1 (prior ln 1 = 0), alpha=0.5
  private val pos = docs(1L -> "good good text")
  private val neg = docs(2L -> "bad text")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def lr(cPos: Double, cNeg: Double): Double =
    math.log((cPos + 0.5) / (3.0 + 0.5 * 3)) -
      math.log((cNeg + 0.5) / (2.0 + 0.5 * 3))

  test("log-odds matches the hand-computed smoothed algebra") {
    val m = NbClassifier.train(pos, neg, "doc_id", "text")
    val scored = NbClassifier.logOdds(docs(
        10L -> "good bad z", 11L -> "good", 12L -> "  "), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scored(10L) ===
      ((3L, r6(lr(2, 0) + lr(0, 1) + lr(0, 0)))))
    assert(scored(11L) === ((1L, r6(lr(2, 0)))))
    assert(!scored.contains(12L), "whitespace-only docs carry no tokens")
  }

  test("class prior is the seed doc-count ratio") {
    // 2 pos docs vs 1 neg: prior = ln 2 shifts every score
    val m = NbClassifier.train(
      docs(1L -> "good good text", 3L -> ""), neg, "doc_id", "text")
    val h = NbClassifier.logOdds(docs(20L -> "good"), "doc_id", "text", m)
      .collect().head.getDouble(2)
    assert(h === r6(math.log(2.0) + lr(2, 0)))
  }

  test("prune drops rare token rows but keeps the trained totals") {
    val m = NbClassifier.train(pos, neg, "doc_id", "text").prune(2)
    // good (2+0) and text (1+1) survive; bad (0+1) is pruned
    assert(m.tokenCounts.count() === 2)
    val h = NbClassifier.logOdds(docs(30L -> "bad"), "doc_id", "text", m)
      .collect().head.getDouble(2)
    assert(h === r6(lr(0, 0)), "pruned token scores as unseen")
  }

  test("pareto keep applies the documented rule and is deterministic") {
    import spark.implicits._
    val scored = Seq((1L, 3.0), (2L, -8.0), (3L, 0.5), (4L, -2.0),
      (5L, 9.0), (6L, -9.0), (7L, 1.5))
      .toDF("doc_id", "log_odds")
    val kept = NbClassifier.paretoKeep(scored, "doc_id")
      .select("doc_id", "keep_p", "noise").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // re-derive the rule in plain Scala from the same md5 seed
    def draw(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = Integer.parseInt(hex.take(4), 16) / 65536.0
      r6(math.pow(1.0 - u, -1.0 / 9.0) - 1.0)
    }
    val expect = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).flatMap { id =>
      val p = r6(1.0 / (1.0 + math.exp(
        -scored.filter(col("doc_id") === id).collect().head.getDouble(1))))
      if (draw(id) >= 1.0 - p) Some((id, p, draw(id))) else None
    }
    assert(kept.toSeq.sortBy(_._1) === expect)
    assert(expect.map(_._1).contains(5L), "p~1 docs survive any draw")
    assert(!expect.map(_._1).contains(6L), "p~0 docs need a >1 draw")
    // rerun: byte-identical kept set (content-hash seeding, no RNG state)
    val again = NbClassifier.paretoKeep(scored, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_._1).toSet)
  }

  test("a zero draw (md5 prefix 0000) keeps a p=1 doc — the >= edge") {
    import spark.implicits._
    // md5("5329") starts with 0000 -> u = 0 -> noise rounds to 0.0; the
    // continuous rule's strict > would reject this doc forever even at
    // keep_p = 1.0
    val scored = Seq((5329L, 40.0), (5329000L, -40.0))
      .toDF("doc_id", "log_odds")
    val kept = NbClassifier.paretoKeep(scored, "doc_id")
      .select("doc_id", "keep_p", "noise").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(kept.contains(5329L), kept.toString)
    assert(kept(5329L) === ((1.0, 0.0)), "p rounds to 1, draw to 0")
  }

  test("pareto gate splits survivors/flagged; unscorable docs pass") {
    val m = NbClassifier.train(pos, neg, "doc_id", "text")
    val batch = docs(60L -> "good good good good", 61L -> "bad bad bad bad",
      62L -> "   ")
    val (survivors, flagged) = NbClassifier.paretoGate(
      batch, "doc_id", "text", m)
    val fIds = flagged.select("doc_id").collect().map(_.getLong(0)).toSet
    val sIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sIds.contains(62L), "zero-token docs are not judged")
    assert((fIds ++ sIds) === Set(60L, 61L, 62L) && (fIds & sIds).isEmpty)
    // the split is exactly the keep rule's complement
    val keptIds = NbClassifier.paretoKeep(
        NbClassifier.logOdds(batch, "doc_id", "text", m), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sIds - 62L === keptIds)
    intercept[IllegalArgumentException](
      NbClassifier.paretoGate(batch, "doc_id", "text", m, shape = -1.0))
  }

  test("null-id docs fail the job loudly in scoring, keep, and gate") {
    import spark.implicits._
    val m = NbClassifier.train(pos, neg, "doc_id", "text")
    // md5(null) nulls the id-hash draw: without the guard the gate's
    // flagged filter and paretoKeep's keep filter BOTH go NULL and the
    // two surfaces disagree (and the null id can't be anti-joined out) —
    // so every entry point must fail instead of guessing
    val nullId = Seq((Some(40L), "good"), (None, "good good"))
      .toDF("doc_id", "text")
    def failsLoudly(f: => Array[_]): Unit = {
      val e = intercept[Exception](f)
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null-id document")),
        s"expected the null-id message, got: ${e.getMessage}")
    }
    failsLoudly(NbClassifier.logOdds(nullId, "doc_id", "text", m).collect())
    val scoredOk = NbClassifier.logOdds(docs(41L -> "good"), "doc_id", "text", m)
    // a scored frame with a null id injected AFTER scoring still fails
    // in the keep rule's draw
    val nullScored = scoredOk.unionByName(
      Seq((Option.empty[Long], 1L, 0.5)).toDF("doc_id", "n_tokens", "log_odds"))
    failsLoudly(NbClassifier.paretoKeep(nullScored, "doc_id").collect())
    failsLoudly {
      val (s, f) = NbClassifier.paretoGate(nullId, "doc_id", "text", m)
      s.collect() ++ f.collect()
    }
    // the review-found hole: a null-id doc with ZERO tokens never reaches
    // the scoring path (explode emits no rows, so a guard living only
    // under it is skipped by codegen) — the gate-door guard must still
    // fail it on the survivors side instead of silently landing it
    val nullIdNoTokens = Seq((Some(42L), "good"), (None, "   "))
      .toDF("doc_id", "text")
    failsLoudly {
      val (s, _) = NbClassifier.paretoGate(nullIdNoTokens, "doc_id", "text", m)
      s.collect()
    }
    // non-null frames are untouched by the guard
    assert(NbClassifier.paretoKeep(scoredOk, "doc_id").count() >= 0)
  }

  test("scoring plans no cartesian product and no window") {
    val m = NbClassifier.train(pos, neg, "doc_id", "text")
    val plan = NbClassifier.logOdds(docs(40L -> "good bad"),
      "doc_id", "text", m).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"totals must broadcast, not cartesian:\n$plan")
    assert(!plan.contains("Window"), s"no global sort/window:\n$plan")
  }

  test("model round-trips through parquet and load checks the marker") {
    val m = NbClassifier.train(pos, neg, "doc_id", "text")
    val dir = TempDirs.create("graft-nb-model").toString
    NbClassifier.save(spark, m, dir)
    intercept[IllegalArgumentException](
      NbClassifier.load(spark, TempDirs.create("graft-nb-empty").toString))
    val loaded = NbClassifier.load(spark, dir)
    val a = NbClassifier.logOdds(docs(50L -> "good bad z"),
      "doc_id", "text", m).collect().head.getDouble(2)
    val b = NbClassifier.logOdds(docs(50L -> "good bad z"),
      "doc_id", "text", loaded).collect().head.getDouble(2)
    assert(a === b)
  }
}
