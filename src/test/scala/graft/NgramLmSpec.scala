package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Fusion, NgramLm}

/**
 * Bigram-LM quality scoring (the CCNet discipline) and reciprocal-rank
 * fusion: both algebras against hand-computed fixtures, plus the scale
 * properties — tier labeling must not plan a global-sort window, and the
 * pruned model keeps its trained conditional.
 */
class NgramLmSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // training slice: c12 = {(a,b)->2, (b,a)->1}, contexts c1 = {a->2, b->1},
  // V = |{a, b}| = 2, alpha = 0.5
  private val train = docs(1L -> "a b a", 2L -> "a b")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cross-entropy matches the hand-computed add-alpha conditional") {
    val m = NgramLm.train(train, "doc_id", "text")
    val scored = NgramLm.crossEntropy(
        docs(10L -> "a b a", 11L -> "z q", 12L -> "a"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pBA = (2.0 + 0.5) / (2.0 + 0.5 * 2)  // p(b|a), seen
    val pAB = (1.0 + 0.5) / (1.0 + 0.5 * 2)  // p(a|b), seen
    val pUnk = 0.5 / (0.0 + 0.5 * 2)         // unseen context = 1/V
    assert(scored(10L) === ((2L, r6(-(math.log(pBA) + math.log(pAB)) / 2))))
    assert(scored(11L) === ((1L, r6(-math.log(pUnk)))))
    assert(!scored.contains(12L), "single-token docs carry no transitions")
  }

  test("unseen bigram under a seen context smooths against that context") {
    val m = NgramLm.train(train, "doc_id", "text")
    val h = NgramLm.crossEntropy(docs(20L -> "a z"), "doc_id", "text", m)
      .collect().head.getDouble(2)
    // c1(a) = 2, c12(a, z) = 0 -> p = 0.5 / (2 + 1)
    assert(h === r6(-math.log(0.5 / 3.0)))
  }

  test("prune drops rare bigram rows but keeps the trained denominator") {
    val m = NgramLm.train(train, "doc_id", "text").prune(2)
    assert(m.bigrams.count() === 1) // (a, b) survives, (b, a) was a hapax
    val h = NgramLm.crossEntropy(docs(30L -> "b a"), "doc_id", "text", m)
      .collect().head.getDouble(2)
    // (b, a) now scores unseen-under-context-b: (0 + 0.5) / (c1(b)=1 + 1)
    assert(h === r6(-math.log(0.5 / 2.0)))
  }

  test("tier cutoffs are exact terciles and labeling plans no window") {
    import spark.implicits._
    val scored = (1 to 9).map(i => (i.toLong, i.toDouble))
      .toDF("doc_id", "cross_entropy")
    val tiers = NgramLm.perplexityTiers(scored, "cross_entropy")
    val got = tiers.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("tier")).toMap
    // percentile(1..9, 1/3) = 3.667, (2/3) = 6.333
    assert((1 to 3).forall(i => got(i.toLong) == "head"))
    assert((4 to 6).forall(i => got(i.toLong) == "middle"))
    assert((7 to 9).forall(i => got(i.toLong) == "tail"))
    val plan = tiers.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"tier labeling must broadcast cutoffs, not sort globally:\n$plan")
  }

  test("approximate cutoffs label identically on a small frame") {
    import spark.implicits._
    val scored = (1 to 9).map(i => (i.toLong, i.toDouble))
      .toDF("doc_id", "cross_entropy")
    val exact = NgramLm.perplexityTiers(scored, "cross_entropy")
      .select("doc_id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val approx = NgramLm.perplexityTiers(scored, "cross_entropy", exact = false)
      .select("doc_id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exact === approx)
  }

  test("save/load roundtrip scores identically and a wrong path fails fast") {
    val path = TempDirs.create("graft-lm").resolve("model").toString
    val m = NgramLm.train(train, "doc_id", "text")
    NgramLm.save(spark, m, path)
    val cand = docs(40L -> "a b a", 41L -> "z q")
    val direct = NgramLm.crossEntropy(cand, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val loaded = NgramLm.crossEntropy(cand, "doc_id", "text",
      NgramLm.load(spark, path))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(direct === loaded)
    val notAModel = TempDirs.create("graft-lm").resolve("nope").toString
    intercept[IllegalArgumentException](NgramLm.load(spark, notAModel))
  }

  test("qualityGate splits on the ceiling; unscorable docs pass") {
    val m = NgramLm.train(train, "doc_id", "text")
    val batch = docs(
      50L -> "a b a",   // fluent under the model
      51L -> "z q",     // unseen everywhere: ce = ln V = ln 2
      52L -> "a")       // single token — unscorable, must PASS
    // ceiling between the fluent score and ln 2
    val fluentCe = NgramLm.crossEntropy(docs(50L -> "a b a"), "doc_id",
      "text", m).collect().head.getDouble(2)
    val maxCe = (fluentCe + math.log(2.0)) / 2
    val (surv, flagged) = NgramLm.qualityGate(batch, "doc_id", "text", m, maxCe)
    assert(surv.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(50L, 52L))
    val fl = flagged.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fl.keySet === Set(51L) && fl(51L) === r6(math.log(2.0)))
    intercept[IllegalArgumentException](
      NgramLm.qualityGate(batch, "doc_id", "text", m, -1.0))
    // a null-id doc fails the JOB loudly (even zero-token): the anti-join
    // algebra cannot gate a null key — a flagged null-id doc would both
    // ledger as dropped AND land
    import spark.implicits._
    val nullId = Seq((Some(60L), "a b a"), (None, "   "))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      NgramLm.qualityGate(nullId, "doc_id", "text", m, maxCe)._1.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null-id document")), e.getMessage)
  }

  test("rrf matches the definition: sum of 1/(k+rank), ranks only") {
    import spark.implicits._
    val armA = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val armB = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val fused = Fusion.rrf(Seq(armA, armB), "doc_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(fused === List(
      (2L, r6(1.0 / 61 + 1.0 / 62), 2L),  // in both arms — top
      (1L, r6(1.0 / 61), 1L),
      (3L, r6(1.0 / 62), 1L)))
  }

  test("rrf topK truncates on the rounded-score total order") {
    import spark.implicits._
    val arm = Seq((5L, 1), (3L, 2), (9L, 3)).toDF("doc_id", "rank")
    val ids = Fusion.rrf(Seq(arm), "doc_id", topK = 2)
      .collect().map(_.getLong(0)).toList
    assert(ids === List(5L, 3L))
  }

  test("ranked derives the engine's total order from a scored frame") {
    import spark.implicits._
    val arm = Seq((7L, 2.5), (2L, 9.1), (4L, 2.5)).toDF("doc_id", "score")
    val ranks = Fusion.ranked(arm, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ranks === Map(2L -> 1, 4L -> 2, 7L -> 3)) // tie: lower id first
  }

  test("rrf rejects an empty arm list and a non-positive constant") {
    import spark.implicits._
    val arm = Seq((1L, 1)).toDF("doc_id", "rank")
    intercept[IllegalArgumentException](Fusion.rrf(Nil, "doc_id"))
    intercept[IllegalArgumentException](Fusion.rrf(Seq(arm), "doc_id", k = 0))
  }
}
