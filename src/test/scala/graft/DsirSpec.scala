package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/**
 * DSIR importance weighting: gram extraction shape, the smoothed log-ratio
 * algebra on a hand-computed bucket, target-likeness steering the ranking,
 * both hash paths agreeing on order, and stratified selection bounds.
 */
class DsirSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  // "en" shares vocabulary with the target; "xx" is disjoint
  private val raw = docs(
    (1L, "en", "data model training data"),
    (2L, "en", "training data quality"),
    (3L, "xx", "voiture rouge verte bleue"),
    (4L, "xx", "rouge bleue voiture"),
    (5L, "en", "data training"))
  private val target = raw.filter(col("lang") === "en")

  test("grams = unigrams + bigrams; short and empty docs degrade cleanly") {
    val g = docs((1L, "en", "a b c"), (2L, "en", "solo"), (3L, "en", " "))
      .select(col("doc_id"), Dsir.grams(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(g(1L) === List("a", "b", "c", "a b", "b c"))
    assert(g(2L) === List("solo"))
    assert(g(3L) === Nil)
  }

  test("n_grams counts 2n-1 grams per doc") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 tokens -> 7 grams; 3 -> 5; 2 -> 3
    assert(w === Map(1L -> 7L, 2L -> 5L, 3L -> 7L, 4L -> 5L, 5L -> 3L))
  }

  test("log-ratio algebra matches the smoothed definition on one bucket") {
    import spark.implicits._
    // single-gram docs so bucket counts are trivial to hand-compute
    val tgt = Seq(1L -> "aa", 2L -> "aa", 3L -> "bb").toDF("doc_id", "text")
    val rw = Seq(10L -> "aa", 11L -> "cc").toDF("doc_id", "text")
    val b = 8192
    val lr = Dsir.logRatios(
      Dsir.hashedGrams(tgt, "text", Nil),
      Dsir.hashedGrams(rw, "text", Nil)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucket(g: String) =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString, 16) % b
    val expAa = math.log((2 + 0.5) / (3 + 0.5 * b)) -
      math.log((1 + 0.5) / (2 + 0.5 * b))
    val expCc = math.log((0 + 0.5) / (3 + 0.5 * b)) -
      math.log((1 + 0.5) / (2 + 0.5 * b))
    assert(math.abs(lr(bucket("aa")) - expAa) < 1e-12)
    assert(math.abs(lr(bucket("cc")) - expCc) < 1e-12)
    assert(lr.size === 2) // ratios exist for RAW-observed buckets only
  }

  test("target-like docs outrank vocabulary-disjoint docs") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
      carry = Seq("lang"))
      .collect().map(r => (r.getString(1), r.getDouble(3))).toList
    val en = w.filter(_._1 == "en").map(_._2)
    val xx = w.filter(_._1 == "xx").map(_._2)
    assert(en.min > xx.max,
      s"every en weight should beat every xx weight: en=$en xx=$xx")
  }

  test("portable and xxhash64 paths agree on the en-vs-xx ordering") {
    def ranks(portable: Boolean) =
      Dsir.importanceWeights(raw, target, "doc_id", "text",
        carry = Seq("lang"), portable = portable)
        .orderBy(col("logw").desc, col("doc_id"))
        .collect().map(_.getString(1)).toList
    assert(ranks(portable = true).take(3) === List("en", "en", "en"))
    assert(ranks(portable = false).take(3) === List("en", "en", "en"))
  }

  test("stratified selection keeps exactly perStratum per stratum") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
      carry = Seq("lang"))
    val sel = Dsir.selectStratified(w, "doc_id", "lang", perStratum = 2)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel === Map("en" -> 2L, "xx" -> 2L))
  }
}
