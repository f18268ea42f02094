package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text

class TextSpec extends AnyFunSuite with SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).head().get(0)
  }

  test("tokenCount handles empty, blank, and multi-space text") {
    assert(one(Text.tokenCount(col("t")), "") == 0)
    assert(one(Text.tokenCount(col("t")), "   ") == 0)
    assert(one(Text.tokenCount(col("t")), " a  b\tc ") == 3)
  }

  test("subwordCount splits alpha runs, digit runs, punct") {
    assert(one(Text.subwordCount(col("t")), "abc123!x") == 4) // abc,123,!,x
  }

  test("punctRatio and stopwordRatio bounded in [0,1]") {
    val p = one(Text.punctRatio(col("t")), "!!!").asInstanceOf[Double]
    assert(p == 1.0)
    val s = one(Text.stopwordRatio(col("t")), "the and of").asInstanceOf[Double]
    assert(s == 1.0)
  }

  test("qualityScore rewards clean prose over punctuation soup") {
    val good = one(Text.qualityScore(col("t")),
      "this is a reasonably long sentence with normal words appearing throughout the text body")
      .asInstanceOf[Double]
    val bad = one(Text.qualityScore(col("t")), "!@# $%^ &*( )!@ #$%").asInstanceOf[Double]
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("langId detects clear samples and falls back to und") {
    assert(one(Text.langId(col("t")), "the cat is on the mat and it is happy") == "en")
    assert(one(Text.langId(col("t")), "der hund ist nicht mit der katze") == "de")
    assert(one(Text.langId(col("t")), "xyzzy plugh qwerty") == "und")
  }

  test("fingerprint is stable and shift-insensitive for shared k-grams") {
    val a = one(Text.fingerprint(col("t"), 4), "abcdefgh")
    val b = one(Text.fingerprint(col("t"), 4), "abcdefgh")
    assert(a == b)
    // prefixing content keeps the minimum if the original min-gram survives
    val c = one(Text.fingerprint(col("t"), 4), "xx abcdefgh")
    assert(c.asInstanceOf[String] <= a.asInstanceOf[String])
  }

  test("charShingles covers all positions") {
    import spark.implicits._
    val sh = Seq("abcd").toDF("t")
      .select(Text.charShingles(col("t"), 3)).head().getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))
  }

  test("repetition signals: duplicate tokens and top-bigram coverage") {
    import spark.implicits._
    def sig(s: String): (Double, Double) = {
      val row = Seq(s).toDF("t")
        .select(Text.tokens(col("t")).as("toks"))
        .select(Text.dupTokenRatio(col("toks")).as("d"),
          Text.topFreqFrac(Text.ngramsFromTokens(col("toks"), 2)).as("f"))
        .head()
      (row.getDouble(0), row.getDouble(1))
    }
    // all distinct tokens, all distinct bigrams
    val (d1, f1) = sig("one two three four")
    assert(d1 == 0.0 && f1 == 1.0 / 3.0)
    // "spam spam spam spam": 3 of 4 tokens repeat; all 3 bigrams identical
    val (d2, f2) = sig("spam spam spam spam")
    assert(d2 == 0.75 && f2 == 1.0)
    // single-token doc: one whole-text 1-gram, nothing repeats
    val (d3, f3) = sig("solo")
    assert(d3 == 0.0 && f3 == 1.0)
  }

  test("duplicateLineFraction and qualityVerdict rule order") {
    import spark.implicits._
    def verdict(s: String): (Long, Double, String) = {
      val row = Seq(s).toDF("t").select(
        Text.tokenCount(col("t")).cast("long").as("n"),
        Text.duplicateLineFraction(col("t")).as("dlf"),
        Text.qualityVerdict(col("t"), minTokens = 3, minStopwordFrac = 0.0,
          maxDupLineFrac = 0.2, maxDupTokenRatio = 0.6).as("v")).head()
      (row.getLong(0), row.getDouble(1), row.getStruct(2).getString(1))
    }
    // clean multi-line prose keeps; blank lines don't count
    val (_, dlf1, r1) = verdict("alpha beta gamma\n\n delta epsilon zeta")
    assert(dlf1 == 0.0 && r1 == "keep")
    // 2 of 3 lines identical -> dup_lines fires
    val (_, dlf2, r2) = verdict("alpha beta gamma delta\nsame line\nsame line")
    assert(dlf2 == 1.0 / 3.0 && r2 == "dup_lines")
    // rule ORDER: a 2-token doc with duplicate lines reports too_few_tokens
    val (n3, _, r3) = verdict("x\nx")
    assert(n3 == 2 && r3 == "too_few_tokens")
    // heavy token repetition without line dups -> dup_tokens
    val (_, _, r4) = verdict("spam spam spam spam spam spam spam spam win")
    assert(r4 == "dup_tokens")
  }

  test("PII: counts per type and ordered redaction") {
    import spark.implicits._
    val doc = "mail a.b+c@ex.co or 415-555-0134, ssn 078-05-1120, " +
      "card 4111 1111 1111 1111, host 192.168.0.1 and no-pii text 12345"
    val pats = Text.PiiPatterns.toMap
    val row = Seq(doc).toDF("t").select(
      Text.piiCount(col("t"), pats("email")).as("e"),
      Text.piiCount(col("t"), pats("phone")).as("p"),
      Text.piiCount(col("t"), pats("ssn")).as("s"),
      Text.piiCount(col("t"), pats("card")).as("c"),
      Text.piiCount(col("t"), pats("ip")).as("i"),
      Text.piiTotal(col("t")).as("tot"),
      Text.redactPii(col("t")).as("r")).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))
      == ((1, 1, 1, 1, 1)))
    assert(row.getInt(5) == 5)
    val r = row.getString(6)
    assert(r.contains("<EMAIL>") && r.contains("<PHONE>") && r.contains("<SSN>")
      && r.contains("<CARD>") && r.contains("<IP>"))
    // nothing sensitive survives; ordinary digits do
    assert(!r.contains("@") && !r.contains("078-05") && !r.contains("4111"))
    assert(r.contains("12345") && r.contains("no-pii text"))
    // clean text passes through untouched
    val clean = Seq("just words 99 bottles").toDF("t")
      .select(Text.redactPii(col("t")), Text.piiTotal(col("t"))).head()
    assert(clean.getString(0) == "just words 99 bottles" && clean.getInt(1) == 0)
  }
}
