package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Chunking, Vocab}

class VocabChunkingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------------------ wordCounts

  test("wordCounts: trims, splits on runs of whitespace, lowercases") {
    val counts = Vocab.wordCounts(
        docs((1L, "  The  quick\tthe QUICK "), (2L, "quick")), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("the" -> 2L, "quick" -> 3L))
  }

  test("wordCounts: empty and whitespace-only docs contribute no tokens") {
    val counts = Vocab.wordCounts(
      docs((1L, ""), (2L, "   "), (3L, "a")), "text").collect()
    assert(counts.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 1L))
  }

  test("wordCounts: minCount prunes the tail after aggregation") {
    val counts = Vocab.wordCounts(
        docs((1L, "a a a b b c")), "text", minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 3L, "b" -> 2L))
  }

  test("topTokens: deterministic (count desc, token asc) total order") {
    val top = Vocab.topTokens(docs((1L, "b a b a c")), "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 2L), ("b", 2L))) // tie broken by token asc
  }

  test("topTokens plans as a bounded per-task heap, not a global sort") {
    val plan = Vocab.topTokens(docs((1L, "a b c")), "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"top-k must not single-partition the counts:\n$plan")
  }

  // ------------------------------------------------------------ pairCounts

  test("pairCounts: adjacent pairs in document order, across docs") {
    val counts = Vocab.pairCounts(
        docs((1L, "a b a b"), (2L, "b a")), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a b" -> 2L, "b a" -> 2L))
  }

  test("pairCounts: docs with fewer than two tokens contribute nothing") {
    // guards Spark's descending sequence(1, 0) surprise: a 1-token doc must
    // yield an empty pair array, not a fabricated wraparound pair
    val counts = Vocab.pairCounts(
      docs((1L, "solo"), (2L, ""), (3L, "  "), (4L, "x y")), "text").collect()
    assert(counts.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x y" -> 1L))
  }

  test("pairCounts vocabLimit: OOV breaks adjacency, never splices a pair") {
    // top-2 vocabulary of "a x b a b" is {a, b}; the pair across the
    // dropped x must NOT appear — splicing would fabricate a second "a b"
    val counts = Vocab.pairCounts(docs((1L, "a x b a b")), "text",
        vocabLimit = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a b" -> 1L, "b a" -> 1L))
  }

  test("topPairs: the max-count pair ranks first — one BPE merge step") {
    val top = Vocab.topPairs(docs((1L, "lo w lo w lo w e r")), "text", 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("lo w", 3L)))
  }

  // -------------------------------------------------------------- coverage

  test("coverage: k covering the whole vocabulary reports 1.0") {
    val r = Vocab.coverage(docs((1L, "a b c a")), "text", 10).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L && r.getDouble(3) == 1.0)
    graft.core.Caches.releaseAll() // coverage tracks its counts frame
  }

  test("coverage: top-1 coverage is the modal token's instance share") {
    val r = Vocab.coverage(docs((1L, "a a a b c d")), "text", 1).head()
    assert(r.getInt(0) == 1 && r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 0.5)
    graft.core.Caches.releaseAll()
  }

  // ----------------------------------------------------------------- chunk

  test("chunk: a doc no longer than size yields exactly itself") {
    val out = Chunking.chunk(docs((1L, "short doc")), "text", 120, 80)
      .select("chunk_id", "chunk_start", "chunk_text").collect()
    assert(out.length == 1)
    assert(out(0).getInt(0) == 0 && out(0).getInt(1) == 1 &&
      out(0).getString(2) == "short doc")
  }

  test("chunk: stride = size tiles exactly, reconstructing the text") {
    val text = "abcdefghij" * 7 // 70 chars
    val chunks = Chunking.chunk(docs((1L, text)), "text", 16, 16)
      .orderBy("chunk_id").collect()
    assert(chunks.length == 5) // ceil((70-16)/16)+1 = 5
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString == text)
    assert(chunks.map(_.getAs[Int]("chunk_start")).toSeq ==
      Seq(1, 17, 33, 49, 65))
    assert(chunks.last.getAs[String]("chunk_text").length == 6) // clamped
  }

  test("chunk: overlapping windows share size - stride characters") {
    val text = ('a' to 'z').mkString // 26 chars
    val chunks = Chunking.chunk(docs((1L, text)), "text", 10, 6)
      .orderBy("chunk_id").collect().map(_.getAs[String]("chunk_text"))
    assert(chunks.length == 4) // ceil(16/6)+1 = 4
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(4) == b.take(4), s"overlap broken: '$a' / '$b'")
    case _ => ()
    }
    // every character covered, in order
    assert(chunks.head.startsWith("abcdefghij") && chunks.last.endsWith("z"))
  }

  test("chunk: empty text yields one empty chunk (dropping is upstream)") {
    val out = Chunking.chunk(docs((1L, "")), "text", 10, 5).collect()
    assert(out.length == 1 && out(0).getAs[String]("chunk_text") == "")
  }

  test("chunk: rejects a stride that would skip characters") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(docs((1L, "x")), "text", 10, 11)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunk(docs((1L, "x")), "text", 0, 1)
    }
  }

  test("chunk plans with no shuffle — pure per-row explode") {
    val plan = Chunking.chunk(docs((1L, "abc")), "text", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("chunkReport: expansion factor and chunk character total") {
    val r = Chunking.chunkReport(
      Chunking.chunk(docs((1L, "a" * 30), (2L, "b" * 10)), "text", 10, 10),
      "doc_id").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L) // 3 + 1 chunks
    assert(r.getDouble(2) == 2.0 && r.getLong(3) == 40L)
  }

  test("trainBpe: hand-computed merges, deterministic ties, early exhaustion") {
    // corpus: aa ×2, ab ×1. Symbols: [a,a,</w>] ×2, [a,b,</w>] ×1.
    // pair counts: (a,a)=2, (a,</w>)=2, (a,b)=1, (b,</w>)=1.
    // merge 1: tie at 2 → lexicographic right asc picks (a,</w>) ('<'<'a').
    // merge 2: (a,a</w>)=2. merge 3: (a,b)=1 ('a'<'b' beats (b,</w>)).
    // merge 4: (ab,</w>)=1 — then NO pairs remain: numMerges=10 stops at 4.
    val d = docs((1L, "aa aa ab"))
    val got = Vocab.trainBpe(d, "text", numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "a", "</w>", "a</w>", 2L),
      (2, "a", "a</w>", "aa</w>", 2L),
      (3, "a", "b", "ab", 1L)))
    val all = Vocab.trainBpe(d, "text", numMerges = 10).collect()
    assert(all.length == 4, s"exhaustion must stop the loop: ${all.length}")
    assert(all.map(_.getString(3)).toSet ==
      Set("a</w>", "aa</w>", "ab", "ab</w>"))
  }

  test("encodeBpe applies learned merges in rank order, greedy left-to-right") {
    val d = docs((1L, "aa aa ab"))
    val merges = Vocab.trainBpe(d, "text", numMerges = 3)
    // "aa" → [aa</w>]; "ab" → [ab, </w>] (merge 3 fires); "aab" →
    // [a, ab, </w>] (greedy: (a,a) is not a merge; (a,b) at index 1 is)
    val got = Vocab.encodeBpe(docs((9L, "aa ab aab")), "text", merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(got == Seq("aa</w>", "ab", "</w>", "a", "ab", "</w>"), got.toString)
    // nulls pass through; empty text → empty array
    val edge = Vocab.encodeBpe(
      docs((1L, null.asInstanceOf[String]), (2L, "  ")), "text", merges)
      .orderBy("doc_id").select("bpe_tokens").collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getSeq[String](0).isEmpty)
  }

  test("saveBpe round-trip: artifact params drive the encoder; non-artifacts fail fast") {
    val d = docs((1L, "AA ab aa"))
    val merges = Vocab.trainBpe(d, "text", numMerges = 3) // lowercased corpus
    val path = TempDirs.create("graft-bpe").resolve("tok").toString
    Vocab.saveBpe(merges, path, lowercase = true)
    // the saved artifact must encode exactly like the in-memory table,
    // including the lowercase param it recorded
    val fromDisk = Vocab.encodeBpeFrom(docs((9L, "AA ab")), "text", path)
      .select("bpe_tokens").head().getSeq[String](0)
    val inMem = Vocab.encodeBpe(docs((9L, "AA ab")), "text", merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(fromDisk == inMem, s"$fromDisk vs $inMem")
    // a bare parquet dir (no marker) is not a tokenizer
    val bare = TempDirs.create("graft-bpe-bare").resolve("x").toString
    merges.write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Vocab.encodeBpeFrom(docs((1L, "aa")), "text", bare)
    }
    assert(e.getMessage.contains("saveBpe"), e.getMessage)
  }

  test("encodeBpe: memoized and unmemoized paths produce identical output") {
    val d = docs((1L, "aa ab aa aab"), (2L, "ab aa aa"))
    val merges = Vocab.trainBpe(d, "text", numMerges = 3)
    def run(memoize: Boolean): Seq[(Long, Seq[String])] =
      Vocab.encodeBpe(d, "text", merges, memoize = memoize)
        .orderBy("doc_id").select("doc_id", "bpe_tokens").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    assert(run(memoize = true) == run(memoize = false))
  }
}
