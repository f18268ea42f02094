package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Mixing, Packing, Sampling}

class MixingPackingSpec extends AnyFunSuite with SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, Seq("web", "wiki", "code")(i % 3), 10L + i % 90))
      .toDF("doc_id", "domain", "n_tokens")
  }

  // ------------------------------------------------------------- mixCorpus

  test("mixCorpus: integer weights replicate each row exactly weight times") {
    val mixed = Mixing.mixCorpus(docs(90), "doc_id", col("domain"),
      Map("web" -> 2.0, "wiki" -> 0.0)) // code gets default 1.0
    val byDomain = mixed.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("web" -> 60L, "code" -> 30L)) // wiki dropped
    // epochs are 0-based and dense per row
    val epochs = mixed.filter(col("domain") === "web")
      .groupBy("doc_id").agg(sort_array(collect_list("epoch")).as("es"))
      .select("es").distinct().collect().map(_.getSeq[Int](0))
    assert(epochs.toSeq == Seq(Seq(0, 1)))
  }

  test("mixCorpus: fractional weight keeps the hashBucket-selected subset") {
    val d = docs(300)
    val mixed = Mixing.mixCorpus(d, "doc_id", col("domain"),
      Map("web" -> 0.25), defaultWeight = 0.0)
    val kept = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = d.filter(col("domain") === "web" &&
        Sampling.hashBucket(col("doc_id")) < 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expected && kept.nonEmpty && kept.size < 100)
    // deterministic: a re-run selects the identical subset
    val again = Mixing.mixCorpus(d, "doc_id", col("domain"),
      Map("web" -> 0.25), defaultWeight = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("mixCorpus: upsample fraction rides on top of full epochs") {
    val d = docs(300).filter(col("domain") === "web") // 100 rows
    val mixed = Mixing.mixCorpus(d, "doc_id", col("domain"), Map("web" -> 2.5))
    val copies = mixed.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copies.values.toSet == Set(2L, 3L))
    // the 3-copy rows are exactly the bucket<50 rows
    val three = copies.filter(_._2 == 3L).keySet
    val expected = d.filter(Sampling.hashBucket(col("doc_id")) < 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(three == expected)
  }

  test("temperatureWeights: t=1 keeps proportions, large t flattens, and feeds mixCorpus") {
    import spark.implicits._
    // head-heavy corpus: web 800, wiki 150, code 50
    val d = ((0 until 800).map(i => (i.toLong, "web")) ++
      (800 until 950).map(i => (i.toLong, "wiki")) ++
      (950 until 1000).map(i => (i.toLong, "code")))
      .toDF("doc_id", "domain")
    // t=1: natural shares — every weight is targetRows/corpusRows
    val w1 = Mixing.temperatureWeights(d, col("domain"), t = 1.0, targetRows = 2000)
    assert(w1.values.forall(v => math.abs(v - 2.0) < 0.011), w1.toString)
    // large t → uniform domain shares: each domain gets ~target/3 rows,
    // so the tail is upsampled far more than the head
    val wU = Mixing.temperatureWeights(d, col("domain"), t = 1e9, targetRows = 3000)
    assert(math.abs(wU("web") - 1.25) < 0.011 &&
      math.abs(wU("wiki") - 1000.0 / 150) < 0.011 &&
      math.abs(wU("code") - 20.0) < 0.011, wU.toString)
    // derived weights drive mixCorpus to the target in expectation; the
    // realized count adds md5-bucket sampling noise on the fractional
    // epochs (σ ≈ √(n·f·(1−f)) ≈ 13 here), so allow ~4σ + the 1% rounding
    val mixed = Mixing.mixCorpus(d, "doc_id", col("domain"), wU)
    val total = mixed.count()
    assert(math.abs(total - 3000L) <= 100, s"got $total rows for target 3000")
    // flattened: realized per-domain rows near uniform (same noise bound)
    val byDom = mixed.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(n => math.abs(n - 1000L) <= 60), byDom.toString)
  }

  test("mixCorpus plan is narrow: no exchange anywhere") {
    val plan = Mixing.mixCorpus(docs(90), "doc_id", col("domain"),
      Map("web" -> 2.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixCorpus must not shuffle\n$plan")
  }

  test("mixCorpus rejects negative weights; mixReport shares sum to 1") {
    intercept[IllegalArgumentException] {
      Mixing.mixCorpus(docs(10), "doc_id", col("domain"), Map("web" -> -1.0))
    }
    val mixed = Mixing.mixCorpus(docs(90), "doc_id", col("domain"),
      Map("web" -> 2.0))
    val rep = Mixing.mixReport(mixed, "doc_id", col("domain")).collect()
    assert(math.abs(rep.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val web = rep.find(_.getString(0) == "web").get
    assert(web.getAs[Long]("n_rows") == 60L &&
      web.getAs[Long]("n_source_rows") == 30L)
  }

  // ------------------------------------------------------------ packShards

  test("packShards equals the naive single-window cumsum bit for bit") {
    val d = docs(500)
    val packed = Packing.packShards(d, "doc_id", "n_tokens",
        budget = 1000, buckets = 16)
      .select("doc_id", "token_offset", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d
      .withColumn("token_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", floor(col("token_offset") / 1000).cast("long"))
      .select("doc_id", "token_offset", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(packed.toSeq == naive.toSeq)
  }

  test("packShards: shard totals stay within budget + one straddling doc") {
    val d = docs(400)
    val manifest = Packing.shardManifest(
      Packing.packShards(d, "doc_id", "n_tokens", budget = 500, buckets = 8),
      "n_tokens").collect()
    val maxTok = 99L // corpus max doc size
    assert(manifest.nonEmpty)
    manifest.dropRight(1).foreach { r =>
      val tok = r.getAs[Long]("n_tokens")
      assert(tok >= 500 - maxTok && tok < 500 + maxTok,
        s"shard ${r.getAs[Long]("shard")} holds $tok tokens")
    }
    // offsets tile the token stream: each shard starts where the prior ended
    val sorted = manifest.sortBy(_.getAs[Long]("shard"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("end_offset") == b.getAs[Long]("start_offset"))
      case _ => ()
    }
  }

  test("packShards: bucket geometry does not change the assignment") {
    val d = docs(300)
    def run(buckets: Int) =
      Packing.packShards(d, "doc_id", "n_tokens", budget = 700, buckets = buckets)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1) == run(7) && run(7) == run(256))
    // caller-supplied bounds skip the min/max scan without changing the
    // assignment — even bounds that merely COVER the range (edge clamp)
    def runBounds(b: (Double, Double)) =
      Packing.packShards(d, "doc_id", "n_tokens", budget = 700, buckets = 7,
          keyBounds = Some(b))
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(runBounds((0.0, 299.0)) == run(7))
    assert(runBounds((-1000.0, 5000.0)) == run(7))
    // bounds NARROWER than the data: out-of-range rows clamp into the edge
    // buckets — bucket balance skews, the assignment does not
    assert(runBounds((100.0, 200.0)) == run(7))
  }

  test("packShards rejects non-numeric keys and null tokens") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Packing.packShards(
        Seq(("a", 5L)).toDF("k", "tok"), "k", "tok", budget = 10)
    }
    val withNull = Seq((1L, Some(5L)), (2L, Option.empty[Long]))
      .toDF("doc_id", "tok")
    val e = intercept[Exception] {
      Packing.packShards(withNull, "doc_id", "tok", budget = 10).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("de-sync"))
  }

  test("shuffleKey is injective, decorrelates id order, and packs cleanly") {
    import spark.implicits._
    val d = docs(400)
    val keyed = d.withColumn("sk", Packing.shuffleKey(col("doc_id"), 1000L))
    // injective given span > max key: one sk per doc and back
    assert(keyed.select("sk").distinct().count() == 400)
    // decorrelated: ordering by sk is NOT id order (hash blocks interleave)
    val bySk = keyed.orderBy("sk").select("doc_id").as[Long].collect().toSeq
    assert(bySk != bySk.sorted && bySk.sorted == (0L until 400L))
    // deterministic forever: same expression, same order
    val again = d.withColumn("sk", Packing.shuffleKey(col("doc_id"), 1000L))
      .orderBy("sk").select("doc_id").as[Long].collect().toSeq
    assert(again == bySk)
    // composes with packShards (unique numeric key contract holds)
    val packed = Packing.packShards(keyed, "sk", "n_tokens", budget = 900)
    assert(packed.count() == 400)
    // a key outside [0, span) would collide across hash blocks — the
    // per-row bound check raises instead of silently corrupting the order
    val e = intercept[Exception] {
      d.withColumn("sk", Packing.shuffleKey(col("doc_id"), 100L)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("shuffleKey"),
      String.valueOf(e.getMessage))
  }

  test("packShards on an empty frame returns the empty packed schema") {
    val out = Packing.packShards(docs(0), "doc_id", "n_tokens", budget = 10)
    assert(out.columns.toSeq ==
      Seq("doc_id", "domain", "n_tokens", "token_offset", "shard"))
    assert(out.count() == 0)
  }

  test("writeShards: jsonl layout, per-file pack order, manifest parity") {
    import spark.implicits._
    val packed = Packing.packShards(docs(200), "doc_id", "n_tokens",
      budget = 2000, buckets = 8)
    val root = TempDirs.create("graft-shards").resolve("out").toString
    Packing.writeShards(packed, "doc_id", "n_tokens", root)
    // one directory per shard; the jsonl reads back as the packed frame
    val back = spark.read.json(s"$root/shards")
    assert(back.count() == 200)
    val shards = packed.select("shard").distinct().as[Long].collect().toSet
    val dirs = new java.io.File(s"$root/shards").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == shards.map(s => s"shard=$s"))
    // within one shard file, lines are in key (= pack) order
    val f0 = new java.io.File(s"$root/shards/shard=0").listFiles()
      .filter(_.getName.endsWith(".json")).head
    val ids = scala.io.Source.fromFile(f0).getLines()
      .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
      .toSeq
    assert(ids == ids.sorted && ids.nonEmpty)
    // manifest matches a recount of the landed files
    val manifest = spark.read.parquet(s"$root/manifest")
      .orderBy("shard").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the partition directory value reads back as INT — normalize
    val recount = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest == recount)
  }
}
