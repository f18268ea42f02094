package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

class CdcSpec extends AnyFunSuite with SparkSpec {
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestVersion keeps exactly the newest row per key") {
    import spark.implicits._
    val df = Seq(
      ("k1", ts("2024-01-01 00:00:00"), 1, "old"),
      ("k1", ts("2024-01-02 00:00:00"), 1, "new"),
      ("k1", ts("2024-01-02 00:00:00"), 0, "older-seq"),
      ("k2", ts("2024-01-01 00:00:00"), 5, "only")
    ).toDF("key", "sequenced_at", "sequence_no", "v")
    val out = Cdc.latestVersion(df, Seq("key"), "sequenced_at", "sequence_no")
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getString(3))).toSeq ==
      Seq(("k1", "new"), ("k2", "only")))
  }

  test("effectiveIntervals chains LEAD-minus-gap with open-ended sentinel") {
    import spark.implicits._
    val df = Seq(
      ("k1", ts("2024-01-01 00:00:00")),
      ("k1", ts("2024-01-01 02:00:00"))
    ).toDF("key", "ts")
    val out = Cdc.effectiveIntervals(df, Seq("key"), "ts")
      .orderBy("eff_dt").collect()
    assert(out(0).getTimestamp(out(0).fieldIndex("exp_dt")) == ts("2024-01-01 01:59:00"))
    assert(out(1).getTimestamp(out(1).fieldIndex("exp_dt")) == ts("9999-12-31 00:00:00"))
  }

  test("validAt honors inclusive start, exclusive end, null = open") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
      (2, ts("2024-02-01 00:00:00"), null.asInstanceOf[Timestamp])
    ).toDF("id", "eff", "exp")
    val at = lit("2024-02-01 00:00:00").cast("timestamp")
    val ids = df.filter(Cdc.validAt(at, col("eff"), col("exp"))).select("id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(2)) // row 1 expired exactly at the boundary
  }

  test("asOfJoin picks latest right row at-or-before, inclusive on ties") {
    import spark.implicits._
    val left = Seq(("u1", ts("2024-01-01 10:00:00"), "p1"))
      .toDF("user", "t", "purchase")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), "early"),
      ("u1", ts("2024-01-01 10:00:00"), "tie"),
      ("u1", ts("2024-01-01 11:00:00"), "late")
    ).toDF("user", "t", "tag")
    val out = Cdc.asOfJoin(left, right, "user", "user", "t", "t", Seq("tag")).collect()
    assert(out.length == 1 && out(0).getAs[String]("tag") == "tie")
  }

  test("asOfJoin keeps matched-row nulls and never mixes versions") {
    import spark.implicits._
    val left = Seq(("k", ts("2024-01-01 12:00:00"), "p")).toDF("key", "t", "l")
    val right = Seq(
      ("k", ts("2024-01-01 09:00:00"), "open", "agentA"),
      ("k", ts("2024-01-01 10:00:00"), null, "agentB") // latest: status null
    ).toDF("key", "t", "status", "agent")
    val out = Cdc.asOfJoin(left, right, "key", "key", "t", "t",
      Seq("status", "agent")).head()
    // the matched (latest ≤ t) version is the 10:00 row — its null status
    // must survive, and agent must come from the SAME row
    assert(out.getAs[String]("status") == null)
    assert(out.getAs[String]("agent") == "agentB")
  }

  test("asOfJoin yields null payload when no prior right row") {
    import spark.implicits._
    val left = Seq(("u1", ts("2024-01-01 08:00:00"), "p"))
      .toDF("user", "t", "purchase")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), "after"))
      .toDF("user", "t", "tag")
    val out = Cdc.asOfJoin(left, right, "user", "user", "t", "t", Seq("tag")).collect()
    assert(out.length == 1 && out(0).getAs[String]("tag") == null)
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1L),
      ("u", ts("2024-01-01 00:30:00"), 2L), // exactly 30 min → same session
      ("u", ts("2024-01-01 01:00:01"), 3L), // 30 min 1 s → new session
      ("v", ts("2024-01-01 05:00:00"), 4L)
    ).toDF("user_id", "t", "seq")
    val out = Cdc.sessionize(df, "user_id", "t", gapMinutes = 30,
        tiebreak = Seq(col("seq").asc))
      .select("user_id", "seq", "session_no").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(("u", 1L) -> 1L, ("u", 2L) -> 1L, ("u", 3L) -> 2L, ("v", 4L) -> 1L))
  }

  test("idempotentAppend only adds unseen keys") {
    import spark.implicits._
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val incoming = Seq((2, "b2"), (3, "c")).toDF("k", "v")
    val out = Cdc.idempotentAppend(target, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("snapshotDiff: added/removed/changed with null-safe column compares") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), "en"),  // unchanged
      (2L, Some("b"), "en"),  // removed
      (3L, Some("c"), "en"),  // changed (text)
      (4L, None: Option[String], "en"),  // unchanged (null == null)
      (5L, Some("e"), "en"))  // changed (value -> null)
      .toDF("id", "text", "lang")
    val after = Seq(
      (1L, Some("a"), "en"),
      (3L, Some("c2"), "en"),
      (4L, None: Option[String], "en"),
      (5L, None: Option[String], "en"),
      (6L, Some("f"), "en"))  // added
      .toDF("id", "text", "lang")
    val got = Cdc.snapshotDiff(before, after, "id", Seq("text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "removed"), (3L, "changed"), (5L, "changed"),
      (6L, "added")), got.toString)
    val all = Cdc.snapshotDiff(before, after, "id", Seq("text", "lang"),
        includeUnchanged = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all.contains((1L, "unchanged")) && all.contains((4L, "unchanged")),
      s"null==null must be unchanged: $all")
    assert(all.size == 6)

    // null-id rows never pair (null != null) and must classify by SIDE
    // PRESENCE: a before-only null-id row is 'removed', an after-only one
    // is 'added' — not the inverted answers an id-null test would give
    val bNull = Seq((Option.empty[Long], "x")).toDF("id", "text")
    val aNull = Seq((Option.empty[Long], "y")).toDF("id", "text")
    val nullDiff = Cdc.snapshotDiff(bNull, aNull, "id", Seq("text"))
      .collect().map(r => (r.isNullAt(0), r.getString(1))).toSeq.sorted
    assert(nullDiff == Seq((true, "added"), (true, "removed")),
      s"null-id rows must classify by side presence: $nullDiff")

    // the id in compareCols would build duplicate __b_id/__a_id columns
    // and make the join resolution ambiguous — fail fast with the fix
    val e = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(before, after, "id", Seq("id", "text"))
    }
    assert(e.getMessage.contains("must not include the id column"),
      e.getMessage)
  }
}
