package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Compaction

class CompactionSpec extends AnyFunSuite with SparkSpec {

  /** (name, lastModified) per parquet part-file under a partition dir. */
  private def partFiles(dir: File): Map[String, Long] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap

  test("compactPath rewrites only fragmented partitions, preserving contents") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact").resolve("t").toString
    val df = (1L to 400L).map(i => (i, i % 4, s"row $i payload"))
      .toDF("id", "part", "payload")
    // partitions 0..2 fragmented (8 tasks → 8 files each); partition 3
    // written compact (1 file) — it must be left byte-for-byte alone
    df.filter(col("part") < 3).repartition(8)
      .write.partitionBy("part").parquet(root)
    df.filter(col("part") === 3).coalesce(1)
      .write.mode("append").partitionBy("part").parquet(root)

    val before = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val untouchedBefore = partFiles(new File(root, "part=3"))
    assert(untouchedBefore.size == 1)
    assert(partFiles(new File(root, "part=0")).size == 8)

    val res = Compaction.compactPath(spark, root, Seq("part"))
    assert(res.partitionsSelected == 3)
    assert(res.filesBefore == 24)
    assert(res.filesAfter == 3, res.toString) // 1 bin-packed file each

    // contents identical, fragmented partitions now single-file, and the
    // already-compact partition kept its exact files (names AND mtimes)
    val after = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    (0 to 2).foreach(p =>
      assert(partFiles(new File(root, s"part=$p")).size == 1, s"part=$p"))
    assert(partFiles(new File(root, "part=3")) == untouchedBefore,
      "untouched partition files must not be rewritten")
  }

  test("compactPath compacts a fragmented NULL string partition and escaped values") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-null").resolve("t").toString
    // string partition column with a null partition and an escaped value:
    // fileStats must parse __HIVE_DEFAULT_PARTITION__ back to null (what a
    // reader sees) and percent-unescape 'a:b', or the rewrite's predicates
    // match nothing and the partitions silently never compact
    val df = (1L to 200L).map(i =>
        (i, if (i % 2 == 0) null else "a:b", s"row $i"))
      .toDF("id", "part", "payload")
    df.repartition(8).write.partitionBy("part").parquet(root)
    assert(partFiles(new File(root, "part=__HIVE_DEFAULT_PARTITION__")).size == 8)
    assert(partFiles(new File(root, "part=a%3Ab")).size == 8)
    val before = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val res = Compaction.compactPath(spark, root, Seq("part"))
    assert(res.partitionsSelected == 2, res.toString)
    assert(res.filesAfter == 2, res.toString) // one packed file each
    assert(partFiles(new File(root, "part=__HIVE_DEFAULT_PARTITION__")).size == 1)
    assert(partFiles(new File(root, "part=a%3Ab")).size == 1)
    assert(spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq == before, "contents byte-equal")
  }

  test("fileStats keeps a percent-escaped null-sentinel token a literal string") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-rawtoken").resolve("t")
    // Spark's writer never emits this directory name (it does not escape
    // '_'), but Spark's READER unescapes it to the literal string
    // '__HIVE_DEFAULT_PARTITION__', NOT to null — PartitioningUtils
    // matches the null sentinel on the RAW token, before unescaping.
    // fileStats must agree with the reader, or its stats row would carry
    // null for a partition the rewrite's predicates address as a string.
    val dir = root.resolve("part=%5F%5FHIVE_DEFAULT_PARTITION%5F%5F")
    Seq((1L, "x")).toDF("id", "payload").coalesce(1)
      .write.parquet(dir.toString)
    val stats = Compaction.fileStats(spark, root.toString, Seq("part"))
      .collect()
    assert(stats.length == 1, stats.mkString(";"))
    assert(stats.head.getAs[String]("part") == "__HIVE_DEFAULT_PARTITION__",
      stats.head.toString)
  }

  test("compactPath is a no-op when every partition meets its target") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-noop").resolve("t").toString
    (1L to 100L).map(i => (i, i % 2)).toDF("id", "part")
      .coalesce(1).write.partitionBy("part").parquet(root)
    val filesBefore =
      (0 to 1).map(p => partFiles(new File(root, s"part=$p"))).toSeq
    val res = Compaction.compactPath(spark, root, Seq("part"))
    assert(res == graft.ops.CompactionResult(0, 0L, 0L, 0L))
    assert((0 to 1).map(p => partFiles(new File(root, s"part=$p"))).toSeq
      == filesBefore)
  }

  test("compactPath bin-packs an unpartitioned layout") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-flat").resolve("t").toString
    (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(10).write.parquet(root)
    val before = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(partFiles(new File(root)).size == 10)
    val res = Compaction.compactPath(spark, root, Seq.empty)
    assert(res.partitionsSelected == 1 && res.filesBefore == 10)
    assert(res.filesAfter == 1, res.toString)
    assert(partFiles(new File(root)).size == 1)
    assert(spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
  }

  test("planning is metadata-only: zero data records read, zero Spark jobs") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-meta").resolve("t").toString
    (1L to 300L).map(i => (i, i % 3, s"row $i")).toDF("id", "part", "v")
      .repartition(4).write.partitionBy("part").parquet(root)

    val records = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val stats = Compaction.fileStats(spark, root, Seq("part")).collect()
      org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
      assert(stats.length == 3)
      assert(records.get == 0,
        s"planning must not read data rows, read ${records.get}")
      // the local-relation collect is allowed a job; the point is no job
      // SCANNED the table — records==0 plus a tiny job budget pins that
      assert(jobs.get <= 1, s"planning ran ${jobs.get} jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("zero-row part-files are visible to planning and swept by compaction") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-empty").resolve("t")
    val df = (1L to 100L).map(i => (i, i % 2, s"row $i")).toDF("id", "part", "v")
    df.coalesce(1).write.partitionBy("part").parquet(root.toString)
    // drop an EMPTY parquet file into part=0 — an upstream writer's empty
    // task output: invisible to a _metadata row scan, real litter on disk
    df.filter(lit(false)).select("id", "v").coalesce(1)
      .write.mode("append").parquet(root.resolve("part=0").toString)
    assert(partFiles(root.resolve("part=0").toFile).size == 2)

    val stats = Compaction.fileStats(spark, root.toString, Seq("part"))
      .collect().map(r => r.get(0).toString -> r.getAs[Long]("n_files")).toMap
    assert(stats("0") == 2L, s"listing must count the empty file: $stats")
    assert(stats("1") == 1L)
    val legacy = Compaction.fileStatsFromMetadata(spark, root.toString, Seq("part"))
      .collect().map(r => r.get(0).toString -> r.getAs[Long]("n_files")).toMap
    assert(legacy("0") == 1L, "fixture: the row-scan path is blind to it")

    val res = Compaction.compactPath(spark, root.toString, Seq("part"))
    assert(res.partitionsSelected == 1 && res.filesBefore == 2)
    assert(partFiles(root.resolve("part=0").toFile).size == 1,
      "compaction must sweep the empty file")
    assert(spark.read.parquet(root.toString).count() == 100)
  }

  test("capped runs compact the worst-fragmented partitions first") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-cap").resolve("t").toString
    val df = (1L to 600L).map(i => (i, i % 2, s"row $i")).toDF("id", "part", "v")
    // part 0: 12 files; part 1: 3 files — both fragmented
    df.filter(col("part") === 0).repartition(12)
      .write.partitionBy("part").parquet(root)
    df.filter(col("part") === 1).repartition(3)
      .write.mode("append").partitionBy("part").parquet(root)
    val res = Compaction.compactPath(spark, root, Seq("part"), maxPartitions = 1)
    assert(res.partitionsSelected == 1 && res.filesBefore == 12,
      s"the 12-file partition must win the capped slot: $res")
    assert(partFiles(new java.io.File(root, "part=0")).size == 1)
    assert(partFiles(new java.io.File(root, "part=1")).size == 3,
      "the less-fragmented partition waits for the next run")
  }

  test("compactPath with zorderCols clusters while it packs") {
    import spark.implicits._
    val base = TempDirs.create("graft-compact-z")
    // two independent uniform keys — a salted rewrite gives every output
    // file the full range of both; the z rewrite must give rectangles
    val n = 4096
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % n), ((i * 40503L) % n), (i % 2).toLong,
        s"payload $i " * 30)
    }.toDF("x", "y", "part", "payload")
    def fragment(root: String): Unit =
      df.repartition(16).write.partitionBy("part").parquet(root)
    def avgSpan(root: String, c: String): Double =
      spark.read.parquet(root).withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("s"))
        .agg(avg("s")).head().getDouble(0)
    val salted = base.resolve("salt").toString
    val zed = base.resolve("z").toString
    fragment(salted); fragment(zed)
    val before = spark.read.parquet(zed).orderBy("x", "y")
      .collect().map(_.toSeq).toSeq

    val rs = Compaction.compactPath(spark, salted, Seq("part"),
      targetFileBytes = 16 << 10)
    val rz = Compaction.compactPath(spark, zed, Seq("part"),
      targetFileBytes = 16 << 10, zorderCols = Seq("x", "y"))
    // same bin-pack guarantees in both modes; enough bins that the z grid
    // divides BOTH dimensions (≥4 files per partition = a 2×2+ tile grid)
    assert(rz.partitionsSelected == 2 && rz.filesAfter < rz.filesBefore,
      rz.toString)
    assert(rz.filesAfter >= 8, s"need a multi-file grid for the span check: $rz")
    assert(rz.filesAfter == rs.filesAfter,
      s"z mode must pack to the same file count: $rz vs $rs")
    // rows and columns pass through unchanged
    assert(spark.read.parquet(zed).orderBy("x", "y")
      .collect().map(_.toSeq).toSeq == before)
    // the salted layout scatters both keys across every file; the z layout
    // keeps narrow per-file rectangles on both (the property a later
    // selective scan prunes on)
    assert(avgSpan(salted, "y") > 3500.0, s"salt y span ${avgSpan(salted, "y")}")
    assert(avgSpan(zed, "x") < 3000.0, s"z x span ${avgSpan(zed, "x")}")
    assert(avgSpan(zed, "y") < 3000.0, s"z y span ${avgSpan(zed, "y")}")
  }

  test("per-partition file counts respect each partition's own bin-pack target") {
    import spark.implicits._
    val root = TempDirs.create("graft-compact-target").resolve("t").toString
    // skewed partitions: part 0 has 10× the rows of part 1; a tiny
    // targetFileBytes forces multi-file targets that differ per partition
    val big = (1L to 2000L).map(i => (i, 0L, "x" * 100))
    val small = (2001L to 2200L).map(i => (i, 1L, "x" * 100))
    (big ++ small).toDF("id", "part", "payload")
      .repartition(16).write.partitionBy("part").parquet(root)
    // partition discovery infers `part` as int — read it type-agnostically
    val stats = Compaction.fileStats(spark, root, Seq("part"), targetFileBytes = 16 << 10)
      .collect().map(r => r.get(0).toString.toLong -> r.getAs[Long]("target_files")).toMap
    val res = Compaction.compactPath(spark, root, Seq("part"),
      targetFileBytes = 16 << 10)
    assert(res.partitionsSelected == 2)
    (0 to 1).foreach { p =>
      val n = partFiles(new File(root, s"part=$p")).size
      assert(n <= stats(p.toLong), s"part=$p wrote $n files, target ${stats(p.toLong)}")
    }
    // the skewed partition genuinely split into multiple files
    assert(partFiles(new File(root, "part=0")).size > 1,
      s"targets=$stats result=$res")
  }
}
