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
