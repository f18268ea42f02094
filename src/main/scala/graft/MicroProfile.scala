package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-level attribution for one operator pipeline — prints
  * every completed stage's name, task count and summed executor run time,
  * so a job whose tasks burn CPU can be traced to the exact plan stage
  * (guide §1.1/§7.1 empirics without the UI, which the bench disables).
  *
  * Usage: runMain graft.MicroProfile <case> [sfDir]
  */
object MicroProfile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("banded")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          stages.add((si.stageId, si.name.take(120), si.numTasks,
            si.taskMetrics.executorRunTime))
        }
      })
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val b2 = d.filter(col("doc_id") % 3 === 1)
      .union(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      .union(d.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat(col("text"), lit(" zzz extra tail")).as("text")))

    def timed(label: String)(body: => Unit): Unit = {
      stages.clear()
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      val (n0, t0c) = (cm.METRIC_SOURCE_CODE_SIZE.getCount,
        cm.METRIC_COMPILATION_TIME.getCount)
      val ct0 = cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      val compiles = cm.METRIC_COMPILATION_TIME.getCount - t0c
      println(f"[micro] $label wall=$wall%.2f s compiles=$compiles " +
        f"(sources ${cm.METRIC_SOURCE_CODE_SIZE.getCount - n0})")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, name, n, ms) =>
        if (ms >= 200)
          println(f"[micro]   stage $id%4d tasks=$n%4d taskSum=${ms / 1e3}%7.2f s  $name")
      }
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    which match {
      case "banded" =>
        (1 to 2).foreach { i =>
          timed(s"lshBanded b2 run$i") {
            noop(graft.operators.Dedup.lshBanded(b2, "doc_id", "text",
              3, 8, 4, portable = true))
          }
        }
      case "shingles" =>
        (1 to 2).foreach { i =>
          timed(s"wordShingles b2 run$i") {
            noop(graft.operators.Dedup.wordShingles(b2, "doc_id", "text", 3))
          }
        }
      case "sig" =>
        (1 to 2).foreach { i =>
          timed(s"minhashSignature b2 run$i") {
            noop(graft.operators.Dedup.minhashSignature(
              graft.operators.Dedup.wordShingles(b2, "doc_id", "text", 3),
              "doc_id", 8, portable = true))
          }
        }
      case other => println(s"unknown case $other")
    }
    spark.stop()
  }
}
