package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics: job-level timing for one SparkEntry query —
  * `Test/runMain graft.tools.Q100Profile [queryName] [sfDir]`. */
object Q100Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q100_bloom_gated_ingest")
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        done.add((si.stageId, si.name, dur, si.numTasks))
      }
    })
    // warm up
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    done.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val all = done.asScala.toSeq
    println(f"=== $name wall ${wall}%.1f s, ${all.size} stages, stage-time sum ${all.map(_._3).sum / 1000.0}%.1f s ===")
    println("--- by callsite (total ms, count) ---")
    all.groupBy(_._2).toSeq.sortBy(-_._2.map(_._3).sum).take(40)
      .foreach { case (n, ss) =>
        println(f"${ss.map(_._3).sum / 1000.0}%8.2f s  x${ss.size}%-4d tasks=${ss.map(_._4).sum}%-6d $n")
      }
    println("--- slowest stages ---")
    all.sortBy(-_._3).take(25).foreach { case (id, n, ms, nt) =>
      println(f"stage $id%4d ${ms / 1000.0}%8.2f s tasks=$nt%-5d $n")
    }
    spark.stop()
  }
}
