package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: run one pipeline-composition query and print the per-step
  * durations its own execution log recorded (the audit rows double as a
  * profiler — each `ExecutionLogger.logged` step carries start/end
  * timestamps). The scratch dirs live until JVM exit, so the log is read
  * back in-process after the run.
  *
  * Usage: runMain graft.PipelineProfile <name> [sfDir] [repeat=N]
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).contains("=")) args(1)
      else "/root/testdata/sf0.1"
    val repeat = args.find(_.startsWith("repeat="))
      .map(_.stripPrefix("repeat=").toInt).getOrElse(1)
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
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // job-level attribution: record every job's wall time + call site so the
    // per-step log rows can be broken down further (guide §1.5)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val p = Option(e.properties)
          val desc = p.flatMap(x => Option(x.getProperty("spark.job.description")))
            .getOrElse("?") + " | " +
            p.flatMap(x => Option(x.getProperty("callSite.short"))).getOrElse("?")
          jobs.put(e.jobId, (desc, System.nanoTime()))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId)).foreach { case (desc, t0) =>
            done.add((e.jobId, desc, (System.nanoTime() - t0) / 1e9))
          }
        }
      })
    (1 to repeat).foreach { i =>
      done.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] run $i: $name rows=$n wall=$wall%.2f s")
    }
    org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
    locally {
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq.sortBy(_._1)
      println(f"[profile] last run: ${all.size} jobs, " +
        f"${all.map(_._3).sum}%.2f s summed job wall")
      all.filter(_._3 >= 0.05).foreach { case (id, desc, s) =>
        println(f"[profile] job $id%4d $s%7.3f s  ${desc.take(110)}")
      }
    }
    // newest scratch dir of this query's prefix (e.g. graft_q74_)
    val prefix = "graft_" + name.split("_")(0) + "_"
    val tmp = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val metaDirs = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .sortBy(-_.lastModified())
      .map(f => new java.io.File(f, "meta/execution_log"))
      .filter(_.exists())
    metaDirs.headOption match {
      case None => println(s"[profile] no meta/execution_log under $tmp/$prefix*")
      case Some(log) =>
        val rows = spark.read.parquet(log.getAbsolutePath)
          .withColumn("secs",
            (col("execution_end_ts").cast("double")
              - col("execution_start_ts").cast("double")))
          .select("target_table", "execution_status", "secs",
            "records_inserted", "records_deleted")
          .orderBy(col("execution_start_ts"))
          .collect()
        println(f"[profile] ${"step"}%-28s ${"status"}%-8s ${"secs"}%8s  in/del")
        var total = 0.0
        rows.foreach { r =>
          val s = r.getDouble(2); total += s
          println(f"[profile] ${r.getString(0)}%-28s ${r.getString(1)}%-8s $s%8.3f  ${r.getLong(3)}/${r.getLong(4)}")
        }
        println(f"[profile] sum of logged steps: $total%.2f s")
    }
    spark.stop()
  }
}
