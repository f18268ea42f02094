package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query with timing and optional plan dump.
  * Usage: runMain graft.QueryDebug <name> [sfDir] [explain] [repeat]
  */
object QueryDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val repeat = args.find(_.startsWith("repeat=")).map(_.stripPrefix("repeat=").toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.codegen.wholeStage", (!args.contains("nocodegen")).toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // multi-query session: see GraftSession.builder codegen-cache note
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[debug] run $i: $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (doExplain && i == 1) df.explain("formatted")
    }
    spark.stop()
  }
}
