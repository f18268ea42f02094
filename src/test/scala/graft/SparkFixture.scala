package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Scratch dirs for specs, all deleted when the test JVM exits — suites
  * must not accumulate /tmp litter across runs. Use this instead of
  * `Files.createTempDirectory` (or a try/finally for dirs that can go
  * earlier, like DqSuiteSpec.withTempDir). */
object TempDirs {
  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.synchronized(dirs.toList).foreach { p =>
        try {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
          finally walk.close()
        } catch { case _: Throwable => () } // exit-time best effort
      }))
  }
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.synchronized { dirs += p }
    p
  }
}

/** Shared local session for specs: small parallelism, engine configs. */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        TempDirs.create("graft-warehouse").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends BeforeAndAfterAll { this: Suite =>
  lazy val spark: SparkSession = SparkFixture.spark
}
