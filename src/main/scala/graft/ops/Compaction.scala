package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Warn

/** Result of a [[Compaction.compactPath]] run. Counts are scoped to the
  * SELECTED partitions (the rewrite set): untouched partitions appear in
  * neither side. */
final case class CompactionResult(
    partitionsSelected: Int,
    filesBefore: Long,
    filesAfter: Long,
    bytesRewritten: Long)

/**
 * Small-file compaction for partitioned parquet layouts — the table-
 * maintenance half of the incremental-load story. The reference's nightly
 * loads append a day's slice per run (ref:
 * docs/KIMBALL_CDC_DATA_DESIGN.md:289-296); on immutable storage each
 * append lands one-file-per-task, so a year of loads leaves thousands of
 * KB-sized files per partition and every later scan pays an open/seek per
 * file. The warehouse the reference targets compacts micro-partitions
 * automatically; on plain parquet it must be an operator.
 *
 * Scale shape, deliberately partition-scoped like
 * [[graft.merge.Upsert.mergeIntoTable]]:
 *
 *  - File statistics come from a distributed `_metadata` scan (footer-only:
 *    the projection reads no data columns), grouped per partition — never a
 *    driver-side recursive listing of a 100 TB tree.
 *  - Only partitions with MORE files than their bin-pack target
 *    (`ceil(bytes / targetFileBytes)`, min 1) are rewritten; the rest are
 *    neither read nor written. The rewrite reads the selected slice through
 *    partition pruning, salts rows into `target` buckets per partition, and
 *    writes back via DYNAMIC partition overwrite — one job for all selected
 *    partitions.
 *  - Per-partition output file count is bounded by the salt fan-in: a
 *    (partition, salt) group hashes to exactly one task, so a partition
 *    never produces more files than its target (AQE coalescing can only
 *    merge groups, lowering the count further).
 */
object Compaction {

  /** Per-partition file statistics from a footer-only `_metadata` scan:
    * (partition cols..., n_files, total_bytes, target_files). For an
    * unpartitioned layout (`partCols` empty) returns one global row. */
  def fileStats(spark: SparkSession, path: String, partCols: Seq[String],
      targetFileBytes: Long = DefaultTargetFileBytes): DataFrame = {
    val df = spark.read.parquet(path)
    val pcols = partCols.map(col)
    // one row per file first (file_size is constant within a file), then
    // per partition — both aggregations are metadata-sized
    val perFile = df
      .select(pcols :+ col("_metadata.file_path").as("__f")
        :+ col("_metadata.file_size").as("__sz"): _*)
      .groupBy(col("__f") +: pcols: _*).agg(max(col("__sz")).as("__sz"))
    perFile.groupBy(pcols: _*)
      .agg(count(lit(1)).as("n_files"), sum(col("__sz")).as("total_bytes"))
      .withColumn("target_files",
        greatest(lit(1L), ceil(col("total_bytes") / lit(targetFileBytes.toDouble))))
  }

  val DefaultTargetFileBytes: Long = 128L << 20

  /** Most partitions one run will rewrite — beyond this the job approaches
    * a full-table rewrite and should be split across runs (same bound
    * rationale as [[graft.merge.Upsert.MaxTouchedPartitions]]). */
  val MaxCompactedPartitions: Int = 10000

  /**
   * Bin-pack the over-fragmented partitions of `path` down to
   * ~`targetFileBytes` files, rewriting ONLY those partitions (dynamic
   * partition overwrite; untouched partitions' files are never read nor
   * replaced). Contents are bit-for-bit row-preserving — only file layout
   * changes. Returns exact before/after file counts for the rewritten set.
   */
  def compactPath(spark: SparkSession, path: String, partCols: Seq[String],
      targetFileBytes: Long = DefaultTargetFileBytes): CompactionResult = {
    val stats = fileStats(spark, path, partCols, targetFileBytes)
      .filter(col("n_files") > col("target_files"))
      .limit(MaxCompactedPartitions + 1)
      .collect()
    if (stats.length > MaxCompactedPartitions)
      Warn(s"compactPath($path): more than $MaxCompactedPartitions " +
        "fragmented partitions; compacting the first " +
        s"$MaxCompactedPartitions this run — re-run for the rest")
    val selected = stats.take(MaxCompactedPartitions)
    if (selected.isEmpty)
      return CompactionResult(0, 0L, 0L, 0L)

    val filesBefore = selected.map(_.getAs[Long]("n_files")).sum
    val bytes = selected.map(_.getAs[Long]("total_bytes")).sum
    val df = spark.read.parquet(path)

    def tuplePred(row: Row): Column =
      if (partCols.isEmpty) lit(true)
      else partCols.map { c =>
        val i = row.fieldIndex(c)
        if (row.isNullAt(i)) col(c).isNull else col(c) === lit(row.get(i))
      }.reduce(_ && _)
    val slicePred = selected.map(tuplePred).reduce(_ || _)

    // Each selected partition owns a contiguous range of global BIN ids
    // (offset .. offset + target_files): rows hash-salt into their
    // partition's range, and an EXACT partitioner routes bin i to shuffle
    // partition i — one task per bin, one file per bin. Hash-partitioning
    // `repartition(partCols, salt)` cannot make that guarantee (distinct
    // groups collide into one task, collapsing the bin-pack), and
    // range-partitioning only samples; this is the one step the DataFrame
    // API genuinely can't express, so the exchange drops to an RDD
    // partitioner for the write job only.
    val dataCols = df.columns.toSeq
    val slice =
      if (partCols.isEmpty) {
        val n = selected.head.getAs[Long]("target_files").toInt
        df.repartition(n) // explicit count: round-robin, one file per task
      } else {
        // target map under __t_-prefixed names: the join must not shadow
        // the data frame's own partition columns
        var offset = 0L
        val targets = selected.map { r =>
          val nf = r.getAs[Long]("target_files")
          val row = Row.fromSeq(partCols.map(c => r.get(r.fieldIndex(c))) :+
            nf :+ offset)
          offset += nf
          row
        }
        val nBins = offset.toInt
        val tschema = org.apache.spark.sql.types.StructType(
          df.select(partCols.map(col): _*).schema.fields.map(f =>
            f.copy(name = "__t_" + f.name)) ++ Seq(
            org.apache.spark.sql.types.StructField("__nf",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("__off",
              org.apache.spark.sql.types.LongType, nullable = false)))
        val tdf = spark.createDataFrame(
          spark.sparkContext.parallelize(targets.toSeq, 1), tschema)
        val binned = df.filter(slicePred)
          .join(broadcast(tdf),
            partCols.map(c => col(c) <=> col("__t_" + c)).reduce(_ && _))
          .withColumn("__bin",
            col("__off") + pmod(xxhash64(dataCols.map(col): _*), col("__nf")))
          .select(col("__bin") +: dataCols.map(col): _*)
        val exactRdd = binned.rdd
          .map(r => (r.getLong(0), Row.fromSeq(r.toSeq.drop(1))))
          .partitionBy(new org.apache.spark.Partitioner {
            override def numPartitions: Int = nBins
            override def getPartition(key: Any): Int =
              key.asInstanceOf[Long].toInt
          })
          .map(_._2)
        spark.createDataFrame(exactRdd,
          org.apache.spark.sql.types.StructType(
            dataCols.map(c => df.schema(c))))
      }

    // the rewrite reads the path it overwrites — truncate lineage first
    // (the mergeIntoTable pattern); only the selected slice materializes
    val materialized = slice.localCheckpoint(true)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "dynamic")
      val w = materialized.write.mode(SaveMode.Overwrite)
      (if (partCols.isEmpty) w else w.partitionBy(partCols: _*)).parquet(path)
    } finally before match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }

    val after = fileStats(spark, path, partCols, targetFileBytes)
    val filesAfter =
      (if (partCols.isEmpty) after
       else after.filter(selected.map(tuplePred).reduce(_ || _)))
        .agg(sum(col("n_files"))).collect()(0).getLong(0)
    CompactionResult(selected.length, filesBefore, filesAfter, bytes)
  }
}
