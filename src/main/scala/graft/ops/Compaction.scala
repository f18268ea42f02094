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
 *  - File statistics come from a STREAMING filesystem listing (a
 *    `RemoteIterator` walk, the same O(#files) metadata pass Spark's own
 *    scan planning performs): no Spark job, no data bytes read, bounded
 *    driver memory (one counter per partition), and zero-row part-files
 *    are counted — a `_metadata` ROW scan (kept as
 *    [[fileStatsFromMetadata]] for catalogs without a listable
 *    filesystem) aggregates per data row, which is a large compute job at
 *    100 TB and is blind to empty files.
 *  - Only partitions with MORE files than their bin-pack target
 *    (`ceil(bytes / targetFileBytes)`, min 1) are rewritten, WORST
 *    fragmentation first (so capped runs converge re-run over re-run);
 *    the rest are neither read nor written. The rewrite reads the
 *    selected slice through partition pruning, salts rows into `target`
 *    buckets per partition, and writes back via DYNAMIC partition
 *    overwrite — one job for all selected partitions.
 *  - Per-partition output file count is bounded by the salt fan-in: a
 *    (partition, salt) group hashes to exactly one task, so a partition
 *    never produces more files than its target (AQE coalescing can only
 *    merge groups, lowering the count further).
 */
object Compaction {

  /** Hive partition-path unescape: %XX sequences back to chars. Pure
    * decoding — the `__HIVE_DEFAULT_PARTITION__` null sentinel is matched
    * on the RAW directory token by the caller, as Spark's
    * PartitioningUtils does, so a percent-escaped variant stays a literal
    * string exactly like a reader of the table sees it. */
  private def unescapePathName(v: String): String = {
    if (!v.contains('%')) return v
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '%' && i + 2 < v.length) {
        try { sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /**
   * Per-partition file statistics from a STREAMING filesystem listing:
   * (partition cols..., n_files, total_bytes, target_files). For an
   * unpartitioned layout (`partCols` empty) returns one global row.
   *
   * O(#files) metadata I/O — the same `RemoteIterator` walk Spark's own
   * scan planning performs — with NO Spark job and no data bytes read
   * (spec-asserted): a pure-metadata question must not cost a compute job
   * over trillions of rows at 100 TB. Driver memory is one counter pair
   * per PARTITION (not per file), the same driver-side bound the
   * compaction plan itself carries. Unlike the `_metadata` row scan
   * ([[fileStatsFromMetadata]]) this also counts ZERO-ROW part-files —
   * an upstream writer's empty task output is exactly the small-file
   * litter compaction exists to sweep. Partition values are parsed from
   * the directory names and cast to the layout's inferred column types,
   * matching what a reader of the table sees.
   */
  def fileStats(spark: SparkSession, path: String, partCols: Seq[String],
      targetFileBytes: Long = DefaultTargetFileBytes): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(root)
    val rootUri = qualified.toUri
    // key = partition values in partCols order; value = (n_files, bytes)
    val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Array[Long]]
    val it = fs.listFiles(qualified, true)
    while (it.hasNext) {
      val st = it.next()
      val segs = rootUri.relativize(st.getPath.toUri).getPath.split('/')
      val hidden = segs.exists(d => d.startsWith("_") || d.startsWith("."))
      if (!hidden && st.isFile) {
        val kv = segs.dropRight(1).flatMap { d =>
          val i = d.indexOf('=')
          if (i < 0) None
          else {
            // the null-partition token parses to NULL — that is what a
            // reader of the table sees. Matched on the RAW token, before
            // unescaping, to mirror Spark's PartitioningUtils exactly: a
            // percent-escaped variant (%5F%5FHIVE...) is a literal string
            // to Spark's reader and must stay one here too
            val raw = d.drop(i + 1)
            val value =
              if (raw == "__HIVE_DEFAULT_PARTITION__") null
              else unescapePathName(raw)
            Some(unescapePathName(d.take(i)) -> value)
          }
        }.toMap
        val a = acc.getOrElseUpdate(partCols.map(kv.getOrElse(_, null)),
          Array(0L, 0L))
        a(0) += 1; a(1) += st.getLen
      }
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      partCols.map(c => org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.StringType, nullable = true)) ++ Seq(
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("total_bytes",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[Row] =
      acc.map { case (k, a) => Row.fromSeq(k ++ Seq(a(0), a(1))) }.toList.asJava
    val raw = spark.createDataFrame(rows, schema)
    // cast partition values to the types a reader of this layout infers,
    // so downstream predicates compare like-with-like. Schema inference
    // reads one footer + the (already-paid) listing — no data scan.
    val typed =
      if (partCols.isEmpty) raw
      else {
        val inferred = spark.read.parquet(path).schema
        partCols.foldLeft(raw)((d, c) =>
          d.withColumn(c, col(c).cast(inferred(c).dataType)))
      }
    typed.withColumn("target_files",
      greatest(lit(1L), ceil(col("total_bytes") / lit(targetFileBytes.toDouble))))
  }

  /** The former planning path: per-partition stats from a footer-only
    * `_metadata` column scan. Correct wherever `spark.read.parquet` works
    * (including catalogs with no listable filesystem), but it is a Spark
    * job whose aggregation processes one row per DATA ROW — O(rows), not
    * O(#files) — and zero-row part-files are invisible to it (no rows to
    * carry their `_metadata`). Prefer [[fileStats]]. */
  def fileStatsFromMetadata(spark: SparkSession, path: String, partCols: Seq[String],
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
   *
   * `zorderCols` makes the rewrite CLUSTER while it packs: rows bin by
   * their [[ZOrder]] z-value range (not a random salt) and sort by z within
   * each output file, so a maintenance pass preserves — or creates — the
   * multi-column layout selective scans prune on, instead of the salt
   * destroying whatever locality the partition had. Same file-count
   * guarantees (a bin is still exactly one task / one file); bin SIZES
   * follow the z distribution instead of the salt's uniformity, so heavy
   * key skew can imbalance files (the documented linear-bucket caveat).
   */
  def compactPath(spark: SparkSession, path: String, partCols: Seq[String],
      targetFileBytes: Long = DefaultTargetFileBytes,
      maxPartitions: Int = MaxCompactedPartitions,
      zorderCols: Seq[String] = Nil,
      zorderBits: Int = ZOrder.DefaultBits,
      minExcessFiles: Long = 0L): CompactionResult = {
    // worst fragmentation first: when the cap defers work to a later run,
    // each run takes the partitions with the most excess files, so capped
    // re-runs converge instead of revisiting an arbitrary subset.
    // `minExcessFiles` raises the entry bar: a partition is rewritten only
    // when it exceeds its target by MORE than this many files — the knob a
    // nightly cadence uses so a handful of small appended files don't buy
    // a full partition rewrite every night (file-count-driven probe cost
    // only degrades once litter accumulates; SCALE.md round 14)
    val stats = fileStats(spark, path, partCols, targetFileBytes)
      .filter(col("n_files") > col("target_files") + lit(minExcessFiles))
      .orderBy((col("n_files") - col("target_files")).desc)
      .limit(maxPartitions + 1)
      .collect()
    if (stats.length > maxPartitions)
      Warn(s"compactPath($path): more than $maxPartitions " +
        "fragmented partitions; compacting the worst " +
        s"$maxPartitions this run — re-run for the rest")
    val selected = stats.take(maxPartitions)
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
    val useZ = zorderCols.nonEmpty
    if (useZ) ZOrder.validateKeys(df, zorderCols, zorderBits)
    val slice =
      if (partCols.isEmpty) {
        val n = selected.head.getAs[Long]("target_files").toInt
        if (useZ) ZOrder.zorderBy(df, zorderCols, n, zorderBits)
        else df.repartition(n) // explicit count: round-robin, one file per task
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
        val sliceDf = df.filter(slicePred)
        // z mode: rows route to a bin by their z-RANGE slot inside the
        // partition (each output file covers a contiguous z rectangle) and
        // sort by z within the bin; salt mode: uniform hash of all columns
        val withZ =
          if (useZ) sliceDf.withColumn("__z",
            ZOrder.zValue(sliceDf, zorderCols, zorderBits))
          else sliceDf
        val binInPart =
          if (useZ) {
            val span = math.pow(2.0, (zorderCols.size * zorderBits).toDouble)
            least(col("__nf") - 1, greatest(lit(0L),
              floor(col("__z").cast("double") / lit(span)
                * col("__nf")).cast("long")))
          } else pmod(xxhash64(dataCols.map(col): _*), col("__nf"))
        val carried = (if (useZ) Seq(col("__z")) else Nil) ++ dataCols.map(col)
        val binned = withZ
          .join(broadcast(tdf),
            partCols.map(c => col(c) <=> col("__t_" + c)).reduce(_ && _))
          .withColumn("__bin", col("__off") + binInPart)
          .select(col("__bin") +: carried: _*)
        val exactRdd = binned.rdd
          .map(r => (r.getLong(0), Row.fromSeq(r.toSeq.drop(1))))
          .partitionBy(new org.apache.spark.Partitioner {
            override def numPartitions: Int = nBins
            override def getPartition(key: Any): Int =
              key.asInstanceOf[Long].toInt
          })
          .map(_._2)
        val carriedSchema = org.apache.spark.sql.types.StructType(
          (if (useZ) Seq(org.apache.spark.sql.types.StructField("__z",
            org.apache.spark.sql.types.LongType, nullable = true)) else Nil) ++
            dataCols.map(c => df.schema(c)))
        val packed = spark.createDataFrame(exactRdd, carriedSchema)
        if (useZ) packed.sortWithinPartitions(col("__z")).drop("__z")
        else packed
      }

    // the rewrite reads the path it overwrites — truncate lineage first
    // (the mergeIntoTable pattern); only the selected slice materializes
    val materialized = slice.localCheckpoint(true)
    // dynamic overwrite as a WRITER OPTION, not a session-conf set/restore:
    // the option takes precedence over the conf and is scoped to this one
    // write, so concurrent compactions (the pipeline's parallel per-index
    // maintenance) can never race a conf restore into a STATIC overwrite —
    // which would silently truncate every untouched partition
    val w = materialized.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*)).parquet(path)
    // the rewrite replaced files under an unchanged path: a cached plan
    // (or cached listing) over it would keep serving the pre-compaction
    // files — some already deleted — so invalidate both
    spark.catalog.refreshByPath(path)

    val after = fileStats(spark, path, partCols, targetFileBytes)
    val filesAfter =
      (if (partCols.isEmpty) after
       else after.filter(selected.map(tuplePred).reduce(_ || _)))
        .agg(sum(col("n_files"))).collect()(0).getLong(0)
    CompactionResult(selected.length, filesBefore, filesAfter, bytes)
  }
}
