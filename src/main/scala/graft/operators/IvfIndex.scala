package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/**
 * Persistence lifecycle for the IVF ANN index — [[BandIndex]]'s sibling for
 * [[Similarity.ivfTopK]]. A standing 100 TB corpus does not re-assign every
 * vector to its cell for every query batch: cells are computed ONCE, saved
 * partitioned by `cell`, and each query batch reads only the cell
 * directories its queries land in (partition pruning at the parquet scan —
 * spec-asserted). The reference's incremental pattern is the same standing-
 * mart shape as the band index (ref:
 * /root/reference/docs/KIMBALL_CDC_DATA_DESIGN.md:289-296).
 *
 *   - [[save]]: assign the corpus to its nearest centroid and write
 *     `path/centroids` (tiny, one file) + `path/cells` partitioned by
 *     `cell`, vectors pre-quantized so probes skip re-quantization.
 *   - [[append]]: assign an ingest batch with the SAVED centroids and
 *     append its rows — only the touched cell directories gain files.
 *   - [[probe]]: assign a query batch (broadcast argmax, zero shuffle),
 *     read only its cells, exact in-cell re-rank via the bounded-heap
 *     top-k. `nprobe > 1` searches each query's `nprobe` nearest cells —
 *     recall approaches brute force as nprobe → numCentroids (spec-proven
 *     equal at nprobe = numCentroids).
 *   - [[cellStats]]: per-cell row counts — the skew/imbalance audit
 *     (a hot cell is IVF's saturated-bucket analogue).
 *
 * Cell ids are stored as INT partition values (guarded at save) so the
 * probe's static `isin` filter matches the partition column's read-back
 * type exactly — a type mismatch would insert a cast on the partition
 * attribute and silently defeat directory pruning.
 *
 * Per-batch appends accumulate small files; the index is an ordinary
 * cell-partitioned parquet table, so
 * [[graft.ops.Compaction.compactPath]] maintains it like any other.
 */
object IvfIndex {

  private val CellCol = "cell"

  /** Identifies the vector quantization the index stores ([[Vectors.quantize]]
    * = floor(x·1e7) longs). Bump when the scheme changes: an index probed by
    * a build with a DIFFERENT scheme would compare incompatible integer
    * grids and silently mis-rank. */
  val QuantizationVersion = "int-1e7-v1"

  private def centroidsPath(path: String) = s"$path/centroids"
  private def cellsPath(path: String) = s"$path/cells"

  private def recordMeta(spark: SparkSession, path: String,
      dims: Int, numCentroids: Long): Unit =
    IndexMeta.write(spark, path, Map("kind" -> "ivf",
      "dims" -> dims.toString, "numCentroids" -> numCentroids.toString,
      "quantization" -> QuantizationVersion))

  /** The index parameters recorded at [[save]] (empty for a pre-guard index). */
  def readParams(spark: SparkSession, path: String): Map[String, String] =
    IndexMeta.read(spark, path)

  /** Fail fast when a probe/append batch's vector geometry or this build's
    * quantization scheme drifts from what the saved index records —
    * [[BandIndex.checkParams]]'s sibling. A dim-drifted batch otherwise
    * throws deep inside the dot-product scorer (or silently mis-ranks if
    * the drifted prefix happens to be comparable); a quantization drift
    * mis-ranks with no error at all. No-op for an index that recorded no
    * marker (pre-guard saves). */
  private def checkCompat(spark: SparkSession, path: String,
      df: DataFrame, vec: String, op: String): Unit = {
    val saved = IndexMeta.read(spark, path)
    if (saved.isEmpty) return
    saved.get("quantization").filter(_ != QuantizationVersion).foreach { q =>
      throw new IllegalStateException(
        s"IVF index at $path stores vectors quantized as '$q' but this build " +
          s"quantizes as '$QuantizationVersion' — integer grids from " +
          "different schemes silently mis-rank; rebuild the index")
    }
    // one tiny first-row job on the batch (probes are small by contract;
    // for appends the limit(1) stops at the first non-empty partition)
    val batchDims = df.select(size(col(vec)).cast("int").as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
    (saved.get("dims").map(_.toInt), batchDims) match {
      case (Some(d0), Some(d)) if d0 != d =>
        throw new IllegalStateException(
          s"IVF index at $path was built for $d0-dimensional vectors but " +
            s"this $op batch carries $d dimensions — cell assignment and " +
            "in-cell scores would be wrong; rebuild the index or fix the batch")
      case _ => ()
    }
  }

  /** Quantized centroid frame `(cent_id int, __cent, __centn)` with the
    * int-cell contract enforced (the frame is ≤ numCentroids rows, so the
    * guard collect is bounded by construction). */
  private[operators] def intCentroids(cents: DataFrame): DataFrame = {
    // a non-numeric id column (string uuids, which the in-memory window
    // fallback tolerates) must raise the contract error up front — ANSI
    // throws CAST_INVALID_INPUT mid-job and legacy mode casts to null and
    // NPEs at getLong, both opaque
    require(cents.schema("cent_id").dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      "IvfIndex stores cell ids as INT partition values; centroid id column " +
        s"has non-numeric type ${cents.schema("cent_id").dataType} — pass " +
        "integer cell ids")
    val rows = cents.select(col("cent_id").cast("long")).collect()
    require(rows.forall(!_.isNullAt(0)),
      "IvfIndex stores cell ids as INT partition values; a centroid id is null")
    val ids = rows.map(_.getLong(0))
    require(ids.forall(v => v >= Int.MinValue && v <= Int.MaxValue),
      s"IvfIndex stores cell ids as INT partition values; centroid id out of " +
        s"range: ${ids.filterNot(v => v >= Int.MinValue && v <= Int.MaxValue).mkString(", ")}")
    cents.select(col("cent_id").cast("int").as("cent_id"),
      col("__cent"), col("__centn"))
  }

  private def assignForStorage(df: DataFrame, id: String, vec: String,
      centArr: DataFrame): DataFrame =
    Similarity.assignCells(df, id, vec, "neighbor_id", centArr)
      .select(col("neighbor_id"), col("__v").as("__cv"), col("__vn").as("__cn"),
        col(CellCol).cast("int").as(CellCol))
      // cluster by cell range before the partitioned write: without it every
      // upstream task writes into every cell directory it touches (tasks ×
      // cells small files — at cluster scale, 10k tasks × 1k cells is
      // millions of files). The exchange costs one shuffle of the quantized
      // assignment (build/append side only, never the probe side); write
      // parallelism is bounded by the distinct-cell count, which the sizing
      // guidance (cells ~ √N) keeps in the thousands at scale, and AQE
      // coalesces small appends down to ~one file per touched cell
      .repartitionByRange(col(CellCol))

  /**
   * Build and persist the index: centroids (default id-subset, or pass
   * [[Similarity.kmeansCentroids]] output) to `path/centroids`, and the
   * corpus's nearest-centroid assignment — with pre-quantized vectors — to
   * `path/cells` partitioned by `cell`. Overwrites a previous index at the
   * same path (rebuild-from-scratch semantics; growth is [[append]]).
   */
  def save(corpus: DataFrame, cId: String, cVec: String, path: String,
      numCentroids: Int = 8, centroids: Option[DataFrame] = None): Unit = {
    val cents = intCentroids(centroids.getOrElse(
      Similarity.defaultCentroids(corpus, cId, cVec, numCentroids)))
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    // assignment reads the JUST-SAVED centroids so the cells on disk are
    // guaranteed consistent with the centroid file probes will load
    val saved = corpus.sparkSession.read.parquet(centroidsPath(path))
    // assignment is a broadcast projection; the only shuffle at save is
    // assignForStorage's cell-range cluster (file-count hygiene, see there)
    assignForStorage(corpus, cId, cVec, Similarity.centroidArray(saved))
      .write.mode("overwrite").partitionBy(CellCol).parquet(cellsPath(path))
    // record the index geometry so a drifted probe/append fails fast
    // instead of mis-ranking ([[checkCompat]]); dims read off the saved
    // centroid file — the authority every probe will load
    val spark = corpus.sparkSession
    recordMeta(spark, path,
      dims = saved.select(size(col("__cent")).cast("int")).head().getInt(0),
      numCentroids = saved.count())
  }

  /** The saved centroid frame `(cent_id, __cent, __centn)`. */
  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(centroidsPath(path))

  /** The saved assignment frame `(neighbor_id, __cv, __cn, cell)`. */
  def loadCells(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(cellsPath(path))

  /** Assign an accepted ingest batch with the saved centroids and append —
    * only the batch's cell directories gain files; nothing is rewritten.
    * The nightly cycle is probe → drop duplicates / accept → append. */
  def append(batch: DataFrame, bId: String, bVec: String, path: String): Unit = {
    val spark = batch.sparkSession
    checkCompat(spark, path, batch, bVec, "append")
    val centArr = Similarity.centroidArray(loadCentroids(spark, path))
    assignForStorage(batch, bId, bVec, centArr)
      .write.mode("append").partitionBy(CellCol).parquet(cellsPath(path))
  }

  /** Retract vectors from the index — [[BandIndex.removeIds]]' contract
    * over the IVF layout: O(|ids|) tombstone append, every [[probe]]
    * subtracts the set from the corpus side, physical rewrite deferred to
    * [[vacuum]]. An [[append]] of a retracted id stays suppressed until
    * the vacuum — vacuum first when re-admitting retracted content. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.append(spark, path, ids)

  /** Physically drop retracted rows: only the CELL DIRECTORIES still
    * holding tombstoned rows are rewritten (touched-cell detection is a
    * pruned two-column scan); every other cell is byte-untouched, crash
    * recovery is [[PartitionVacuum]]'s rename-aside repair. Returns rows
    * removed. Run on the nightly-compaction cadence. */
  def vacuum(spark: SparkSession, path: String): Long =
    PartitionVacuum.vacuum(spark, path, cellsPath(path), CellCol,
      "neighbor_id")

  /**
   * Top-k neighbors (cosine, exact within the probed cells) for each query
   * against the persisted index. The query batch is assigned with the saved
   * centroids (broadcast argmax, zero shuffle), its touched cell ids are
   * collected (bounded by the centroid count, not the data), and the cells
   * scan carries a STATIC `cell IN (...)` filter — directory-level pruning,
   * so a probe reads O(touched cells) of the index regardless of corpus
   * size. Output schema and ordering semantics are identical to
   * [[Similarity.ivfTopK]]: (query_id, neighbor_id, rank, cosine), score
   * desc / id asc tie-break.
   *
   * `excludeIds` (one column, matching the stored id) removes those ids
   * from the CORPUS side before scoring — the replay-idempotence hook for
   * streaming ingest: re-probing a batch whose append already landed must
   * not pair the batch with its own rows (BandIndex.probe's contract). The
   * exclusion broadcasts (an ingest batch is small by contract), so the
   * cells scan stays directory-pruned.
   */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qId: String, qVec: String, k: Int, nprobe: Int = 1,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    checkCompat(spark, path, queries, qVec, "probe")
    val centArr = Similarity.centroidArray(loadCentroids(spark, path))
    // eager localCheckpoint: the assigned batch feeds BOTH the touched-cell
    // collect and the probe join — checkpointing computes the assignment
    // once (a query batch is small by contract) and detaches the plan from
    // the on-disk centroid/cell files, so a concurrent append can't skew a
    // half-evaluated probe
    val q = Similarity.assignCells(queries, qId, qVec, "query_id", centArr, nprobe)
      .withColumnRenamed("__v", "__qv").withColumnRenamed("__vn", "__qn")
      .withColumn(CellCol, col(CellCol).cast("int"))
      .localCheckpoint(true)
    // touched-cell list: one tiny job over the (small) query batch; ≤
    // numCentroids values by construction, so the driver-side collect is
    // bounded no matter how large the batch
    val touched = q.select(col(CellCol)).distinct().collect().map(_.getInt(0))
    val pruned = Tombstones.subtract(spark, path,
      loadCells(spark, path)
        .filter(col(CellCol).isin(touched.map(Int.box).toIndexedSeq: _*)),
      "neighbor_id")
    val cells = excludeIds match {
      case Some(ex) =>
        val exIds = broadcast(ex.toDF("__xid").distinct())
        pruned.join(exIds, pruned("neighbor_id") === col("__xid"), "left_anti")
      case None => pruned
    }
    // no ShuffleSizing raise here — MEASURED, not guessed (r12 flagged the
    // former expansionFactor = 2.0 as a guess): the cells side never
    // shuffles (the query batch broadcasts), and the only exchange in the
    // probe is rankTopK's partial BoundedTopK aggregate, whose volume is
    // ≤ tasks × queries × k heap entries regardless of corpus size —
    // task-metrics shuffle_write at 1M docs / 147,894 pruned cell records:
    // 0 MB (ScaleBench ann tier, SCALE.md round-13). A partition raise can
    // never help a shuffle that small.
    val scored = cells.join(broadcast(q), Seq(CellCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    Similarity.rankTopK(scored, k)
  }

  /** Per-cell row counts, largest first — the imbalance audit. A cell
    * holding a large fraction of the corpus means its centroid sits on a
    * density mode and probes landing there re-rank too many candidates;
    * the partition-scoped remedy is [[resplitCell]] (a full [[save]]
    * rebuild also works but rewrites every cell). */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    loadCells(spark, path).groupBy(col(CellCol))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("n_vectors").desc, col(CellCol).asc)

  /**
   * Partition-scoped remedy for a hot cell — the MERGE/compaction
   * philosophy applied to the index: re-cluster ONE over-dense cell's rows
   * into `subCells` k-means sub-centroids and rewrite only the directories
   * involved; every other cell's files are untouched (spec-asserted
   * byte-for-byte). A probe landing in the hot region afterwards re-ranks
   * one sub-cluster instead of the whole density mode.
   *
   * Mechanics, in crash-safe order:
   *   1. k-means over the hot cell's rows (de-quantized through the same
   *      1e-7 grid the index stores) yields `subCells` sub-centroids,
   *      re-labelled onto fresh ids above the existing centroid range;
   *   2. the cell's rows are re-assigned among the sub-centroids IN THE
   *      QUANTIZED DOMAIN (stored vector bytes pass through unchanged) and
   *      written as new `cell=<id>` directories — a dynamic-overwrite write,
   *      so a crashed-and-rerun re-split overwrites its own partial output
   *      instead of appending duplicates;
   *   3. the centroid file is rewritten (hot centroid out, sub-centroids
   *      in) and the parameter marker's centroid count refreshed — from
   *      this point probes route to the sub-cells;
   *   4. the old directory is deleted. A crash before 3 leaves probes on
   *      the OLD centroid set reading the OLD directory (correct, with
   *      invisible orphan sub-dirs a rerun overwrites); a crash before 4
   *      leaves a stale unreferenced directory that [[cellStats]] surfaces
   *      and a rerun cannot re-split (its centroid is gone) — delete it.
   */
  def resplitCell(spark: SparkSession, path: String, cell: Int,
      subCells: Int, iterations: Int = 3): Unit = {
    require(subCells >= 2, s"resplit needs >= 2 sub-cells, got $subCells")
    val cents = intCentroids(loadCentroids(spark, path))
    val centRows = cents.collect() // ≤ numCentroids by construction
    require(centRows.exists(_.getInt(0) == cell),
      s"no centroid with cell id $cell at $path (stale directory from an " +
        "interrupted re-split? cellStats shows unreferenced cells)")
    val maxId = centRows.map(_.getInt(0)).max
    require(maxId.toLong + subCells <= Int.MaxValue,
      s"sub-cell ids ${maxId + 1}..${maxId.toLong + subCells} overflow INT")
    val hotRows = loadCells(spark, path).filter(col(CellCol) === cell)
      .select(col("neighbor_id"), col("__cv"), col("__cn"))
    // k-means in the de-quantized domain (the shared operator); labels are
    // arbitrary row ids — remap onto fresh ids above the existing range
    val deq = hotRows.select(col("neighbor_id"),
      transform(col("__cv"), x => x.cast("double") / lit(1.0e7)).as("vec"))
    val sub = Similarity.kmeansCentroids(deq, "neighbor_id", "vec",
      subCells, iterations)
    val labels = sub.select(col("cent_id")).collect().map(_.getInt(0)).sorted
    val idMap = map(labels.zipWithIndex.flatMap { case (l, i) =>
      Seq(lit(l), lit(maxId + 1 + i)) }.toIndexedSeq: _*)
    val subCents = sub.select(
        element_at(idMap, col("cent_id")).cast("int").as("cent_id"),
        col("__cent"), col("__centn"))
      .localCheckpoint(true) // pin before the directories start moving
    // re-assign IN THE QUANTIZED DOMAIN: same argmax as Similarity
    // .assignCells but over the stored __cv — re-quantizing a de-quantized
    // float could land one grid step off and change stored bytes
    val subArr = Similarity.centroidArray(subCents)
    val assigned = hotRows.crossJoin(broadcast(subArr))
      .withColumn("__best", array_min(transform(col("__cents"), ct =>
        struct(
          coalesce(-Vectors.cosineQ(col("__cv"), ct.getField("__cent"),
              col("__cn"), ct.getField("__centn")), lit(Double.MaxValue))
            .as("nsim"),
          ct.getField("cent_id").as("cell")))))
      .select(col("neighbor_id"), col("__cv"), col("__cn"),
        col("__best").getField("cell").cast("int").as(CellCol))
      // truncate lineage: the write targets the tree this plan reads, and
      // Spark refuses to overwrite a path it is also reading from
      .localCheckpoint(true)
    assigned.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(CellCol).parquet(cellsPath(path))
    // centroid file: survivors (from the driver-side copy — the write
    // below replaces the file the frame was read from) + sub-centroids
    val keep = spark.createDataFrame(
      java.util.Arrays.asList(centRows.filter(_.getInt(0) != cell): _*),
      cents.schema)
    keep.unionByName(subCents).coalesce(1)
      .write.mode("overwrite").parquet(centroidsPath(path))
    if (IndexMeta.read(spark, path).nonEmpty) {
      val dims = subCents.select(size(col("__cent")).cast("int")).head().getInt(0)
      // labels.length, not subCells: degenerate k-means (duplicate seeds)
      // writes fewer sub-centroids and the marker must record what IS
      recordMeta(spark, path, dims, centRows.length - 1 + labels.length)
    }
    val hotDir = new org.apache.hadoop.fs.Path(s"${cellsPath(path)}/$CellCol=$cell")
    val fs = hotDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hotDir, true)
    // files under unchanged paths were replaced: drop cached plans and
    // listings over them (PartitionVacuum's staleness reasoning)
    spark.catalog.refreshByPath(cellsPath(path))
    spark.catalog.refreshByPath(centroidsPath(path))
    ()
  }
}
