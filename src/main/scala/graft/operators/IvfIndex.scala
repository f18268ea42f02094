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

  private def centroidsPath(path: String) = s"$path/centroids"
  private def cellsPath(path: String) = s"$path/cells"

  /** Quantized centroid frame `(cent_id int, __cent, __centn)` with the
    * int-cell contract enforced (the frame is ≤ numCentroids rows, so the
    * guard collect is bounded by construction). */
  private def intCentroids(cents: DataFrame): DataFrame = {
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
    // no ensureFor here: assignment is a broadcast projection and the
    // partitionBy write sorts within tasks — nothing shuffles at save
    assignForStorage(corpus, cId, cVec, Similarity.centroidArray(saved))
      .write.mode("overwrite").partitionBy(CellCol).parquet(cellsPath(path))
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
    val centArr = Similarity.centroidArray(loadCentroids(spark, path))
    assignForStorage(batch, bId, bVec, centArr)
      .write.mode("append").partitionBy(CellCol).parquet(cellsPath(path))
  }

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
   */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qId: String, qVec: String, k: Int, nprobe: Int = 1): DataFrame = {
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
    val cells = loadCells(spark, path)
      .filter(col(CellCol).isin(touched.map(Int.box): _*))
    graft.core.ShuffleSizing.ensureFor(cells, expansionFactor = 2.0)
    val scored = cells.join(broadcast(q), Seq(CellCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    Similarity.rankTopK(scored, k)
  }

  /** Per-cell row counts, largest first — the imbalance audit. A cell
    * holding a large fraction of the corpus means its centroid sits on a
    * density mode and probes landing there re-rank too many candidates;
    * re-run [[save]] with more (or k-means) centroids. */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    loadCells(spark, path).groupBy(col(CellCol))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("n_vectors").desc, col(CellCol).asc)
}
