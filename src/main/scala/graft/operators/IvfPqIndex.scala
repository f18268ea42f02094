package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/**
 * IVF + PQ composed — the production ANN layout (FAISS's IVFPQ shape;
 * Jégou et al. 2011 §V): the coarse IVF quantizer prunes WHICH rows a
 * probe reads (cell-partitioned directories, [[IvfIndex]]'s discipline)
 * and PQ codes shrink what each surviving row costs (m ints instead of a
 * float vector, [[PqIndex]]'s discipline). A probe touches
 * `nprobe/numCells` of the corpus AND pays only code bytes for it —
 * the two levers multiply.
 *
 * Layout under `path`:
 *   - `centroids` — the coarse quantizer (quantized ints, [[Similarity]]
 *     conventions; pass [[Similarity.kmeansCentroids]] output or default
 *     id-subset cells)
 *   - `codebooks` — PQ codebooks over unit vectors (shared scheme with
 *     [[PqIndex]]: same `SchemeVersion`, same dense-code layout)
 *   - `cells` — `(vec_id, codes, cell)` partitioned by `cell`,
 *     range-clustered before the write (file count scales with touched
 *     cells, not tasks × cells — [[IvfIndex]]'s write discipline)
 *
 * Encoding is direct (unit vector → codes), not the residual (x − c)
 * variant: residual codes recall better at equal m/ksub but tie every
 * code to its cell (append-time re-encode on re-split, per-cell LUTs at
 * probe); the direct form keeps codes cell-independent — [[resplitCell]]
 * moves a hot cell's rows into sub-cells WITHOUT re-encoding them — and
 * lets one codebook train serve both this index and a standalone
 * [[PqIndex]]. The recall cost is measured, not guessed (ScaleBench pq
 * tier).
 *
 * Probe: queries are assigned their `nprobe` nearest cells (broadcast
 * argmax, zero shuffle) and ONE m×ksub ADC lookup table each; the cells
 * scan carries a static `cell IN (...)` filter (directory pruning — only
 * the touched cell directories are read), each code row scores in m
 * lookups + adds, the bounded heap keeps `candidates` per query, and the
 * optional exact re-rank refines against full vectors exactly like
 * [[PqIndex.probe]]. With `nprobe = numCells` and all-covering
 * `candidates`, the result is EXACTLY brute force (oracle-checked).
 */
object IvfPqIndex {

  private val CellCol = "cell"

  private def centroidsPath(path: String) = s"$path/centroids"
  private def codebooksPath(path: String) = s"$path/codebooks"
  private def cellsPath(path: String) = s"$path/cells"

  private def recordMeta(spark: SparkSession, path: String, dims: Int,
      numCentroids: Long, m: Int, ksub: Int): Unit =
    IndexMeta.write(spark, path, Map("kind" -> "ivfpq",
      "dims" -> dims.toString, "numCentroids" -> numCentroids.toString,
      "m" -> m.toString, "ksub" -> ksub.toString,
      "scheme" -> PqIndex.SchemeVersion,
      "quantization" -> IvfIndex.QuantizationVersion))

  /** The index parameters recorded at [[save]]. */
  def readParams(spark: SparkSession, path: String): Map[String, String] =
    IndexMeta.read(spark, path)

  /** Geometry/scheme drift guard — both parents' checks in one marker. */
  private def checkCompat(spark: SparkSession, path: String,
      df: DataFrame, vec: String, op: String): Map[String, String] = {
    val saved = IndexMeta.read(spark, path)
    require(saved.nonEmpty, s"no IVFPQ index marker at $path")
    saved.get("scheme").filter(_ != PqIndex.SchemeVersion).foreach { sc =>
      throw new IllegalStateException(
        s"IVFPQ index at $path encodes scheme '$sc' but this build is " +
          s"'${PqIndex.SchemeVersion}' — codes mis-rank; rebuild")
    }
    saved.get("quantization")
        .filter(_ != IvfIndex.QuantizationVersion).foreach { q =>
      throw new IllegalStateException(
        s"IVFPQ index at $path assigns cells on quantization '$q' but this " +
          s"build uses '${IvfIndex.QuantizationVersion}' — cell routing " +
          "drifts; rebuild")
    }
    val batchDims = df.select(size(col(vec)).cast("int").as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
    (saved.get("dims").map(_.toInt), batchDims) match {
      case (Some(d0), Some(d)) if d0 != d =>
        throw new IllegalStateException(
          s"IVFPQ index at $path was built for $d0-dim vectors but this " +
            s"$op batch carries $d dims — rebuild the index or fix the batch")
      case _ => ()
    }
    saved
  }

  /** Assign `cell` (coarse argmax over broadcast centroids, quantized
    * cosine) AND `codes` (PQ argmin over broadcast codebooks, unit-L2
    * domain) in ONE projection over the batch — no self-join of the
    * corpus against itself to marry the two labels. */
  private def encodeWithCells(df: DataFrame, id: String, vec: String,
      centArr: DataFrame, books: DataFrame, m: Int, dsub: Int): DataFrame =
    PqIndex.withUnit(
        df.select(col(id).cast("long").as("vec_id"), col(vec).as("__pv")),
        "__pv")
      .filter(col("__xn").isNotNull) // zero-norm: no direction, no cell
      .withColumn("__v", Vectors.quantize(col("__pv")))
      .withColumn("__vn", Vectors.dotQ(col("__v"), col("__v")))
      .withColumn("__subs", PqIndex.subsColumn(m, dsub))
      .crossJoin(broadcast(centArr))
      .crossJoin(broadcast(books))
      .select(col("vec_id"),
        PqIndex.codesColumn(col("__books"), col("__subs")).as("codes"),
        array_min(transform(col("__cents"), ct =>
          struct(
            coalesce(-Vectors.cosineQ(col("__v"), ct.getField("__cent"),
                col("__vn"), ct.getField("__centn")), lit(Double.MaxValue))
              .as("nsim"),
            ct.getField("cent_id").as(CellCol))))
          .getField(CellCol).cast("int").as(CellCol))
      // cluster by cell range before the partitioned write (file-count
      // hygiene — IvfIndex.assignForStorage's reasoning verbatim)
      .repartitionByRange(col(CellCol))

  /**
   * Build and persist: coarse centroids + PQ codebooks (trained on the
   * deterministic `trainFraction` hash sample) + cell-partitioned codes.
   * Overwrite semantics; growth is [[append]].
   */
  def save(corpus: DataFrame, id: String, vec: String, path: String,
      numCells: Int = 64, m: Int = 8, ksub: Int = 16, iterations: Int = 3,
      centroids: Option[DataFrame] = None,
      codebooks: Option[DataFrame] = None,
      trainFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    PqIndex.requireNumericId(corpus, id)
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val dims = corpus.select(size(col(vec)).cast("int")).limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("empty corpus"))
    require(m > 0 && dims % m == 0, s"m=$m must divide the vector dims ($dims)")
    // 1% hash-bucket granularity, floored to one bucket — PqIndex.save's
    // sampling rule (a sub-1% fraction must not yield an empty train set)
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(Sampling.hashBucket(col(id)) <
        math.max(1, math.rint(trainFraction * 100).toInt))
    // int-cell contract enforced like IvfIndex.save: a >32-bit or
    // non-numeric centroid id would silently overflow the partition value
    val cents = IvfIndex.intCentroids(centroids.getOrElse(
      Similarity.defaultCentroids(corpus, id, vec, numCells)))
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsPath(path))
    val books = codebooks.getOrElse(
      PqIndex.trainCodebooks(trainSet, id, vec, m, ksub, iterations))
    PqIndex.requireDenseCodes(books)
    books.coalesce(1).write.mode("overwrite").parquet(codebooksPath(path))
    // encode against the JUST-SAVED artifacts — the files probes will load
    val savedCents = spark.read.parquet(centroidsPath(path))
    val savedBooks = spark.read.parquet(codebooksPath(path))
    encodeWithCells(corpus, id, vec, Similarity.centroidArray(savedCents),
        PqIndex.bookArray(savedBooks), m, dims / m)
      .write.mode("overwrite").partitionBy(CellCol).parquet(cellsPath(path))
    recordMeta(spark, path, dims, savedCents.count(), m,
      savedBooks.select(max(col("cent_id"))).head().getInt(0) + 1)
  }

  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(centroidsPath(path))

  def loadCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(codebooksPath(path))

  /** The stored assignment `(vec_id, codes, cell)`. */
  def loadCells(spark: SparkSession, path: String): DataFrame = {
    // roll forward a swap any crashed operation left mid-flight (see
    // PqIndex.loadCodes — same reader-funnel discipline)
    DirSwap.repair(spark, cellsPath(path))
    spark.read.parquet(cellsPath(path))
  }

  /** Encode + cell-assign an ingest batch with the SAVED artifacts and
    * append — only the touched cell directories gain files. */
  def append(batch: DataFrame, id: String, vec: String, path: String): Unit = {
    val spark = batch.sparkSession
    PqIndex.requireNumericId(batch, id)
    // an append into a cells dir a crashed swap left missing would CREATE
    // a fresh directory beside the stranded stage — repair first
    DirSwap.repair(spark, cellsPath(path))
    val meta = checkCompat(spark, path, batch, vec, "append")
    val m = meta("m").toInt
    encodeWithCells(batch, id, vec,
        Similarity.centroidArray(loadCentroids(spark, path)),
        PqIndex.bookArray(loadCodebooks(spark, path)),
        m, meta("dims").toInt / m)
      .write.mode("append").partitionBy(CellCol).parquet(cellsPath(path))
  }

  /** Retract vectors from the composed index — [[BandIndex.removeIds]]'
    * contract: O(|ids|) tombstone append, every [[probe]] subtracts the
    * set before scoring, physical rewrite deferred to [[vacuum]]. An
    * [[append]] of a retracted id stays suppressed until the vacuum —
    * vacuum first when re-admitting retracted content. NOTE for
    * [[retrainSubspace]]: pending tombstones don't shrink the stored id
    * set, so its full-coverage guard still expects the retracted rows in
    * `corpus` — vacuum before retraining against a corpus that already
    * dropped them. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.append(spark, path, ids)

  /** Physically drop retracted code rows: only the cell directories still
    * holding tombstoned rows are rewritten; every other cell is
    * byte-untouched, crash recovery is [[PartitionVacuum]]'s rename-aside
    * repair. Returns rows removed. Run on the nightly-compaction
    * cadence. */
  def vacuum(spark: SparkSession, path: String): Long = {
    // PartitionVacuum reads cellsPath directly (no loadCells funnel) —
    // roll forward a crashed retrain's swap first
    DirSwap.repair(spark, cellsPath(path))
    PartitionVacuum.vacuum(spark, path, cellsPath(path), CellCol, "vec_id")
  }

  /**
   * The composed layout's codebook-repair twin of
   * [[PqIndex.retrainSubspace]] — the remedy [[PqIndex.codeStats]]-style
   * saturation audits prescribe, without the full `save` (all-subspace
   * retrain + centroid re-train) a drifted subspace previously cost here:
   * re-run Lloyd's for ONE subspace (hash-ordered seeds escape the
   * collapsed initialization), splice the new codewords into the
   * codebooks file, and refresh the cell-partitioned codes. Coarse
   * centroids, scheme, m, ksub and every OTHER subspace's codewords stay
   * exactly as recorded — the drift markers never bump and appended
   * batches keep composing.
   *
   * `corpus` must cover EVERY indexed row (save + all appends): codes are
   * recomputed from vectors, guarded by [[PqIndex.requireFullCoverage]]
   * before anything on disk changes.
   *
   * The refresh re-encodes all m positions AND re-derives each row's cell
   * with the same broadcast-argmax projection `append` uses (one
   * shuffle-free corpus pass — a position-splice join would shuffle the
   * corpus-sized codes by id to save m−1 codegen'd argmins). Cells are a
   * pure function of (centroids, vector), so rows reproduce their stored
   * cell bit-identically — with one documented exception: rows that
   * [[resplitCell]] routed by their PQ RECONSTRUCTION may sit within
   * quantization error of a sibling sub-cell boundary and re-route to the
   * true vector's nearest sub-cell. That is the canonical assignment (the
   * probe's own rule), never wrong — an all-cells probe is exactly
   * unchanged (spec-pinned) and narrow probes carry the usual `nprobe`
   * boundary slack.
   *
   * Crash discipline ([[DirSwap]]): new cells stage to `cells__retrain`
   * (complete before anything live moves), the codebooks overwrite and
   * the rename-aside swap then commit back to back; entry repairs an
   * interrupted swap forward, so "re-run the retrain" always works. A
   * crash between the codebooks overwrite and the swap leaves codes from
   * the old train under the new books (ADC mis-ranks until the re-run) —
   * the staging directory's presence marks the interruption.
   */
  def retrainSubspace(corpus: DataFrame, id: String, vec: String,
      path: String, s: Int, iterations: Int = 3,
      trainFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    PqIndex.requireNumericId(corpus, id)
    val staged = cellsPath(path) + "__retrain"
    DirSwap.repair(spark, cellsPath(path))
    val meta = checkCompat(spark, path, corpus, vec, "retrain")
    val m = meta("m").toInt
    val ksub = meta("ksub").toInt
    val dims = meta("dims").toInt
    val spliced = PqIndex.splicedBooks(corpus, id, vec,
      loadCodebooks(spark, path), m, ksub, iterations, s, trainFraction)
    encodeWithCells(corpus, id, vec,
        Similarity.centroidArray(loadCentroids(spark, path)),
        PqIndex.bookArray(spliced), m, dims / m)
      .write.mode("overwrite").partitionBy(CellCol).parquet(staged)
    PqIndex.requireFullCoverage(spark,
      loadCells(spark, path).select(col("vec_id")),
      spark.read.parquet(staged).select(col("vec_id")), staged,
      "retrainSubspace")
    spliced.coalesce(1).write.mode("overwrite").parquet(codebooksPath(path))
    DirSwap.swap(spark, cellsPath(path), staged)
    // files under unchanged paths were replaced: drop cached plans and
    // listings over them (PartitionVacuum's staleness reasoning)
    spark.catalog.refreshByPath(cellsPath(path))
    spark.catalog.refreshByPath(codebooksPath(path))
  }

  /** Per-subspace code-usage histogram over the composed layout —
    * [[PqIndex.codeStats]]' twin: a code soaking up most of a subspace
    * means ADC has lost resolution there; the remedy is
    * [[retrainSubspace]] (one corpus pass, only that subspace trains). */
  def codeStats(spark: SparkSession, path: String): DataFrame =
    loadCells(spark, path)
      .select(posexplode(col("codes")).as(Seq("s", "code")))
      .groupBy(col("s"), col("code")).agg(count(lit(1)).as("n"))
      .orderBy(col("s").asc, col("n").desc, col("code").asc)

  /** [[PqIndex.calibrate]] over the composed layout — the calibration the
    * `ivfPqIngestStream` threshold path actually needs: its ADC scores come
    * from THIS index's codebooks, so the curve must be measured against
    * this index's codes (a PQ-layout calibration of the same corpus trains
    * different books and answers a different question). Same output shape
    * and reading; codes are read from the cell directories with the
    * sample-id IN filter pruning row groups inside each one. */
  def calibrate(spark: SparkSession, path: String, sample: DataFrame,
      id: String, vec: String, bins: Int = 10): DataFrame =
    PqIndex.calibrationCurve(
      calibrationPairs(spark, path, sample, id, vec), bins)

  /** [[PqIndex.adcThresholdFor]] over the composed layout — turns a target
    * exact cosine into the raw-ADC drop threshold for [[probe]] /
    * `ivfPqIngestStream` callers on this index's geometry. Throws on zero
    * evidence (no sample pair at/above the target cosine). */
  def adcThresholdFor(spark: SparkSession, path: String, sample: DataFrame,
      id: String, vec: String, targetCosine: Double,
      recallQuantile: Double = 0.05): Double =
    PqIndex.calibrationThreshold(
      calibrationPairs(spark, path, sample, id, vec), targetCosine,
      recallQuantile)

  private def calibrationPairs(spark: SparkSession, path: String,
      sample: DataFrame, id: String, vec: String): DataFrame = {
    val meta = checkCompat(spark, path, sample, vec, "calibrate")
    val m = meta("m").toInt
    PqIndex.calibrationPairsOn(
      Tombstones.subtract(spark, path, loadCells(spark, path), "vec_id"),
      PqIndex.bookArray(loadCodebooks(spark, path)), m,
      meta("dims").toInt / m, sample, id, vec)
  }

  /**
   * Cell-pruned ADC top-k: each query reads only its `nprobe` nearest
   * cells' code rows (static `cell IN` → directory pruning), scores them
   * in m lookups + adds, keeps `candidates` in the bounded heap, and —
   * with `rerank` — refines exactly against full vectors. Output matches
   * [[PqIndex.probe]]'s shapes.
   *
   * `excludeIds` (one column matching the stored id) removes those ids
   * from the CORPUS side before scoring — [[IvfIndex.probe]]'s
   * replay-idempotence hook for streaming ingest: re-probing a batch
   * whose append already landed must not pair the batch with its own
   * rows. The exclusion broadcasts (an ingest batch is small by
   * contract), so the cells scan stays directory-pruned.
   */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qId: String, qVec: String, candidates: Int, nprobe: Int = 1,
      rerank: Option[(DataFrame, String, String)] = None,
      k: Int = 10,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    require(candidates > 0, s"candidates must be positive, got $candidates")
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val meta = checkCompat(spark, path, queries, qVec, "probe")
    val m = meta("m").toInt
    val dsub = meta("dims").toInt / m
    val centArr = Similarity.centroidArray(loadCentroids(spark, path))
    val books = PqIndex.bookArray(loadCodebooks(spark, path))
    // one projection per query row: nprobe nearest cells + the ADC LUT;
    // eagerly pinned (small by contract) so the touched-cell collect and
    // the probe join share one computation, detached from the on-disk
    // files a concurrent append might be touching
    val q = PqIndex.withUnit(
        queries.select(col(qId).as("query_id"), col(qVec).as("__pv")), "__pv")
      .filter(col("__xn").isNotNull)
      .withColumn("__v", Vectors.quantize(col("__pv")))
      .withColumn("__vn", Vectors.dotQ(col("__v"), col("__v")))
      .withColumn("__subs", PqIndex.subsColumn(m, dsub))
      .crossJoin(broadcast(centArr))
      .crossJoin(broadcast(books))
      .select(col("query_id"),
        explode(slice(array_sort(transform(col("__cents"), ct =>
          struct(
            coalesce(-Vectors.cosineQ(col("__v"), ct.getField("__cent"),
                col("__vn"), ct.getField("__centn")), lit(Double.MaxValue))
              .as("nsim"),
            ct.getField("cent_id").as(CellCol)))), 1, nprobe)).as("__near"),
        PqIndex.lutColumn(col("__books"), col("__subs")).as("__lut"))
      .select(col("query_id"),
        col("__near").getField(CellCol).cast("int").as(CellCol), col("__lut"))
      .localCheckpoint(true)
    // touched cells: ≤ numCentroids values by construction
    val touched = q.select(col(CellCol)).distinct().collect().map(_.getInt(0))
    val pruned = Tombstones.subtract(spark, path,
      loadCells(spark, path)
        .filter(col(CellCol).isin(touched.map(Int.box).toIndexedSeq: _*)),
      "vec_id")
    val cells = excludeIds match {
      case Some(ex) =>
        val exIds = broadcast(ex.toDF("__xid").distinct())
        pruned.join(exIds, pruned("vec_id") === col("__xid"), "left_anti")
      case None => pruned
    }
    val scored = cells.join(broadcast(q), Seq(CellCol))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("pq_score", PqIndex.adcScore(col("__lut"), col("codes")))
    val cands = PqIndex.adcTopCandidates(scored, candidates)
    rerank match {
      case None => cands
      case Some((full, fId, fVec)) =>
        PqIndex.exactRerank(cands, queries, qId, qVec, full, fId, fVec, k)
    }
  }

  /** Per-cell row counts, largest first — [[IvfIndex.cellStats]]' audit
    * over the composed index; the partition-scoped remedy for the top row
    * is [[resplitCell]]. */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    loadCells(spark, path).groupBy(col(CellCol))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("n_vectors").desc, col(CellCol).asc)

  /**
   * Partition-scoped remedy for a hot cell — [[IvfIndex.resplitCell]]'s
   * twin over the composed layout, and the payoff of direct (non-residual)
   * encoding: the hot cell's CODE rows move into `subCells` fresh
   * sub-cells with their codes byte-untouched (residual codes would all
   * need re-encoding against each new cell's centroid).
   *
   * Self-contained in the index: the float corpus is never read. Each hot
   * row is DECODED to its PQ reconstruction ([[PqIndex.reconstructColumn]]
   * — everything the index knows about the row), sub-centroids come from
   * k-means over those reconstructions, and rows re-route to their nearest
   * sub-centroid by the same quantized-cosine argmax the probe uses for
   * queries. Routing error vs true vectors is bounded by the PQ
   * quantization error — the usual `nprobe > 1` slack covers boundaries,
   * and a probe covering all cells is EXACTLY unchanged (spec-pinned).
   * Cost is O(hot cell), not O(corpus); every other cell directory is
   * byte-untouched (spec-asserted). One degenerate mode to know: the
   * reconstruction space is discrete (≤ ksub^m points), so a hot cell of
   * near-identical docs can hand k-means duplicate seeds and the split
   * leaves most mass in one sub-cell — never wrong (probes stay exact),
   * just unhelpful; [[cellStats]] shows it, and re-running with more
   * `subCells`/`iterations` or raising ksub is the recourse.
   *
   * Crash-safe order ([[IvfIndex.resplitCell]]'s discipline): sub-cell
   * directories land first (dynamic overwrite — a rerun replaces its own
   * partial output), then the centroid file swap (the routing commit
   * point), then the marker refresh and the old directory delete. A crash
   * before the centroid swap leaves probes on the old centroid set reading
   * the old directory; after it, a stale unreferenced directory remains
   * for [[cellStats]] to surface and the operator to delete.
   */
  def resplitCell(spark: SparkSession, path: String, cell: Int,
      subCells: Int, iterations: Int = 3): Unit = {
    require(subCells >= 2, s"resplit needs >= 2 sub-cells, got $subCells")
    val meta = IndexMeta.read(spark, path)
    require(meta.nonEmpty, s"no IVFPQ index marker at $path")
    val cents = IvfIndex.intCentroids(loadCentroids(spark, path))
    val centRows = cents.collect() // ≤ numCentroids by construction
    require(centRows.exists(_.getInt(0) == cell),
      s"no centroid with cell id $cell at $path (stale directory from an " +
        "interrupted re-split? cellStats shows unreferenced cells)")
    val maxId = centRows.map(_.getInt(0)).max
    require(maxId.toLong + subCells <= Int.MaxValue,
      s"sub-cell ids ${maxId + 1}..${maxId.toLong + subCells} overflow INT")
    val books = PqIndex.bookArray(loadCodebooks(spark, path))
    // decode once; lineage truncated because the write below targets the
    // very tree this plan reads (and the frame feeds k-means + re-route)
    val hot = loadCells(spark, path).filter(col(CellCol) === cell)
      .select(col("vec_id"), col("codes"))
      .crossJoin(broadcast(books))
      .select(col("vec_id"), col("codes"),
        PqIndex.reconstructColumn(col("__books"), col("codes")).as("__rv"))
      .localCheckpoint(true)
    val sub = Similarity.kmeansCentroids(hot, "vec_id", "__rv",
      subCells, iterations)
    // k-means labels are arbitrary row ids — remap onto fresh ids above
    // the existing range (IvfIndex.resplitCell's rule)
    val labels = sub.select(col("cent_id")).collect().map(_.getInt(0)).sorted
    val idMap = map(labels.zipWithIndex.flatMap { case (l, i) =>
      Seq(lit(l), lit(maxId + 1 + i)) }.toIndexedSeq: _*)
    val subCents = sub.select(
        element_at(idMap, col("cent_id")).cast("int").as("cent_id"),
        col("__cent"), col("__centn"))
      .localCheckpoint(true) // pin before the directories start moving
    val subArr = Similarity.centroidArray(subCents)
    val assigned = hot
      .withColumn("__v", Vectors.quantizeHof(col("__rv")))
      .withColumn("__vn", Vectors.dotQ(col("__v"), col("__v")))
      .crossJoin(broadcast(subArr))
      .withColumn("__best", array_min(transform(col("__cents"), ct =>
        struct(
          coalesce(-Vectors.cosineQ(col("__v"), ct.getField("__cent"),
              col("__vn"), ct.getField("__centn")), lit(Double.MaxValue))
            .as("nsim"),
          ct.getField("cent_id").as(CellCol)))))
      .select(col("vec_id"), col("codes"), // codes byte-untouched
        col("__best").getField(CellCol).cast("int").as(CellCol))
      .localCheckpoint(true)
    assigned.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(CellCol).parquet(cellsPath(path))
    // centroid file: survivors (from the driver-side copy — the write
    // replaces the file the frame was read from) + sub-centroids
    val keep = spark.createDataFrame(
      java.util.Arrays.asList(centRows.filter(_.getInt(0) != cell): _*),
      cents.schema)
    keep.unionByName(subCents).coalesce(1)
      .write.mode("overwrite").parquet(centroidsPath(path))
    // labels.length, not subCells: degenerate k-means (duplicate seeds —
    // the discrete-reconstruction mode the scaladoc calls out) can write
    // FEWER sub-centroids than requested, and the marker must record the
    // centroid count actually on disk
    recordMeta(spark, path, meta("dims").toInt,
      centRows.length - 1 + labels.length, meta("m").toInt, meta("ksub").toInt)
    val hotDir = new org.apache.hadoop.fs.Path(
      s"${cellsPath(path)}/$CellCol=$cell")
    hotDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hotDir, true)
    // files under unchanged paths were replaced: drop cached plans and
    // listings over them (PartitionVacuum's staleness reasoning)
    spark.catalog.refreshByPath(cellsPath(path))
    spark.catalog.refreshByPath(centroidsPath(path))
    ()
  }
}
