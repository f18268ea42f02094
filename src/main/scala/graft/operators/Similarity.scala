package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column.
 *
 *  - `bruteForceTopK`: the exact baseline — broadcast the (small) query set
 *    against the corpus, rank per query. Corpus is scanned once; the join is
 *    a broadcast nested loop with |queries| ≪ |corpus|, so it scales
 *    linearly in corpus size (the 100 TB path is "queries are small,
 *    corpus is huge", which is exactly this shape).
 *  - `signLshTopK`: the scale path — both sides bucketed by the sign pattern
 *    of the leading components (a fixed random-hyperplane LSH with
 *    axis-aligned planes); candidates only within the query's bucket, then
 *    exact re-rank. Trades recall for a `2^bits`-fold candidate reduction.
 *  - An IVF variant would replace `signBucket` with nearest-centroid
 *    assignment; the bucket-join + re-rank skeleton is identical.
 */
object Similarity {

  /** Bucket id from the sign bits of `bits` components starting at
    * 0-based dimension `offset` — bands of a multi-probe LSH read disjoint
    * slices so each band is an independent hash family.
    *
    * Requires `offset + bits <= length(vec)`; a too-short vector fails fast
    * with a clear error on EVERY ANSI setting — ANSI-off element_at would
    * silently read null, turning every out-of-range bit into 0 and skewing
    * all high bands into one giant bucket (the quadratic-blowup footgun). */
  def signBucket(vec: Column, bits: Int, offset: Int = 0): Column = {
    val bucket = (0 until bits).map { j =>
      when(element_at(vec, offset + j + 1) > 0.0f, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    when(size(vec) >= lit(offset + bits), bucket)
      .otherwise(raise_error(concat(
        lit(s"signBucket: need ${offset + bits} dims (offset=$offset, bits=$bits) but vector has "),
        size(vec).cast("string"))))
  }

  /**
   * Exact top-k neighbors for each query vector (cosine, quantized-exact).
   * Ties broken by corpus id asc — fully deterministic.
   */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    // quantize + self-dot ONCE per row on each side; each pair then costs a
    // single integer dot product (same value as cosineExact, 3× less work
    // in the |queries| × |corpus| hot loop)
    val q = queries.select(col(qId).as("query_id"),
        Vectors.quantize(col(qVec)).as("__qv"))
      .withColumn("__qn", Vectors.dotQ(col("__qv"), col("__qv")))
    val c = corpus.select(col(cId).as("neighbor_id"),
        Vectors.quantize(col(cVec)).as("__cv"))
      .withColumn("__cn", Vectors.dotQ(col("__cv"), col("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Column form of the bounded top-k aggregate (plans.BoundedTopK). */
  def boundedTopK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.BoundedTopK(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
  }

  /**
   * Shared re-rank: top-k per query from a scored candidate frame via the
   * bounded heap aggregate — at most k rows per query cross the exchange
   * (map-side partial aggregation), versus the window form which shuffles
   * and sorts EVERY candidate. Identical output to
   * `row_number over (partition by query_id order by cosine desc, id asc)`.
   *
   * The heap aggregate carries ids as BIGINT, so non-numeric id columns
   * (uuids) fall back to the window form — correct for any type, at the
   * cost of shuffling all candidates.
   */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val numericId = scored.schema("neighbor_id").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    if (numericId)
      scored.groupBy(col("query_id"))
        .agg(boundedTopK(col("cosine"), col("neighbor_id").cast("long"), k).as("topk"))
        .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
        .select(col("query_id"), col("entry.id").as("neighbor_id"),
          (col("pos") + 1).cast("int").as("rank"), col("entry.score").as("cosine"))
    else {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    }
  }

  /** Quantized query frame `(query_id, __qv, __qn)` — the broadcast side
    * every probe variant builds; shared so PqIndex's exact re-rank uses the
    * same arithmetic as bruteForceTopK. */
  private[operators] def queriesQuantized(
      queries: DataFrame, qId: String, qVec: String): DataFrame =
    queries.select(col(qId).as("query_id"),
        Vectors.quantize(col(qVec)).as("__qv"))
      .withColumn("__qn", Vectors.dotQ(col("__qv"), col("__qv")))

  /** [[rankTopK]] for sibling operator packages (same contract). */
  private[operators] def rankTopKPublic(scored: DataFrame, k: Int): DataFrame =
    rankTopK(scored, k)

  /**
   * Brute-force top-k via the bounded heap aggregate instead of a window
   * sort: partial aggregation keeps only k candidates per query on the map
   * side, so at most k rows per query cross the exchange — the window form
   * shuffles and sorts EVERY candidate. Identical results (score desc,
   * id asc tie-break).
   */
  def bruteForceTopKAgg(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    // same contract as PqIndex.requireNumericId: a string id would
    // null-cast every neighbor_id silently instead of failing here
    PqIndex.requireNumericId(corpus, cId)
    val q = queries.select(col(qId).as("query_id"),
        Vectors.quantize(col(qVec)).as("__qv"))
      .withColumn("__qn", Vectors.dotQ(col("__qv"), col("__qv")))
    val c = corpus.select(col(cId).cast("long").as("neighbor_id"),
        Vectors.quantize(col(cVec)).as("__cv"))
      .withColumn("__cn", Vectors.dotQ(col("__cv"), col("__cv")))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .groupBy(col("query_id"))
      .agg(boundedTopK(col("cosine"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("entry.score").as("cosine"))
  }

  /**
   * IVF (inverted-file) top-k: corpus vectors are assigned to their nearest
   * centroid cell; each query searches only its own cell, then re-ranks
   * exactly. Centroids here are a deterministic subset of the corpus
   * (`centroidIds` smallest ids) — a real deployment would plug k-means
   * centroids into the same skeleton; assignment, cell join, and re-rank are
   * unchanged. Candidates shrink |corpus|/|cells|-fold like the sign-LSH
   * path, but cells adapt to the data distribution instead of axis signs.
   */
  /** Deterministic default cells: the `numCentroids` smallest-id corpus
    * rows, quantized like every other centroid frame — the id-subset
    * baseline `ivfTopK` uses when no k-means centroids are passed. */
  private[operators] def defaultCentroids(
      corpus: DataFrame, cId: String, cVec: String, numCentroids: Int): DataFrame =
    corpus.orderBy(col(cId).asc).limit(numCentroids)
      .select(col(cId).as("cent_id"), Vectors.quantize(col(cVec)).as("__cent"))
      .withColumn("__centn", Vectors.dotQ(col("__cent"), col("__cent")))

  /** Collapse the (tiny) centroid table to ONE row holding the sorted
    * centroid array, so assignment can broadcast it and stay shuffle-free. */
  private[operators] def centroidArray(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(
      struct(col("cent_id"), col("__cent"), col("__centn")))).as("__cents"))

  /**
   * Nearest-centroid assignment as a per-row argmax in a single projection:
   * broadcast the centroid array, array_min over struct(-sim, cent_id)
   * (= sim desc, cent_id asc tie-break). Zero exchanges, no sort — the
   * windowed form (crossJoin + row_number on the UNIQUE row id) shuffled
   * numCentroids×|rows| rows to compute the same argmax.
   *
   * `nprobe > 1` keeps each row's `nprobe` NEAREST cells (one output row per
   * cell, same ordering) — multi-probe recall for [[IvfIndex.probe]]; the
   * per-row sort is over the ≤numCentroids-element in-memory array, not data.
   */
  private[operators] def assignCells(df: DataFrame, id: String, vec: String,
      outId: String, centArr: DataFrame, nprobe: Int = 1): DataFrame = {
    val v = df.select(col(id).as(outId), Vectors.quantize(col(vec)).as("__v"))
      .withColumn("__vn", Vectors.dotQ(col("__v"), col("__v")))
    // null sim (degenerate zero-norm vector) must LOSE the argmax,
    // matching the window form's nulls-last-in-desc
    def ranked = transform(col("__cents"), ct =>
      struct(
        coalesce(-Vectors.cosineQ(col("__v"), ct.getField("__cent"),
            col("__vn"), ct.getField("__centn")), lit(Double.MaxValue))
          .as("nsim"),
        ct.getField("cent_id").as("cell")))
    val joined = v.crossJoin(broadcast(centArr))
    val assigned =
      if (nprobe <= 1)
        joined.withColumn("__best", array_min(ranked))
      else
        joined.withColumn("__near", slice(array_sort(ranked), 1, nprobe))
          .select(col(outId), col("__v"), col("__vn"),
            explode(col("__near")).as("__best"))
    assigned.select(col(outId), col("__best").getField("cell").as("cell"),
      col("__v"), col("__vn"))
  }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, numCentroids: Int = 8,
      centroids: Option[DataFrame] = None): DataFrame = {
    // assignment is zero-shuffle, but the re-rank shuffles every scored
    // candidate (≈ corpus rows × queries-per-cell, quantized ≈ 2× input)
    // on query_id — size initial partitions from the corpus so per-task
    // top-k sort state stays bounded on very large candidate sets
    graft.core.ShuffleSizing.ensureFor(corpus, expansionFactor = 2.0)
    // default cells: deterministic id-subset; pass `kmeansCentroids(...)`
    // for data-adaptive cells — the skeleton below is identical
    val cents = centroids.getOrElse(defaultCentroids(corpus, cId, cVec, numCentroids))
    val centArr = centroidArray(cents)

    val c = assignCells(corpus, cId, cVec, "neighbor_id", centArr)
      .withColumnRenamed("__v", "__cv").withColumnRenamed("__vn", "__cn")
    val q = assignCells(queries, qId, qVec, "query_id", centArr)
      .withColumnRenamed("__v", "__qv").withColumnRenamed("__vn", "__qn")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    rankTopK(scored, k)
  }

  /**
   * Distributed Lloyd's k-means over the embedding column — produces real
   * data-adaptive centroids for `ivfTopK` (whose default centroids are a
   * deterministic id-subset; this is the "plug k-means into the same
   * skeleton" path). Deterministic: seeds are the k smallest-id vectors,
   * ties in assignment break toward the lower cell id.
   *
   * Scale shape per iteration: centroid assignment is the SAME zero-shuffle
   * broadcast argmax as `ivfTopK` (one projection over the corpus), then
   * one posexplode + two aggregations recompute the means — the only
   * shuffled rows are |corpus| × dim (cell, pos, value) triples for the
   * mean, with map-side partial aggregation. Centroids themselves never
   * exceed k rows. Empty cells keep their previous centroid.
   *
   * Returns `(cent_id, __cent, __centn)` quantized exactly like
   * `ivfTopK`'s internal centroid frame.
   */
  def kmeansCentroids(
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, iterations: Int = 3): DataFrame = {
    // squared norm materialized ONCE per row/centroid: referencing the
    // aggregate inside the per-centroid lambda would re-reduce the array k
    // times per row per iteration (same fix as ivfTopK.assign's __vn)
    def norm2(a: Column): Column = aggregate(a, lit(0.0), (s, x) => s + x * x)
    // string ids would null-cast vid, scrambling the deterministic seed
    // order (and nulling cent_id) silently — fail fast like every other
    // numeric-id surface
    PqIndex.requireNumericId(corpus, cId)
    val spark = corpus.sparkSession
    val v = corpus.select(col(cId).cast("long").as("vid"),
        col(cVec).cast("array<double>").as("vec"))
      .withColumn("__vn2", norm2(col("vec")))
    // centroids live ON THE DRIVER between rounds — k rows by construction,
    // so the former per-round localCheckpoint (a block-manager
    // materialization plus a cents⋈means join inside every round's action)
    // was pure orchestration cost. Each round is now exactly one
    // distributed action (the means aggregation, collected at k rows); the
    // empty-cell "keep previous centroid" fallback is a driver map lookup.
    // Arithmetic untouched: same expressions over the same values, and a
    // collect round-trip of doubles is exact — assignments and means are
    // bit-identical to the checkpointed form (spec: probe results equal).
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true)))
    def centsDf(rows: Seq[(Int, Seq[Double])]): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        rows.map { case (id, cv) => org.apache.spark.sql.Row(id, cv) }.asJava,
        centSchema)
    }
    var cents: Seq[(Int, Seq[Double])] =
      v.orderBy(col("vid").asc).limit(k)
        .select(col("vid").cast("int").as("cent_id"), col("vec").as("cvec"))
        .collect().map(r => (r.getInt(0),
          if (r.isNullAt(1)) null else r.getSeq[Double](1))).toSeq

    (0 until iterations).foreach { _ =>
      val centArr = centsDf(cents).agg(sort_array(collect_list(
        struct(col("cent_id"), col("cvec"), norm2(col("cvec")).as("cn2")))).as("__cents"))
      // zero-shuffle nearest-centroid (cosine, same tie-break as ivfTopK);
      // sqrt(vn2 * cn2) keeps the exact arithmetic of the inline form
      def cos(a: Column, an2: Column, b: Column, bn2: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x) /
          sqrt(an2 * bn2)
      val assigned = v.crossJoin(broadcast(centArr))
        .withColumn("__best", array_min(transform(col("__cents"), ct =>
          struct(coalesce(
            -cos(col("vec"), col("__vn2"), ct.getField("cvec"), ct.getField("cn2")),
            lit(Double.MaxValue))
            .as("nsim"), ct.getField("cent_id").as("cell")))))
        .select(col("__best").getField("cell").as("cell"), col("vec"))
      // per-cell mean: position-wise avg, rebuilt in position order
      val means = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"),
          transform(col("pm"), e => e.getField("m")).as("cvec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // empty cells (no assigned vectors) keep their previous centroid
      cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }

    centsDf(cents).select(col("cent_id"),
        Vectors.quantizeHof(col("cvec")).as("__cent"))
      .withColumn("__centn", Vectors.dotQ(col("__cent"), col("__cent")))
  }

  /** LSH-bucketed top-k: exact ranking within the query's sign bucket. */
  def signLshTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(qId).as("query_id"),
        Vectors.quantize(col(qVec)).as("__qv"),
        signBucket(col(qVec), bits).as("bucket"))
      .withColumn("__qn", Vectors.dotQ(col("__qv"), col("__qv")))
    val c = corpus.select(col(cId).as("neighbor_id"),
        Vectors.quantize(col(cVec)).as("__cv"),
        signBucket(col(cVec), bits).as("bucket"))
      .withColumn("__cn", Vectors.dotQ(col("__cv"), col("__cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    rankTopK(scored, k)
  }
}
