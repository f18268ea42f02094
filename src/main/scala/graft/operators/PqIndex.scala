package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/**
 * Product-quantization (PQ) index — the bytes-read lever for ANN at
 * corpus scale (Jégou, Douze, Schmid 2011, "Product Quantization for
 * Nearest Neighbor Search"). [[IvfIndex]] prunes WHICH vectors a probe
 * reads (cell directories); PQ shrinks HOW MANY BYTES each vector costs:
 * a D-dim float vector (4·D bytes; 256 B at D=64) is stored as `m` small
 * codebook codes (m bytes-ish as ints; 8 codes at m=8) — a ~16–32×
 * reduction in what an exhaustive scoring scan reads and shuffles.
 *
 * Pipeline:
 *   - [[trainCodebooks]]: L2-normalize, split each vector into `m`
 *     contiguous subvectors of D/m dims, and run Lloyd k-means PER
 *     SUBSPACE — all `m` subspaces in ONE distributed job per iteration
 *     (the subspace id is just another grouping key; one corpus pass per
 *     iteration regardless of m). Deterministic: seeds are the ksub
 *     smallest-id rows' subvectors; assignment ties break toward the
 *     lower code.
 *   - [[save]]/[[append]]: encode every vector as its per-subspace
 *     nearest-codeword ids (broadcast argmin, zero shuffle) and persist
 *     `path/codebooks` (m·ksub rows, tiny) + `path/codes` (id + m ints
 *     per vector) + a geometry marker ([[IndexMeta]], the
 *     BandIndex/IvfIndex drift-guard discipline).
 *   - [[probe]]: asymmetric-distance computation (ADC) — per query, ONE
 *     m×ksub lookup table of subvector inner products (computed once
 *     against the broadcast codebooks), then every stored vector scores
 *     in m array lookups + adds, never touching float vectors. The heap
 *     aggregate keeps `candidates` per query; an optional exact re-rank
 *     fetches ONLY the candidates' full vectors (id-pushdown into the
 *     scan when the candidate set is small) and re-scores with the same
 *     quantized-exact cosine as [[Similarity.bruteForceTopK]] — with
 *     `candidates` ≥ corpus the result is EXACTLY brute force
 *     (oracle-checked), which pins the whole plumbing; real deployments
 *     run candidates ≈ 10–50× k for recall at a fraction of the bytes.
 *
 * Cosine ranking contract: vectors are L2-normalized BEFORE codebook
 * training and encoding, so inner product against the reconstruction
 * approximates cosine (the standard unit-sphere PQ setup). Zero-norm
 * vectors have no direction — they are dropped at save/append (counted
 * nowhere in the index) and score null as queries.
 */
object PqIndex {

  /** Identifies the normalization/encoding scheme; bump on change — codes
    * from different schemes silently mis-rank ([[IvfIndex]]'s rule). */
  val SchemeVersion = "unit-l2-pq-v1"

  private def codebooksPath(path: String) = s"$path/codebooks"
  private def codesPath(path: String) = s"$path/codes"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** `(… , __xn array<double>)`: L2-normalized double vector, null for
    * zero-norm/null input. */
  private[operators] def withUnit(df: DataFrame, vec: String): DataFrame = {
    val x = col(vec).cast("array<double>")
    df.withColumn("__n2", dot(x, x))
      .withColumn("__xn",
        when(col("__n2") > 0.0, transform(x, v => v / sqrt(col("__n2")))))
      .drop("__n2")
  }

  /** The m subvector slices of `__xn`, materialized ONCE per row as an
    * array column. Inlining `slice` into the per-codeword lambdas instead
    * re-slices (and re-allocates) per (subspace × codeword) evaluation —
    * measured as the dominant cost of encoding 1M vectors. Aligned by
    * position with [[bookArray]]'s subspace order, so `zip_with` walks
    * both in lock-step. */
  private[operators] def subsColumn(m: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      s => slice(col("__xn"), s * dsub + 1, lit(dsub)))

  /** Vector dims off the first row — one tiny job; the caller's frames are
    * small or the value is read once at save time. */
  private def dimsOf(df: DataFrame, vec: String): Int =
    df.select(size(col(vec)).cast("int").as("d")).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "cannot infer vector dims from an empty frame"))

  /**
   * Per-subspace Lloyd k-means codebooks `(s, cent_id, cvec)` with DENSE
   * codes 0..ksub-1 in every subspace (the ADC lookup table indexes by
   * code). One corpus pass per iteration covers all m subspaces: rows
   * explode into (subspace, subvector) pairs and the subspace id joins the
   * grouping key — m never multiplies the job count.
   */
  def trainCodebooks(corpus: DataFrame, id: String, vec: String,
      m: Int, ksub: Int, iterations: Int = 3): DataFrame =
    trainCodebooksFor(corpus, id, vec, m, ksub, iterations, 0 until m,
      hashSeeds = false)

  /** [[trainCodebooks]] restricted to `subs` — the single-subspace path
    * [[retrainSubspace]] takes (training cost scales with the subspaces
    * actually trained, not m). `hashSeeds` orders the deterministic seed
    * pick by (md5 bucket, id) instead of plain id: a subspace usually
    * collapses BECAUSE the smallest-id rows sat on one density mode, and
    * near-identical seeds are (up to ties) a Lloyd fixed point — a retrain
    * that re-seeds identically reproduces the pathology it exists to heal.
    * Hash order stays deterministic and engine-portable while
    * decorrelating the pick from ingest adjacency. */
  private def trainCodebooksFor(corpus: DataFrame, id: String, vec: String,
      m: Int, ksub: Int, iterations: Int, subs: Seq[Int],
      hashSeeds: Boolean): DataFrame = {
    requireNumericId(corpus, id) // a string id would null-cast silently
    val dims = dimsOf(corpus, vec)
    require(m > 0 && dims % m == 0,
      s"m=$m must divide the vector dims ($dims)")
    require(ksub >= 2, s"ksub must be >= 2, got $ksub")
    require(subs.nonEmpty && subs.forall(s => s >= 0 && s < m),
      s"subspaces must lie in [0, $m), got ${subs.mkString(",")}")
    val dsub = dims / m
    // persist the exploded subvector frame: every consumer below (seeds +
    // one plan per Lloyd round) would otherwise re-inline the normalize/
    // slice HOF tree into its own plan — the train loop then spends its
    // time re-optimizing and re-evaluating deep nested-lambda expressions,
    // not clustering (measured: seeds alone cost seconds at 2k vectors)
    val sv = graft.core.Caches.track(
      withUnit(corpus.select(col(id).cast("long").as("__pid"),
          col(vec).as("__pv")), "__pv")
        .filter(col("__xn").isNotNull) // zero-norm rows carry no direction
        .select(col("__pid"), col("__xn"),
          explode(array(subs.map(lit): _*)).as("s"))
        .withColumn("sv", slice(col("__xn"), col("s") * dsub + 1, lit(dsub)))
        .select(col("__pid"), col("s"), col("sv")))
    // deterministic seeds: the ksub smallest-id rows' subvectors, re-labelled
    // densely 0..ksub-1 per subspace (ADC indexing needs dense codes). The
    // seed ids come from a TakeOrdered over ONE subspace's id column (every
    // surviving row carries all trained subspaces) — a windowed row_number
    // over the full exploded frame would globally sort corpus×m rows to pick k
    val seedIds = sv.filter(col("s") === subs.head)
      .select(col("__pid"))
      .orderBy((if (hashSeeds) Seq(Sampling.hashBucket(col("__pid")).asc)
        else Seq.empty[Column]) :+ col("__pid").asc: _*)
      .limit(ksub)
    val w = Window.partitionBy(col("s")).orderBy(col("__pid").asc)
    // codebooks live ON THE DRIVER between rounds — m×ksub rows by
    // construction (the [[Similarity.kmeansCentroids]] r21 discipline):
    // each Lloyd round is exactly ONE distributed action (the means
    // aggregation, collected at ≤ m×ksub rows) instead of a
    // localCheckpoint whose action also ran a cents⋈means join and a
    // block-manager materialization. Arithmetic untouched — same
    // expressions over the same values; a collect round-trip of doubles
    // is exact, so codes are bit-identical to the checkpointed form.
    val spark = corpus.sparkSession
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true)))
    def centsDf(rows: Seq[(Int, Int, Seq[Double])]): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        rows.map { case (s, c, cv) =>
          org.apache.spark.sql.Row(s, c, cv)
        }.asJava, centSchema)
    }
    var cents: Seq[(Int, Int, Seq[Double])] =
      sv.join(broadcast(seedIds), Seq("__pid"))
        .withColumn("__rn", row_number().over(w)) // ksub×m rows — trivial sort
        .select(col("s"), (col("__rn") - 1).cast("int").as("cent_id"),
          col("sv").as("cvec"))
        .collect().map(r => (r.getInt(0), r.getInt(1),
          if (r.isNullAt(2)) null else r.getSeq[Double](2))).toSeq
    (0 until iterations).foreach { _ =>
      // per-sub codeword array, broadcast; L2 argmin = argmin(cn2 - 2·x·c)
      // (the row's own norm is constant under the argmin)
      val centArr = centsDf(cents)
        .groupBy(col("s")).agg(sort_array(collect_list(struct(
          col("cent_id"), col("cvec"), dot(col("cvec"), col("cvec")).as("cn2"))))
          .as("__cents"))
      val assigned = sv.join(broadcast(centArr), Seq("s"))
        .withColumn("__best", array_min(transform(col("__cents"), ct =>
          struct(
            coalesce(ct.getField("cn2") - lit(2.0) * dot(col("sv"), ct.getField("cvec")),
              lit(Double.MaxValue)).as("d2"),
            ct.getField("cent_id").as("code")))))
        .select(col("s"), col("__best").getField("code").as("cell"), col("sv"))
      // per-(sub, cell) mean, position-wise (kmeansCentroids' shape + one key)
      val means = assigned
        .select(col("s"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("s"), col("cell"), col("pos")).agg(avg(col("x")).as("mu"))
        .groupBy(col("s"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("s"), col("cell"),
          transform(col("pm"), e => e.getField("mu")).as("mvec"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
        .toMap
      // empty cells keep their previous codeword
      cents = cents.map { case (s, c, old) =>
        (s, c, means.getOrElse((s, c), old))
      }
    }
    centsDf(cents)
  }

  /** Every subspace's codes must be exactly 0..k-1 (dense): the ADC table
    * indexes codewords BY POSITION (`element_at(lut, code + 1)`), so a
    * gap or duplicate in externally-supplied codebooks would mis-index
    * silently. [[trainCodebooks]] guarantees density; this guards the
    * `codebooks`-param path at save time (m×ksub rows — bounded). */
  private[operators] def requireDenseCodes(books: DataFrame): Unit = {
    val bad = books.groupBy(col("s")).agg(
        min(col("cent_id")).as("mn"), max(col("cent_id")).as("mx"),
        countDistinct(col("cent_id")).as("nd"), count(lit(1)).as("n"))
      .collect()
      .filter(r => r.getInt(1) != 0 || r.getInt(2).toLong != r.getLong(3) - 1
        || r.getLong(4) != r.getLong(3))
    require(bad.isEmpty,
      s"PQ codebooks must carry dense codes 0..k-1 per subspace (ADC " +
        s"indexes by position); subspaces ${bad.map(_.getInt(0)).mkString(",")} " +
        "have gaps or duplicates")
  }

  /** One-row frame `(__books array<struct<s, cents array<struct<cent_id,
    * cvec, cn2>>>>)`, subspaces AND codes sorted — broadcast for encode
    * (argmin needs cn2) and ADC (lookup indexes by position = dense code). */
  private[operators] def bookArray(codebooks: DataFrame): DataFrame =
    codebooks
      .groupBy(col("s")).agg(sort_array(collect_list(struct(
        col("cent_id"), col("cvec"), dot(col("cvec"), col("cvec")).as("cn2"))))
        .as("cents"))
      .agg(sort_array(collect_list(struct(col("s"), col("cents"))))
        .as("__books"))

  /** The per-subspace nearest-codeword codes off aligned `__books` /
    * `__subs` columns — shared with the IVF+PQ composition. */
  private[operators] def codesColumn(books: Column, subs: Column): Column =
    zip_with(books, subs, (sb, sub) =>
      array_min(transform(sb.getField("cents"), ct =>
        struct(
          coalesce(ct.getField("cn2") - lit(2.0) * dot(sub, ct.getField("cvec")),
            lit(Double.MaxValue)).as("d2"),
          ct.getField("cent_id").as("code"))))
        .getField("code"))

  /** The per-subspace ADC lookup table (lut[s][code+1] = <q_s, codeword>)
    * off aligned `__books` / `__subs` columns. */
  private[operators] def lutColumn(books: Column, subs: Column): Column =
    zip_with(books, subs, (sb, sub) =>
      transform(sb.getField("cents"), ct => dot(sub, ct.getField("cvec"))))

  /** The unit-domain reconstruction of a code row off aligned `__books` /
    * `codes` columns: per subspace the codeword the code indexes (dense
    * codes ⇒ element_at by position), concatenated back to a D-dim double
    * vector — the decode side of the PQ contract, i.e. everything the
    * index knows about a stored vector WITHOUT touching the float table.
    * [[IvfPqIndex.resplitCell]] sub-clusters and re-routes on this. */
  private[operators] def reconstructColumn(books: Column, codes: Column): Column =
    flatten(zip_with(books, codes, (sb, c) =>
      element_at(sb.getField("cents"), c + 1).getField("cvec")))

  /** Encode each row's unit vector as `m` dense codes (broadcast argmin,
    * zero shuffle): `(<outId>, codes array<int>)`; zero-norm rows dropped. */
  private def encode(df: DataFrame, id: String, vec: String, outId: String,
      books: DataFrame, m: Int, dsub: Int): DataFrame =
    withUnit(df.select(col(id).as(outId), col(vec).as("__pv")), "__pv")
      .filter(col("__xn").isNotNull)
      .withColumn("__subs", subsColumn(m, dsub))
      .crossJoin(broadcast(books))
      .select(col(outId), codesColumn(col("__books"), col("__subs")).as("codes"))

  /**
   * Train codebooks on `corpus` and persist codebooks + codes + geometry
   * marker. Overwrite semantics (rebuild); growth is [[append]].
   */
  def save(corpus: DataFrame, id: String, vec: String, path: String,
      m: Int = 8, ksub: Int = 16, iterations: Int = 3,
      codebooks: Option[DataFrame] = None,
      trainFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    requireNumericId(corpus, id)
    val dims = dimsOf(corpus, vec)
    require(m > 0 && dims % m == 0, s"m=$m must divide the vector dims ($dims)")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    // codebooks converge on a sample long before the full corpus (the
    // standard PQ training discipline); the sample is the deterministic
    // md5-bucket subset, so retrains are reproducible and consistent with
    // the corpus's split/mix hash order. Granularity is the hash's 100
    // buckets — fractions below 1% floor to ONE bucket (max(1, …)), never
    // to an empty training set that would surface as a misleading
    // "cannot infer vector dims from an empty frame" on a non-empty corpus
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(Sampling.hashBucket(col(id)) <
        math.max(1, math.rint(trainFraction * 100).toInt))
    val books = codebooks.getOrElse(
      trainCodebooks(trainSet, id, vec, m, ksub, iterations))
    requireDenseCodes(books)
    books.coalesce(1).write.mode("overwrite").parquet(codebooksPath(path))
    // encode against the JUST-SAVED codebooks — the file probes will load
    val saved = spark.read.parquet(codebooksPath(path))
    encode(corpus, id, vec, "vec_id", bookArray(saved), m, dims / m)
      .write.mode("overwrite").parquet(codesPath(path))
    IndexMeta.write(spark, path, Map("kind" -> "pq",
      "dims" -> dims.toString, "m" -> m.toString,
      "ksub" -> saved.select(max(col("cent_id"))).head().getInt(0).+(1).toString,
      "scheme" -> SchemeVersion))
  }

  /** The index parameters recorded at [[save]] ([[IvfIndex.readParams]]'
    * twin). */
  def readParams(spark: SparkSession, path: String): Map[String, String] =
    IndexMeta.read(spark, path)

  def loadCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(codebooksPath(path))

  def loadCodes(spark: SparkSession, path: String): DataFrame = {
    // EVERY reader funnels through here, so a swap interrupted by a crash
    // in ANY operation (vacuum, retrain) rolls forward before the read —
    // not only when the same operation happens to run next. This makes
    // reader-side repair subject to DirSwap's concurrency caveat: a probe
    // racing an IN-FLIGHT swap shares the maintainer's window (see the
    // DirSwap scaladoc, non-atomic-rename stores especially).
    DirSwap.repair(spark, codesPath(path))
    spark.read.parquet(codesPath(path))
  }

  /** Geometry/scheme drift guard — [[IvfIndex]]'s checkCompat for PQ. */
  private def checkCompat(spark: SparkSession, path: String,
      df: DataFrame, vec: String, op: String): Map[String, String] = {
    val saved = IndexMeta.read(spark, path)
    require(saved.nonEmpty, s"no PQ index marker at $path — not a PQ index?")
    saved.get("scheme").filter(_ != SchemeVersion).foreach { sc =>
      throw new IllegalStateException(
        s"PQ index at $path encodes scheme '$sc' but this build is " +
          s"'$SchemeVersion' — codes from different schemes mis-rank; rebuild")
    }
    val batchDims = df.select(size(col(vec)).cast("int").as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
    (saved.get("dims").map(_.toInt), batchDims) match {
      case (Some(d0), Some(d)) if d0 != d =>
        throw new IllegalStateException(
          s"PQ index at $path was built for $d0-dim vectors but this $op " +
            s"batch carries $d dims — subvector split would be wrong; rebuild")
      case _ => ()
    }
    saved
  }

  /** Encode an accepted ingest batch with the saved codebooks and append
    * its codes — the nightly-growth path ([[IvfIndex.append]]'s twin). */
  def append(batch: DataFrame, id: String, vec: String, path: String): Unit = {
    val spark = batch.sparkSession
    requireNumericId(batch, id)
    // appending into a codes dir a crashed swap left missing would CREATE
    // a fresh directory beside the stranded stage — repair first
    DirSwap.repair(spark, codesPath(path))
    val meta = checkCompat(spark, path, batch, vec, "append")
    val dsub = meta("dims").toInt / meta("m").toInt
    encode(batch, id, vec, "vec_id", bookArray(loadCodebooks(spark, path)),
      meta("m").toInt, dsub)
      .write.mode("append").parquet(codesPath(path))
  }

  /** Retract vectors from the index — [[BandIndex.removeIds]]' contract
    * over the flat PQ layout: O(|ids|) tombstone append, every [[probe]]
    * subtracts the set before scoring, physical rewrite deferred to
    * [[vacuum]]. An [[append]] of a retracted id stays suppressed until
    * the vacuum; [[retrainSubspace]]'s full-coverage guard still expects
    * retracted rows in `corpus` until then — vacuum before retraining
    * against a corpus that already dropped them. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.append(spark, path, ids)

  /** Physically drop retracted code rows and clear the tombstone set. The
    * flat layout has no partitions to scope to, so this is one rewrite of
    * the codes table (still only m bytes-ish per row — never the corpus),
    * staged and swapped with the [[DirSwap]] crash discipline
    * [[retrainSubspace]] uses. Returns rows removed; no-op (0) when
    * nothing is retracted. */
  def vacuum(spark: SparkSession, path: String): Long = {
    val live = codesPath(path)
    val staged = live + "__vacuum"
    DirSwap.repair(spark, live)
    val fs = new org.apache.hadoop.fs.Path(staged)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    Tombstones.read(spark, path) match {
      case None => 0L
      case Some(ts) =>
        val codes = loadCodes(spark, path)
        val bts = broadcast(ts)
        val removed = codes
          .join(bts, codes("vec_id") === bts(Tombstones.IdCol), "left_semi")
          .count()
        if (removed == 0L) { Tombstones.clear(spark, path); return 0L }
        codes.join(bts, codes("vec_id") === bts(Tombstones.IdCol), "left_anti")
          .write.parquet(staged)
        DirSwap.swap(spark, live, staged)
        // invalidate cached plans/listings over the rewritten path
        // ([[PartitionVacuum]]'s reasoning)
        spark.catalog.refreshByPath(live)
        Tombstones.clear(spark, path) // commit point — probes subtract
        removed                       // until here, so a crash re-runs
    }
  }

  /**
   * The remedy [[codeStats]] prescribes for a saturated subspace: re-run
   * Lloyd's for ONE subspace (training cost = one slice of one corpus
   * pass, not m of them; seeds re-picked in hash order so the retrain
   * escapes the collapsed initialization — see [[trainCodebooksFor]]),
   * splice the new codewords into the codebooks file, and refresh the
   * codes column — scheme, m, ksub and every OTHER subspace's codewords
   * stay exactly as recorded, so the drift markers never bump and
   * appended batches keep composing.
   *
   * `corpus` must cover EVERY indexed row (the original save plus all
   * appended batches): codes are recomputed from vectors, and a row
   * absent from `corpus` would vanish from the index — guarded by a
   * row-count check before anything on disk changes.
   *
   * The refresh re-encodes all m positions rather than splice-joining the
   * new position onto the old codes: codes are a pure deterministic
   * function of (codebooks, vector), so unchanged subspaces reproduce
   * bit-identical codes (spec-pinned), and the broadcast-argmin
   * projection is SHUFFLE-FREE — a position-splice join would shuffle the
   * corpus-sized codes table by id to save m−1 codegen'd argmins.
   *
   * Crash discipline: new codes stage to `codes__retrain` first; the
   * codebooks overwrite and the codes swap then commit back to back. The
   * swap itself is the [[DirSwap]] rename-aside sequence (old codes move
   * to `codes__old` before the staged directory renames in), and entry
   * REPAIRS an interrupted swap by rolling the verified staged directory
   * forward — so "re-run the retrain" is always a valid repair, with no
   * crash point that leaves the index without a codes directory a re-run
   * would then die reading. A crash between the codebooks overwrite and
   * the swap still leaves codebooks and codes from different trains (ADC
   * mis-ranks until the re-run); the staging directory's presence marks
   * the interruption.
   */
  def retrainSubspace(corpus: DataFrame, id: String, vec: String,
      path: String, s: Int, iterations: Int = 3,
      trainFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    requireNumericId(corpus, id)
    // a prior retrain OR vacuum may have crashed mid-swap: restore a
    // consistent codes directory BEFORE anything reads it (checkCompat's
    // dims probe does not, but the coverage counts below do)
    DirSwap.repair(spark, codesPath(path))
    val meta = checkCompat(spark, path, corpus, vec, "retrain")
    val m = meta("m").toInt
    val ksub = meta("ksub").toInt
    require(s >= 0 && s < m, s"subspace $s outside [0, $m)")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val dims = meta("dims").toInt
    val spliced = splicedBooks(corpus, id, vec, loadCodebooks(spark, path),
      m, ksub, iterations, s, trainFraction)
    val tmp = codesPath(path) + "__retrain"
    encode(corpus, id, vec, "vec_id", bookArray(spliced), m, dims / m)
      .write.mode("overwrite").parquet(tmp)
    requireFullCoverage(spark, loadCodes(spark, path).select(col("vec_id")),
      spark.read.parquet(tmp).select(col("vec_id")), tmp, "retrainSubspace")
    spliced.coalesce(1).write.mode("overwrite").parquet(codebooksPath(path))
    DirSwap.swap(spark, codesPath(path), tmp)
    // files under unchanged paths were replaced: drop cached plans and
    // listings over them ([[PartitionVacuum]]'s staleness reasoning)
    spark.catalog.refreshByPath(codesPath(path))
    spark.catalog.refreshByPath(codebooksPath(path))
  }

  /** The codebooks after re-training ONE subspace: Lloyd's over subspace
    * `s` only (hash-ordered seeds — see [[trainCodebooksFor]]) on the
    * deterministic `trainFraction` hash sample, spliced DRIVER-SIDE into
    * the loaded books (m×ksub rows — bounded by construction, the
    * IvfIndex.resplitCell centroid-file discipline: the codebooks write
    * that follows replaces the very file the kept rows were read from,
    * and a plan-side filtered-scan ∪ aggregate union trips a Catalyst
    * constraint-rewrite NoSuchElementException besides). Shared by the PQ
    * and IVF+PQ retrain paths; density re-checked on the spliced result. */
  private[operators] def splicedBooks(corpus: DataFrame, id: String,
      vec: String, books: DataFrame, m: Int, ksub: Int, iterations: Int,
      s: Int, trainFraction: Double): DataFrame = {
    val spark = corpus.sparkSession
    require(s >= 0 && s < m, s"subspace $s outside [0, $m)")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else corpus.filter(Sampling.hashBucket(col(id)) <
        math.max(1, math.rint(trainFraction * 100).toInt))
    val retrained = trainCodebooksFor(trainSet, id, vec, m, ksub,
      iterations, Seq(s), hashSeeds = true)
    val bookSchema = books.schema
    val keptRows = books.filter(col("s") =!= s).collect()
    val newRows = retrained
      .select(bookSchema.fieldNames.map(col).toIndexedSeq: _*).collect()
    val spliced = spark.createDataFrame(
      java.util.Arrays.asList(keptRows ++ newRows: _*), bookSchema)
    requireDenseCodes(spliced)
    spliced
  }

  /** The retrain coverage guard, shared by both retrain paths: equal
    * counts + zero missing ids ⇒ identical id sets (a same-sized corpus
    * SNAPSHOT with swapped rows must fail too, not just a short one). ONE
    * full-outer join aggregation answers all three questions in a single
    * job — the former shape ran two counts plus an anti-join count, three
    * driver round-trips for one maintenance predicate. On violation the
    * staged directory is deleted and the index left untouched. */
  private[operators] def requireFullCoverage(spark: SparkSession,
      liveIds: DataFrame, stagedIds: DataFrame, stagedDir: String,
      op: String): Unit = {
    // per-key row counts FIRST (a duplicate id on either side must count
    // as its row count, exactly like the former plain count() calls — a
    // raw row-level outer join would multiply duplicates into a product)
    val r = liveIds.groupBy(col("vec_id")).agg(count(lit(1)).as("__l"))
      .join(stagedIds.groupBy(col("vec_id")).agg(count(lit(1)).as("__s")),
        Seq("vec_id"), "full_outer")
      .agg(
        coalesce(sum(col("__s")), lit(0L)).as("have"),
        coalesce(sum(col("__l")), lit(0L)).as("expect"),
        coalesce(sum(when(col("__s").isNull, col("__l"))), lit(0L))
          .as("missing"))
      .head()
    val (have, expect, missing) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    if (have != expect || missing != 0) {
      new org.apache.hadoop.fs.Path(stagedDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(stagedDir), true)
      throw new IllegalStateException(
        s"$op corpus encodes $have rows ($missing indexed ids " +
          s"uncovered) but the index holds $expect — pass the FULL indexed " +
          "corpus (save + every append); missing rows would silently " +
          "vanish from the index")
    }
  }

  /**
   * ADC top-k: per query one m×ksub inner-product lookup table (one
   * projection against the broadcast codebooks), then every stored code
   * row scores in m lookups+adds — the scan and the heap aggregate touch
   * code bytes only, never float vectors. Keeps `candidates` per query by
   * approximate score (desc, id asc).
   *
   * `rerank`: exact refinement — fetch ONLY the candidates' full vectors
   * from the given `(id, vec)` table and re-score with the quantized-exact
   * cosine ([[Similarity.bruteForceTopK]]'s arithmetic), returning top-k of
   * `(query_id, neighbor_id, rank, cosine)`. When the candidate id set is
   * small (≤ [[IsinPushdownCap]]) it is pushed into the vector scan as a
   * static IN filter — parquet row-group pruning, the [[IvfIndex.probe]]
   * touched-cells discipline — else a broadcast semi-join prunes post-scan.
   * Without `rerank`, rows are `(query_id, neighbor_id, rank, pq_score)`
   * and `candidates` is the k.
   */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qId: String, qVec: String, candidates: Int,
      rerank: Option[(DataFrame, String, String)] = None,
      k: Int = 10): DataFrame = {
    require(candidates > 0, s"candidates must be positive, got $candidates")
    val meta = checkCompat(spark, path, queries, qVec, "probe")
    val m = meta("m").toInt
    val dsub = meta("dims").toInt / m
    val books = bookArray(loadCodebooks(spark, path))
    // per-query ADC lookup table: lut[s][code+1] = <q_s, codeword>; the
    // batch is small by contract → broadcast to the codes scan
    val q = withUnit(queries.select(col(qId).as("query_id"), col(qVec).as("__pv")),
        "__pv")
      // a zero-norm query has no direction: drop it BEFORE building the LUT
      // (the same "carries no direction" rule the encoder applies to the
      // corpus, and the same filter position encode() uses). Filtering the
      // LUT column instead would be a no-op — subsColumn over a null __xn
      // yields a non-null array of nulls, so such a query would broadcast
      // and score the whole codes table for nothing
      .filter(col("__xn").isNotNull)
      .withColumn("__subs", subsColumn(m, dsub))
      .crossJoin(broadcast(books))
      .select(col("query_id"),
        lutColumn(col("__books"), col("__subs")).as("__lut"))
    val scored = Tombstones.subtract(spark, path, loadCodes(spark, path),
        "vec_id")
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("pq_score", adcScore(col("__lut"), col("codes")))
    val cands = adcTopCandidates(scored, candidates)
    rerank match {
      case None => cands
      case Some((full, fId, fVec)) =>
        exactRerank(cands, queries, qId, qVec, full, fId, fVec, k)
    }
  }

  /** ADC approximate score: m lookups + adds against the per-query LUT —
    * the native codegen'd loop ([[graft.plans.AdcScoreQ]]): this expression
    * runs corpus×queries/cells times per probe (billions in a batch-dedup
    * night), where the interpreted HOF chain was the measured bottleneck. */
  private[operators] def adcScore(lut: Column, codes: Column): Column =
    Vectors.adcScoreQ(lut, codes)

  /** The composable reference form of [[adcScore]] — semantics the native
    * expression reproduces for null and NON-NEGATIVE codes (PlansSpec pins
    * equivalence on the null/poison cases; on a negative code the forms
    * intentionally diverge — element_at throws or wraps, the native form
    * returns null — see [[graft.plans.AdcScoreQ]]). */
  private[graft] def adcScoreHof(lut: Column, codes: Column): Column =
    aggregate(zip_with(lut, codes, (l, c) => element_at(l, c + 1)),
      lit(0.0), (s, x) => s + x)

  /** Top-`candidates` per query by (pq_score desc, id asc) via the bounded
    * heap — at most `candidates` rows per query cross the exchange.
    * (A declarative `max(struct)` special case for candidates = 1 was
    * tried and measured SLOWER — 202 vs 190 s on the aging tier's night-6
    * workload: Max over a struct plans through ObjectHashAggregate with a
    * struct copy per row, while the heap's k=1 update is one primitive
    * compare. The heap stays for every k.) */
  private[operators] def adcTopCandidates(
      scored: DataFrame, candidates: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(Similarity.boundedTopK(col("pq_score"), col("vec_id").cast("long"),
        candidates).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("entry.score").as("pq_score"))

  /** Exact refinement of an approximate candidate list: fetch ONLY the
    * candidates' full vectors (IN-pushdown under [[IsinPushdownCap]], else
    * broadcast semi-join) and re-rank with the quantized-exact cosine —
    * shared by the PQ and IVF+PQ probes. */
  private[operators] def exactRerank(cands: DataFrame,
      queries: DataFrame, qId: String, qVec: String,
      full: DataFrame, fId: String, fVec: String, k: Int): DataFrame = {
    requireNumericId(full, fId) // candidate ids are BIGINT; a string id
    // table would null-cast and silently fetch nothing
    // candidate ids: ≤ |queries| × candidates by construction (bounded
    // heap), so the collect is bounded no matter the corpus size
    val pairs = cands.select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val ids = pairs.select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0))
    val fetchedBase = full.select(col(fId).cast("long").as("neighbor_id"),
      Vectors.quantize(col(fVec)).as("__cv"))
    val fetched =
      if (ids.length <= IsinPushdownCap)
        // static IN filter reaches the parquet scan (row-group pruning)
        fetchedBase.filter(col("neighbor_id").isin(ids.map(Long.box).toIndexedSeq: _*))
      else
        fetchedBase.join(
          broadcast(pairs.select(col("neighbor_id")).distinct()),
          Seq("neighbor_id"), "left_semi")
    val qq = Similarity.queriesQuantized(queries, qId, qVec)
    val exact = fetched.join(broadcast(pairs), Seq("neighbor_id"))
      .join(broadcast(qq), Seq("query_id"))
      .withColumn("__cn", Vectors.dotQ(col("__cv"), col("__cv")))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    Similarity.rankTopKPublic(exact, k)
  }

  /**
   * ADC-threshold calibration — turns the documented footgun into an
   * operator. ADC scores are NOT calibrated cosines: they approximate
   * `<q, reconstruction(x)>`, and at coarse geometries the gap is large
   * (SCALE.md round-14: identical-vector twins scored 0.54–0.80 ADC at
   * m=8/32-dim against 1.0 exact, so a 0.95 drop threshold silently never
   * fired). A caller picking a threshold needs the ADC-score distribution
   * AT a known exact cosine for THEIR index geometry — which is exactly
   * what this returns.
   *
   * `sample` is a bounded subset of the INDEXED rows (ids + float
   * vectors; rows absent from the index drop out of the pairing). Every
   * ordered sample pair is scored BOTH ways — exact quantized cosine from
   * the floats ([[Similarity.bruteForceTopK]]'s arithmetic) and ADC from
   * the saved index's codes — and the pairs bucket into `bins` equal
   * cosine bins over [-1, 1]. Output, one row per non-empty bin:
   * `(cos_lo, cos_hi, n_pairs, adc_p05, adc_p50, adc_p95)` (exact
   * percentiles — the sample is bounded by contract). Cost: |sample|²
   * scored pairs, distributed; a few thousand rows calibrate a geometry
   * in seconds.
   *
   * Reading the curve: to drop docs whose best standing match has exact
   * cosine ≥ c, set the ADC threshold near the `adc_p05` of c's bin —
   * ~95% of true matches at that cosine then clear the threshold
   * ([[adcThresholdFor]] computes this directly). The alternative that
   * needs no calibration at all is the exact `rerankFrom` path, which the
   * ingest streams recommend as the default.
   */
  def calibrate(spark: SparkSession, path: String, sample: DataFrame,
      id: String, vec: String, bins: Int = 10): DataFrame =
    calibrationCurve(calibrationPairs(spark, path, sample, id, vec), bins)

  /** The binning half of [[calibrate]], over an already-scored pair frame
    * — shared with [[IvfPqIndex.calibrate]] (same curve, composed-layout
    * codes). */
  private[operators] def calibrationCurve(scored: DataFrame,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val width = 2.0 / bins
    scored
      .withColumn("__bin", least(floor((col("cosine") + 1.0) / width),
        lit(bins - 1)).cast("int"))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(pq_score, array(0.05, 0.5, 0.95))").as("__p"))
      .select(
        (lit(-1.0) + col("__bin") * width).as("cos_lo"),
        (lit(-1.0) + (col("__bin") + 1) * width).as("cos_hi"),
        col("n_pairs"),
        element_at(col("__p"), 1).as("adc_p05"),
        element_at(col("__p"), 2).as("adc_p50"),
        element_at(col("__p"), 3).as("adc_p95"))
      .orderBy(col("cos_lo"))
  }

  /** The single number threshold-semantics callers need: the
    * `recallQuantile` percentile of ADC score among sample pairs whose
    * exact cosine is ≥ `targetCosine`. Dropping at `pq_score >= t` then
    * catches ≈ (1 − recallQuantile) of true matches at/above the target
    * cosine on this index's geometry. Throws when the sample holds no
    * such pair — a threshold from zero evidence would be the 0.95-no-op
    * footgun all over again; widen the sample or lower the target. */
  def adcThresholdFor(spark: SparkSession, path: String, sample: DataFrame,
      id: String, vec: String, targetCosine: Double,
      recallQuantile: Double = 0.05): Double =
    calibrationThreshold(calibrationPairs(spark, path, sample, id, vec),
      targetCosine, recallQuantile)

  /** The quantile half of [[adcThresholdFor]], over an already-scored pair
    * frame — shared with [[IvfPqIndex.adcThresholdFor]]. */
  private[operators] def calibrationThreshold(scored: DataFrame,
      targetCosine: Double, recallQuantile: Double): Double = {
    require(recallQuantile > 0.0 && recallQuantile < 1.0,
      s"recallQuantile must be in (0, 1), got $recallQuantile")
    val matches = scored.filter(col("cosine") >= targetCosine)
    val row = matches
      .agg(expr(s"percentile(pq_score, $recallQuantile)").as("t"),
        count(lit(1)).as("n")).head()
    if (row.isNullAt(0) || row.getLong(1) == 0L)
      throw new IllegalArgumentException(
        s"no sample pair has exact cosine >= $targetCosine — cannot " +
          "calibrate an ADC threshold from zero evidence; widen the " +
          "sample (include known near-duplicates) or lower the target")
    row.getDouble(0)
  }

  /** Every ordered sample pair scored both ways: `(query_id, vec_id,
    * cosine, pq_score)` — exact from the sample's floats, ADC from the
    * saved codes. Shared by [[calibrate]] and [[adcThresholdFor]]. */
  private def calibrationPairs(spark: SparkSession, path: String,
      sample: DataFrame, id: String, vec: String): DataFrame = {
    val meta = checkCompat(spark, path, sample, vec, "calibrate")
    calibrationPairsOn(
      Tombstones.subtract(spark, path, loadCodes(spark, path), "vec_id"),
      bookArray(loadCodebooks(spark, path)), meta("m").toInt,
      meta("dims").toInt / meta("m").toInt, sample, id, vec)
  }

  /** The layout-agnostic core of [[calibrationPairs]]: `codes` is any
    * `(vec_id, codes)` frame — the flat codes table here, the union of
    * cell directories for [[IvfPqIndex.calibrate]] (ADC arithmetic is
    * identical; only where the codes live differs). The sample-id
    * restriction is applied HERE, with the [[exactRerank]] fetch idiom:
    * the sample is bounded by contract, so its ids collect and push into
    * the codes scan as a static IN filter (row-group pruning — on the
    * composed layout this prunes inside every cell directory) when small,
    * else a broadcast semi-join. */
  private[operators] def calibrationPairsOn(allCodes: DataFrame,
      books: DataFrame, m: Int, dsub: Int,
      sample: DataFrame, id: String, vec: String): DataFrame = {
    requireNumericId(sample, id)
    val q = withUnit(sample.select(col(id).cast("long").as("query_id"),
        col(vec).as("__pv")), "__pv")
      .filter(col("__xn").isNotNull)
      .withColumn("__subs", subsColumn(m, dsub))
      .crossJoin(broadcast(books))
      .select(col("query_id"),
        lutColumn(col("__books"), col("__subs")).as("__lut"))
    // stored side: the sample ids' codes from the index (absent ids drop)
    val sampleIds = sample.select(col(id).cast("long").as("vec_id"))
    val idList = sampleIds.distinct().collect().map(_.getLong(0))
    val base = allCodes.select(col("vec_id"), col("codes"))
    val codes =
      if (idList.length <= IsinPushdownCap)
        base.filter(col("vec_id").isin(idList.map(Long.box).toIndexedSeq: _*))
      else base.join(broadcast(sampleIds), Seq("vec_id"), "left_semi")
    val qq = Similarity.queriesQuantized(sample, id, vec)
    val cc = qq.select(col("query_id").as("vec_id"), col("__qv").as("__cv"),
      col("__qn").as("__cn"))
    codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("pq_score", adcScore(col("__lut"), col("codes")))
      .join(broadcast(qq), Seq("query_id"))
      .join(broadcast(cc), Seq("vec_id"))
      .withColumn("cosine",
        Vectors.cosineQ(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .select(col("query_id"), col("vec_id"), col("cosine"), col("pq_score"))
  }

  /** Per-subspace code-usage histogram `(s, code, n)` — the imbalance
    * audit ([[IvfIndex.cellStats]]' twin): a code soaking up most of a
    * subspace means its codeword sits on a density mode and ADC loses
    * resolution there; remedy is [[retrainSubspace]] (cheap — one corpus
    * pass, only that subspace trains) or raising ksub. */
  def codeStats(spark: SparkSession, path: String): DataFrame =
    loadCodes(spark, path)
      .select(posexplode(col("codes")).as(Seq("s", "code")))
      .groupBy(col("s"), col("code")).agg(count(lit(1)).as("n"))
      .orderBy(col("s").asc, col("n").desc, col("code").asc)

  /** Codes ride the BoundedTopK heap as BIGINT — the [[IvfIndex]]
    * numeric-id contract; fail up front, not as a null-cast NPE mid-job. */
  private[operators] def requireNumericId(df: DataFrame, id: String): Unit =
    require(df.schema(id).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"PqIndex stores numeric vector ids; column '$id' has type " +
        s"${df.schema(id).dataType} — map string ids to a stable numeric " +
        "key first")

  /** Above this many candidate ids, the rerank fetch switches from a
    * pushed-down IN filter to a broadcast semi-join (a giant IN list costs
    * more to evaluate per row-group than it prunes). */
  val IsinPushdownCap = 10000
}
