package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/**
 * Document-deduplication operators for training-data pipelines, each designed
 * around one shuffle and bounded candidate generation so they survive a 100×
 * scale-up:
 *
 *  - exact:        hash-groupBy on md5(text) — one shuffle, no pairs.
 *  - minhashLsh:   shingle → per-seed min-hash signature → band buckets →
 *                  pair generation *within* buckets only.
 *  - simhash:      64-bit xxhash64-based simhash; near-dups = equal simhash
 *                  (or banded prefixes) — one shuffle.
 *  - ngramJaccard: inverted-index pair join with a document-frequency cutoff
 *                  on shingles (stopword-shingle removal) to bound fanout.
 *
 * Portable variants use md5-hex (lexicographic min as the hash order) so an
 * external ANSI engine (the DuckDB oracle) reproduces results exactly;
 * xxhash64 variants are the faster engine-native path.
 */
object Dedup {

  /** Exact dedup: canonical = min(id) per md5(text); one hash shuffle. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text).cast("binary")).as("text_hash"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Rows minus exact duplicates (keeps the min(id) row of each group).
    * Hash-aggregate `min_by`, not a window: map-side partial aggregation
    * means at most one row per (map partition, text hash) crosses the
    * exchange and nothing is sorted — the `row_number` form shuffles and
    * sorts EVERY row. */
  def dropExactDuplicates(df: DataFrame, id: String, text: String): DataFrame = {
    val cols = df.columns.toSeq
    // ordering key struct(isNull, id): min_by skips null KEYS entirely, so a
    // group whose ids are all null would otherwise yield an all-null row —
    // the struct is never null and prefers non-null ids (matching the
    // oracle's NULLS LAST min semantics)
    df.groupBy(md5(col(text).cast("binary")).as("__h"))
      .agg(min_by(struct(cols.map(col): _*),
        struct(col(id).isNull.as("n"), col(id).as("v"))).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Word k-shingles of a document (distinct, as exploded rows). */
  def wordShingles(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    // tokenize into a real column first: referencing Text.tokens(...) inside
    // the transform lambda would re-run the regex split once per shingle
    // index instead of once per document
    val toks = df.select(col(id), Text.tokens(col(text)).as("__toks"))
    val n = size(col("__toks"))
    val sh = transform(
      sequence(lit(0), greatest(n - k, lit(0))),
      i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))
    toks.select(col(id), explode(array_distinct(sh)).as("shingle"))
  }

  /**
   * MinHash signature per document.
   *
   * `portable = true`: for seeds 0..numHashes-1, the minimum of
   * md5(seed || ' ' || shingle) (hex-string order). Equivalent quality to
   * integer minhash — md5 is uniform so the lexicographic min over hex is a
   * uniform min-hash — and reproducible in any engine with md5().
   *
   * `portable = false` (default, engine-native): ONE xxhash64 digest of the
   * full shingle string, then a per-seed hash family derived by re-hashing
   * the fixed-width 64-bit digest with the seed — O(1) per seed instead of
   * numHashes full-string digests, and integer min instead of hex-string
   * comparison. ~an order of magnitude less hashing work in the hot loop.
   */
  def minhashSignature(shingled: DataFrame, id: String, numHashes: Int,
      portable: Boolean = false): DataFrame = {
    // direct callers bypass lshBanded's input-derived sizing — size from
    // the (already exploded) shingle frame instead: the distinct, the
    // signature groupBy, and the join-back shuffle ≈ 3× its volume
    graft.core.ShuffleSizing.ensureFor(shingled, expansionFactor = 3.0)
    // hash each DISTINCT shingle once, then join back to the (id, shingle)
    // pairs: digest evaluations drop from |pairs| × H to |distinct| — at
    // corpus scale the distinct-shingle set is orders of magnitude smaller
    // and the extra equi-join shuffles no more than the groupBy already does.
    // Cache is registered with core.Caches — released by the session owner
    // after materialization (this result is returned lazily).
    val cached = graft.core.Caches.track(shingled)
    val distinctShingles = cached.select("shingle").distinct()
    val shingleHashes =
      if (portable) {
        val hashCols = (0 until numHashes).map(s =>
          md5(concat(lit(s.toString), lit(" "), col("shingle")).cast("binary")).as(s"h_$s"))
        distinctShingles.select(col("shingle") +: hashCols: _*)
      } else {
        // the string is digested ONCE into __d; each seed hashes the (long,
        // seed) pair — a fixed 12-byte xxhash64, the single-digest + cheap
        // remix family (two projections: CollapseProject keeps the non-cheap
        // __d from being inlined numHashes times)
        val hashCols = (0 until numHashes).map(s =>
          xxhash64(col("__d"), lit(s)).as(s"h_$s"))
        distinctShingles
          .select(col("shingle"), xxhash64(col("shingle")).as("__d"))
          .select(col("shingle") +: hashCols: _*)
      }
    val aggs = (0 until numHashes).map(s => min(col(s"h_$s")).as(s"mh_$s"))
    // MERGE hint, never broadcast and never a hash build: the
    // distinct-shingle table grows with corpus diversity, and "AQE falls
    // back to a shuffle join when it is big" proved FALSE in practice — on
    // a checkpoint-backed 100k-doc batch the optimizer's estimate for
    // (distinct → 8-hash projection) undershot reality by ~300× and the
    // auto-broadcast build collected 1 GB+ of task results into the
    // driver; the SHUFFLE_HASH retry then OOM'd building ~100 MB per-task
    // maps at 32 partitions (ScaleBench ingestspan tier, SCALE.md round
    // 15). Sort-merge is the one strategy that degrades by SPILLING
    // instead of dying, and the sort rides the exchanges this join pays
    // anyway.
    cached.join(shingleHashes.hint("MERGE"), Seq("shingle"))
      .groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, bucket) band-membership rows for the minhash LSH family —
    * the shared upstream of `minhashLshPairs` and `lshBucketStats`. Public
    * so a caller needing both pairs AND the audit histogram can compute the
    * signature pipeline ONCE (persist this frame, or use
    * `minhashLshWithStats` which does it for you). */
  def lshBanded(
      df: DataFrame, id: String, text: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      portable: Boolean = false): DataFrame = {
    // shuffle volume ≈ 24× the on-disk corpus (ScaleBench-measured: ~48 GB
    // shuffle write from a ~2 GB 5M-doc corpus — exploded shingles plus the
    // per-seed signature aggregation); raise the initial partition count so
    // per-task sort state stays bounded (the measured ENOSPC footgun)
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 24.0)
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(wordShingles(df, id, text, shingleK), id,
      numHashes, portable)
    sig.select(col(id),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rowsPerBand).map(r =>
            col(s"mh_${b * rowsPerBand + r}").cast("string")): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col(id), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from a banded (id, band, bucket) frame: docs sharing a
    * (band, bucket) pair up, expanded INSIDE each group — one groupBy
    * shuffle, never a self-join. Shared by the minhash and embedding LSH
    * paths. Warns through [[graft.core.Warn]] when called uncapped: the
    * in-bucket fanout is quadratic, so a degenerate bucket (empty docs,
    * boilerplate) can dominate a 100 TB job silently. */
  def pairsFromBanded(banded: DataFrame, id: String, maxBucket: Int,
      caller: String = "pairsFromBanded", strict: Boolean = false): DataFrame = {
    if (maxBucket == Int.MaxValue)
      graft.core.Warn(s"$caller: uncapped bucket expansion — pair fanout is " +
        "quadratic in the largest bucket; at scale pass maxBucket (engine " +
        "queries use LshMaxBucket=200) and audit drops with the bucket-stats " +
        "histogram")
    // Cap predicate counts ROWS (count(1)), not collected ids — collect_list
    // skips nulls, so a bucket with null-id docs would otherwise be
    // size-eligible here but not under an external engine's count(*).
    // LshGuard taps the PRE-filter bucket sizes in the same job (an
    // accumulator fed once per bucket row, no extra scan or action) and
    // warns at run time when the mean approaches the cap — the measured
    // bucket-space saturation mode where the cap silently drops every
    // bucket and recall collapses to zero.
    val buckets = graft.core.LshGuard.instrument(
        banded.groupBy(col("band"), col("bucket"))
          .agg(sort_array(collect_list(col(id))).as("ids"), count(lit(1)).as("__sz")),
        "__sz", maxBucket, caller, strict)
      .filter(col("__sz").between(2, maxBucket))
    buckets.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
  }

  /** Per-band bucket-size histogram from a banded frame — audit companion
    * of `pairsFromBanded`'s cap. */
  def bucketStatsFromBanded(banded: DataFrame): DataFrame =
    banded.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band"), col("bucket_size")).agg(count(lit(1)).as("n_buckets"))

  /**
   * MinHash + LSH near-dup candidate pairs: signatures split into `bands`
   * bands of `rowsPerBand` hashes; docs sharing any band bucket are
   * candidates. Pairs are expanded *inside* each (band, bucket) group —
   * one groupBy shuffle, no self-join — and buckets larger than `maxBucket`
   * are dropped entirely: real corpora have degenerate signatures (empty
   * docs, boilerplate) whose quadratic in-bucket fanout would otherwise
   * dominate the job at scale. Such docs are better handled by exact dedup
   * first; use `lshBucketStats` to audit what a cap drops.
   * Returns (id_a, id_b) with id_a < id_b, distinct.
   */
  def minhashLshPairs(
      df: DataFrame, id: String, text: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue, portable: Boolean = false,
      strict: Boolean = false): DataFrame =
    // group docs per (band, bucket) and expand i<j pairs inside the capped
    // array — same shape as ngramJaccardPairs. The former per-band self-join
    // read the banded frame twice (forcing a persist) and was unboundedly
    // quadratic in bucket size. The cap is opt-in (default uncapped, was 200
    // before round 5 — external callers relying on that default now get full
    // recall AND a Warn) because it silently changes recall; production
    // callers at scale SHOULD pass one.
    pairsFromBanded(
      lshBanded(df, id, text, shingleK, numHashes, bands, portable),
      id, maxBucket, caller = "minhashLshPairs", strict = strict)

  /**
   * Per-band bucket-size histogram (band, bucket_size, n_buckets) — the
   * ops-side audit for `maxBucket`: buckets with bucket_size > cap are the
   * ones `minhashLshPairs` drops. A separate frame rather than inline
   * accounting because counting drops inside the pair job would force an
   * extra action per run.
   */
  def lshBucketStats(
      df: DataFrame, id: String, text: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      portable: Boolean = false): DataFrame =
    bucketStatsFromBanded(lshBanded(df, id, text, shingleK, numHashes, bands, portable))

  /**
   * Pairs + audit histogram from ONE signature pipeline: the banded frame
   * is persisted (Caches-tracked — caller releases via `Caches.releaseAll`
   * at an idle point) and shared by both outputs, so running the audit
   * alongside the pair job costs one extra aggregation instead of a full
   * signature recompute (~2× the shingle/minhash work when run separately,
   * the q27+q58 profile).
   */
  def minhashLshWithStats(
      df: DataFrame, id: String, text: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue, portable: Boolean = false,
      strict: Boolean = false): (DataFrame, DataFrame) = {
    val banded = graft.core.Caches.track(
      lshBanded(df, id, text, shingleK, numHashes, bands, portable))
    (pairsFromBanded(banded, id, maxBucket, caller = "minhashLshWithStats",
        strict = strict),
      bucketStatsFromBanded(banded))
  }

  /**
   * Engine-native 64-bit SimHash from whitespace tokens: per-bit majority
   * vote of xxhash64(token). One aggregation, no pairs; near-dups share the
   * value (or a prefix band). `bits` ≤ 64.
   */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 64): DataFrame = {
    val tok = df.select(col(id), explode(Text.tokens(col(text))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val agg = tok.groupBy(col(id)).agg(bitCols.head, bitCols.tail: _*)
    val sim = (0 until bits).map { b =>
      when(col(s"s_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(id), sim.as("simhash"))
  }

  /**
   * Portable SimHash: per-bit majority vote over the hex digits of
   * md5(token) (4 bits per digit), emitted as a '0'/'1' bit string so the
   * value is reproducible in any engine with md5 — no 64-bit sign issues.
   * Same scale shape as `simhash`: one explode + one aggregation, no pairs.
   */
  def simhashPortable(df: DataFrame, id: String, text: String, bits: Int = 16): DataFrame = {
    require(bits >= 4 && bits <= 64 && bits % 4 == 0, "bits must be a multiple of 4 in [4,64]")
    val tok = df.select(col(id), explode(Text.tokens(col(text))).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val sums = (0 until bits).map { b =>
      val digit = b / 4 + 1 // hex digit (1-based), 4 bits each
      val dval = expr(s"instr('0123456789abcdef', substring(h, $digit, 1)) - 1")
      sum(when(shiftright(dval, b % 4).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val agg = tok.groupBy(col(id)).agg(sums.head, sums.tail: _*)
    val bitStr = concat((0 until bits).map(b =>
      when(col(s"s_$b") > 0, lit("1")).otherwise(lit("0"))): _*)
    agg.select(col(id), bitStr.as("simhash"))
  }

  /** Hamming distance between two equal-length '0'/'1' bit strings. */
  def hammingBits(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""), (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /**
   * N-gram Jaccard similarity pairs via inverted index: explode distinct
   * shingles, drop "stopword shingles" whose document frequency exceeds
   * `maxShingleDf` (bounds join fanout — the cutoff is exact and
   * deterministic), self-join on shingle, then
   * jaccard = |common| / (|a| + |b| - |common|). Returns pairs with
   * jaccard >= threshold.
   */
  def ngramJaccardPairs(
      df: DataFrame, id: String, text: String,
      k: Int = 3, threshold: Double = 0.5, maxShingleDf: Long = 50): DataFrame = {
    // shuffle ≈ 8× the on-disk corpus (measured ~14 GB from ~2 GB at 5M
    // docs: inverted index + common-count aggregation) — see lshBanded
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 8.0)
    // the shingle frame feeds two consumers (inverted index, per-doc sizes)
    // — persist (Caches-tracked) so tokenize+shingle runs once
    val sh = graft.core.Caches.track(wordShingles(df, id, text, k))
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    // group docs per shingle and expand i<j pairs inside the (≤ maxShingleDf)
    // array — one groupBy shuffle instead of a self-join that re-shuffles the
    // whole inverted index; fanout stays bounded by the df cutoff
    val docLists = sh.groupBy("shingle")
      .agg(sort_array(collect_list(col(id))).as("ids"))
      .filter(size(col("ids")).between(2, maxShingleDf))
    val pairs = docLists.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    val common = pairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("n_sh", "n_a"), common("id_a") === sizes(id))
      .drop(id)
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("id_b") === sizes(id))
      .drop(id)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /**
   * Cross-corpus contamination check (training-set decontamination): for
   * each probe document (e.g. an evaluation/test set), find corpus
   * documents sharing at least `minOverlap` distinct word k-shingles, with
   * containment = |common shingles| / |probe shingles| — the standard
   * n-gram-overlap decontamination metric.
   *
   * Scale shape: the probe side is small by construction (an eval set), so
   * AQE broadcasts its shingle set against the corpus shingle stream — no
   * corpus self-join, one groupBy on (corpus id, probe id). Corpus shingles
   * with document frequency above `maxShingleDf` are dropped before the
   * join (exact cutoff, same as `ngramJaccardPairs`): stop-shingles appear
   * in nearly every document and would otherwise multiply the join fanout
   * while signalling nothing — real decontamination additionally uses long
   * shingles (k ≥ 8), which are rare by nature.
   *
   * Returns (corpus id, probe_id, n_common, n_probe_sh, containment).
   */
  def containmentPairs(
      corpus: DataFrame, probe: DataFrame, id: String, text: String,
      k: Int = 8, minOverlap: Long = 1, maxShingleDf: Long = Long.MaxValue): DataFrame = {
    // corpus-side shingle explosion, same sizing rule as ngramJaccardPairs
    graft.core.ShuffleSizing.ensureFor(corpus, expansionFactor = 8.0)
    val cs0 = wordShingles(corpus, id, text, k)
    val cs =
      if (maxShingleDf == Long.MaxValue) cs0
      else {
        val tracked = graft.core.Caches.track(cs0)
        val rare = tracked.groupBy("shingle")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxShingleDf)
          .select("shingle")
        tracked.join(rare, "shingle")
      }
    val ps = wordShingles(probe, id, text, k).withColumnRenamed(id, "probe_id")
    // probe shingle count BEFORE the df cutoff: containment is relative to
    // the probe document itself, not to what survived corpus filtering
    val pSizes = ps.groupBy("probe_id").agg(count(lit(1)).as("n_probe_sh"))
    cs.join(ps, "shingle")
      .groupBy(col(id), col("probe_id")).agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
      .join(pSizes, "probe_id")
      .withColumn("containment",
        col("n_common").cast("double") / col("n_probe_sh").cast("double"))
      .select(col(id), col("probe_id"), col("n_common"), col("n_probe_sh"),
        col("containment"))
  }

  /**
   * Apply decontamination: drop from `corpus` every document whose n-gram
   * containment against ANY probe document reaches `minContainment` (with
   * at least `minOverlap` shared shingles) — the removal counterpart of
   * [[containmentPairs]]' detector, the way the training-set build applies
   * the verdict the curation report shows. The flagged id set is
   * |contaminated docs|-sized (small by construction — an eval set only
   * touches so much of a corpus), so the anti-join broadcasts and the
   * corpus is never shuffled.
   */
  def decontaminate(
      corpus: DataFrame, probe: DataFrame, id: String, text: String,
      k: Int = 8, minOverlap: Long = 1, minContainment: Double = 0.8,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    require(minContainment >= 0.0 && minContainment <= 1.0,
      s"minContainment must be in [0, 1], got $minContainment")
    val flagged = containmentPairs(corpus, probe, id, text, k, minOverlap,
        maxShingleDf)
      .filter(col("containment") >= minContainment)
      .select(col(id)).distinct()
    corpus.join(broadcast(flagged), Seq(id), "left_anti")
  }

  /**
   * [[decontaminate]] with EVIDENCE — the ingest surfaces' SHARED
   * contamination gate ([[graft.reports.IngestPipeline]] step 0c and the
   * streaming sinks use exactly this, so the two surfaces cannot drift —
   * the `BloomIndex.exactGate` discipline). Returns `(survivors, flagged)`
   * where `flagged` is ONE evidence row per dropped doc, `(id, probe_id)`
   * — the matched eval doc with the highest containment, ties to the
   * smallest probe id, so replays are deterministic. `flagged` is
   * |contaminated|-sized (an eval set only touches so much of a batch) and
   * pinned — it has two consumers (the anti-join and the caller's drop
   * ledger); survivors pin with MEASURED statistics so the estimate
   * feeding the rest of the night is honest.
   */
  def contaminationGate(
      batch: DataFrame, evalSet: DataFrame, id: String, text: String,
      k: Int = 8, minOverlap: Long = 1, minContainment: Double = 0.8,
      maxShingleDf: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    require(minContainment >= 0.0 && minContainment <= 1.0,
      s"minContainment must be in [0, 1], got $minContainment — a " +
        "percent-style value would silently flag NOTHING and let eval " +
        "data leak through the gate")
    // null ids fail the job loudly: a flagged null-id doc would BOTH
    // ledger as contaminated AND survive the anti-join below (null never
    // matches) — see Guards.requireIds
    val checked = Guards.requireIds(batch, id, "Dedup.contaminationGate")
    val pairs = containmentPairs(checked, evalSet, id, text, k, minOverlap,
        maxShingleDf)
      .filter(col("containment") >= minContainment)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id))
      .orderBy(col("containment").desc, col("probe_id").asc)
    val flagged = pairs
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(id), col("probe_id"))
      .localCheckpoint(true)
    val survivors = org.apache.spark.sql.graft.ColumnBridge
      .pinnedWithMeasuredStats(checked.join(
        broadcast(flagged.select(col(id))), Seq(id), "left_anti"))
    (survivors, flagged)
  }

  /**
   * Resolve candidate pairs into duplicate CLUSTERS: connected components
   * by iterative min-label propagation, so each document maps to the
   * smallest id reachable through the pair graph (= the canonical doc of
   * its cluster). Pairs alone don't dedupe — transitive groups do.
   *
   * Driver-controlled loop of join+aggregate rounds; iterations are bounded
   * by the cluster graph's diameter (near-dup clusters are shallow — chains
   * longer than ~20 hops indicate a threshold problem, not a bigger graph).
   * Each round is one shuffle; previous rounds' caches are released eagerly.
   * Only ids that appear in at least one pair are returned.
   */
  def dupClusters(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 25, driverPairLimit: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    val p = pairs.select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .persist()
    val nPairs = p.count()

    if (nPairs <= driverPairLimit) {
      // candidate-pair sets are ≪ corpus by construction (bounded LSH
      // buckets / df cutoffs); below the limit an exact driver union-find
      // beats dozens of distributed rounds by orders of magnitude
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      p.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val out = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      p.unpersist()
      return out.toDF("id", "cluster")
    }

    // large-graph path: neighbor-min propagation + pointer doubling
    // (label ← label of label), converging in O(log diameter) rounds
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    // localCheckpoint (not persist) each round: the loop builds plans that
    // reference the previous labels several times, so without lineage
    // truncation the LOGICAL plan grows exponentially with iterations —
    // analysis/plan-stringification blows up long before execution does
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nlabel"))
      val stepped = labels.alias("l")
        .join(neighborMin, col("l.id") === neighborMin("a"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("nlabel"), col("l.label"))).as("label"))
      // pointer doubling: follow the label one more hop
      val updated = stepped.alias("x")
        .join(labels.alias("y"), col("x.label") === col("y.id"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("y.label"), col("x.label"))).as("label"))
        .localCheckpoint(true)
      changed = updated.alias("u")
        .join(labels.alias("o"), col("u.id") === col("o.id"))
        .filter(col("u.label") =!= col("o.label"))
        .limit(1).count() > 0
      labels = updated
      iter += 1
    }
    edges.unpersist(); p.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /**
   * Embedding-cosine near-duplicates: candidates from banded multi-probe
   * sign-LSH (band `b` reads sign bits of dimensions
   * [b*signBits, (b+1)*signBits) — `bands` independent hash families),
   * verified with exact-quantized cosine.
   *
   * Pairs are expanded *inside* each (band, bucket) group — one groupBy
   * shuffle, no bucket self-join — and buckets larger than `maxBucket` are
   * dropped, the same capped group-and-expand shape as `minhashLshPairs`:
   * with only 2^signBits distinct buckets per band, an uncapped bucket join
   * has |corpus|²/2^signBits candidate fanout, quadratic at corpus scale
   * (and worse under skewed sign patterns, which correlated leading
   * dimensions make common). Multiple bands keep recall up under the cap:
   * a pair lost to one band's degenerate bucket can still surface through
   * another band's slice. Verification joins the (bounded) candidate pairs
   * back to the quantized vectors — two hash joins on id whose build side
   * is the capped pair set, never corpus × corpus.
   */
  /** (id, band, bucket) band-membership rows for the embedding sign-LSH —
    * the shared upstream of `embeddingNearDupPairs` and
    * `embeddingBucketStats` (see `lshBanded` for the sharing rationale). */
  def embeddingBanded(
      df: DataFrame, id: String, vec: String,
      signBits: Int = 8, bands: Int = 1): DataFrame = {
    // banding multiplies rows by `bands` and the verify joins re-shuffle
    // the quantized vectors twice — measured ~78× the on-disk corpus at 5M
    // docs (50 GB shuffle, 172 GB spill at 128 partitions); size the
    // initial partition count accordingly (see lshBanded)
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 16.0 * bands)
    df.select(col(id), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          Similarity.signBucket(col(vec), signBits, b * signBits).as("bucket"))
      }: _*)).as("bb"))
      .select(col(id), col("bb.band"), col("bb.bucket"))
  }

  /** Cosine-verify a bounded candidate pair set: two id-equi joins fetch
    * the quantized vectors (build side = the capped pair set, never
    * corpus × corpus), then the exact quantized cosine filters. */
  private def verifyPairs(
      df: DataFrame, id: String, vec: String,
      pairs: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.Vectors
    // quantize + self-dot once per row; re-read twice by the verify joins
    // (re-scanning the source beats persisting a corpus-sized frame)
    val v = df.select(col(id).as("__vid"), Vectors.quantize(col(vec)).as("__qv"))
      .withColumn("__n", Vectors.dotQ(col("__qv"), col("__qv")))
    pairs
      .join(v.select(col("__vid"), col("__qv").as("__qa"), col("__n").as("__na")),
        col("id_a") === col("__vid")).drop("__vid")
      .join(v.select(col("__vid"), col("__qv").as("__qb"), col("__n").as("__nb")),
        col("id_b") === col("__vid")).drop("__vid")
      .withColumn("cosine",
        Vectors.cosineQ(col("__qa"), col("__qb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  def embeddingNearDupPairs(
      df: DataFrame, id: String, vec: String,
      threshold: Double = 0.95, signBits: Int = 8,
      bands: Int = 1, maxBucket: Int = Int.MaxValue,
      strict: Boolean = false): DataFrame =
    verifyPairs(df, id, vec,
      pairsFromBanded(embeddingBanded(df, id, vec, signBits, bands), id,
        maxBucket, caller = "embeddingNearDupPairs", strict = strict),
      threshold)

  /**
   * Per-band bucket-size histogram for the embedding sign-LSH — the audit
   * companion of `embeddingNearDupPairs`'s `maxBucket`, as `lshBucketStats`
   * is for `minhashLshPairs`.
   */
  def embeddingBucketStats(
      df: DataFrame, id: String, vec: String,
      signBits: Int = 8, bands: Int = 1): DataFrame =
    bucketStatsFromBanded(embeddingBanded(df, id, vec, signBits, bands))

  /**
   * Incremental dedup probe: candidate pairs between a NEW BATCH and an
   * EXISTING CORPUS, from their banded (id, band, bucket) frames — the
   * 100 TB nightly-ingest shape (the reference's loads dedupe each
   * incremental slice against the standing mart, never reprocessing it,
   * ref: docs/KIMBALL_CDC_DATA_DESIGN.md:289-296). The corpus side is an
   * ALREADY-BANDED index (`lshBanded` / `embeddingBanded` output, persisted
   * as a table between loads), so per-ingest hashing cost is O(batch): the
   * corpus is scanned once and never re-shingled, re-hashed, or
   * self-joined.
   *
   * Scale shape: the batch's distinct (band, bucket) set is broadcast as a
   * semi-join filter over the corpus index, so only corpus rows in buckets
   * the batch actually touches survive to the (small) size-count shuffle
   * and the pair join — corpus rows in untouched buckets are filtered at
   * the scan. With the index saved partitioned by `band`, partition
   * pruning additionally skips whole bands when probing a band subset.
   *
   * EXACT equivalence to the batch-vs-corpus cross subset of
   * `pairsFromBanded(corpus ∪ batch)`: the cap counts each bucket's
   * COMBINED membership (corpus + batch rows), so a bucket is dropped here
   * iff the full recompute would drop it (spec-proven). Returns
   * (id_a, id_b) = (min, max) of each cross pair, distinct; intra-batch
   * duplicates are `pairsFromBanded(batchBanded, ...)` — a batch-sized job
   * the caller runs alongside.
   */
  def probeBandedPairs(
      corpusBanded: DataFrame, batchBanded: DataFrame, id: String,
      maxBucket: Int = Int.MaxValue, strict: Boolean = false): DataFrame = {
    if (maxBucket == Int.MaxValue)
      graft.core.Warn("probeBandedPairs: uncapped bucket expansion — pair " +
        "fanout is quadratic in the largest probed bucket; at scale pass " +
        "maxBucket (engine queries use LshMaxBucket=200)")
    val batchKeys = batchBanded.select(col("band"), col("bucket")).distinct()
    // broadcast hint, not AQE choice: the batch bucket set is small BY
    // CONSTRUCTION (an ingest slice), and the semi-join must not ever
    // degrade to shuffling the corpus index on (band, bucket).
    // Caches-tracked persist: the pruned frame feeds BOTH the size count
    // and the pair join — uncached, each consumer re-reads the full corpus
    // index (measured 2× index bytes per probe at the 5M tier). Its size
    // is the corpus membership of the batch's TOUCHED buckets — ≪ corpus
    // for an ingest slice, and MEMORY_AND_DISK spills rather than OOMs if
    // the batch probes a degenerate bucket (which the cap then drops).
    val pruned = graft.core.Caches.track(
      corpusBanded.join(broadcast(batchKeys), Seq("band", "bucket"),
        "left_semi"))
    // combined bucket size = pruned-corpus + batch membership — the SAME
    // count the full recompute's cap sees (untouched-bucket corpus rows
    // can't change counts of buckets the batch is in). LshGuard taps the
    // combined sizes: saturation on the probe path means the standing
    // index's bucket space is exhausted and every later ingest degrades.
    val sizes = graft.core.LshGuard.instrument(
      pruned.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__nc"))
        .join(batchBanded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__nb")), Seq("band", "bucket"))
        .withColumn("__sz", col("__nc") + col("__nb")),
      "__sz", maxBucket, "probeBandedPairs", strict)
    val okBuckets = sizes.filter(col("__sz") <= maxBucket)
      .select(col("band"), col("bucket"))
    pruned.join(broadcast(okBuckets), Seq("band", "bucket"))
      .withColumnRenamed(id, "__cid")
      .join(batchBanded.withColumnRenamed(id, "__bid"), Seq("band", "bucket"))
      .filter(col("__cid") =!= col("__bid"))
      .select(least(col("__cid"), col("__bid")).as("id_a"),
        greatest(col("__cid"), col("__bid")).as("id_b"))
      .distinct()
  }

  /** MinHash probe from raw documents on both sides — builds the batch's
    * banded frame and probes it against the corpus's. The persisted-index
    * path (hash the corpus ONCE, probe every later batch against the saved
    * frame) calls [[probeBandedPairs]] directly with the saved index. */
  def minhashProbePairs(
      corpus: DataFrame, batch: DataFrame, id: String, text: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue, portable: Boolean = false,
      strict: Boolean = false): DataFrame =
    probeBandedPairs(
      lshBanded(corpus, id, text, shingleK, numHashes, bands, portable),
      lshBanded(batch, id, text, shingleK, numHashes, bands, portable),
      id, maxBucket, strict)

  // ------------------------------------------------------------------
  // Exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
  // Makes Language Models Better", arXiv:2107.06499 §4.1): find every
  // k-token span that occurs more than once ANYWHERE in the corpus and cut
  // the repeats out of the documents, keeping one occurrence. The paper
  // builds a corpus-wide suffix array; the Spark-first equivalent is a
  // sliding-window hash table — one row per token position, one hash
  // shuffle — which trades the suffix array's global sort for a groupBy
  // and finds the same ≥k-token repeats (a repeat of length L ≥ k is
  // exactly a run of L−k+1 duplicated k-windows, so cutting all duplicated
  // windows removes the whole repeated region).

  /** k-token sliding windows of every document — one row per position
    * `(__id, __pos, __gram)`, `__pos` 0-based over [[Vocab.tokensOf]]
    * whitespace tokens. Narrow (projection + posexplode, no shuffle); the
    * token array sits behind a projection boundary so the per-window
    * `slice` re-reads an attribute, not the `split` expression
    * (pairCounts' measured O(tokens²)-splits pitfall). */
  private[operators] def tokenWindows(df: DataFrame, id: String,
      text: String, k: Int, lowercase: Boolean): DataFrame = {
    require(k >= 2, s"window size k must be >= 2, got $k")
    val toks = df.select(col(id).as("__id"),
      Vocab.tokensOf(col(text), lowercase).as("__toks"))
    val wins = when(size(col("__toks")) >= k,
      transform(sequence(lit(0), size(col("__toks")) - k),
        i => concat_ws(" ", slice(col("__toks"), i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
    toks.select(col("__id"), posexplode(wins).as(Seq("__pos", "__gram")))
  }

  /**
   * Corpus-duplicated k-token grams `(gram, n, n_docs)` — every k-token
   * span occurring `minCount`+ times, with its occurrence and document
   * counts. The audit/report face of exact-substring dedup (and the
   * oracle-mirrored one: gram strings, not hashes, key the aggregation, so
   * any ANSI engine reproduces it bit-for-bit).
   *
   * Scale shape: unlike [[Vocab.wordCounts]], partial aggregation cannot
   * collapse this stream — at useful k (the paper uses 50 tokens) almost
   * every window is distinct, so the aggregation's hash maps hold nearly
   * every gram and their sort-based overflow path effectively SORTS the
   * window stream. That is the operator's inherent cost restated — the
   * paper's suffix array is a global sort of the same stream — and the
   * DECLARATIVE form below is the measured-best plan for paying it:
   * three structural rewrites all lost at 1M docs (SCALE.md round 15 —
   * a hash-prefilter two-pass added a string shuffle that cost more than
   * it saved, 1.5×; a manual (gram, doc) → gram two-level agg doubled
   * the string shuffles, 1.9×; exchange-first `repartition(gram)` built
   * four post-shuffle agg maps in one stage, 1.2×). Catalyst's
   * single-distinct rewrite is the right physical shape; `HAVING n >=
   * minCount` prunes after the shuffle by necessity — a count is only
   * known globally.
   */
  def duplicateGrams(df: DataFrame, id: String, text: String, k: Int = 8,
      minCount: Long = 2L, lowercase: Boolean = true): DataFrame = {
    require(minCount >= 2,
      s"minCount < 2 would report every window as duplicated, got $minCount")
    // the near-unique key space makes REDUCE-side state the binding
    // constraint: at 32 partitions the 5M-doc tier re-merged spill runs
    // into 235 GB written; input-derived initial partitions bound
    // per-partition agg state instead (measured factor: gram strings
    // shuffle ≈ 8× the corpus parquet bytes)
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 8.0)
    tokenWindows(df, id, text, k, lowercase)
      .groupBy(col("__gram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("__id")).as("n_docs"))
      .filter(col("n") >= minCount)
      .select(col("__gram").as("gram"), col("n"), col("n_docs"))
  }

  /**
   * Exact-substring dedup: cut every duplicated k-token span out of the
   * corpus, keeping (`keepOne`, the default) exactly one occurrence — the
   * deterministic winner is the smallest `(id, pos)`. Adds `out` (the
   * rebuilt text, whitespace normalized to single spaces — only documents
   * that actually lost a span are rewritten; untouched documents keep
   * their text verbatim) and `removed_tokens`.
   *
   * Matching is case-sensitive by default (the paper operates on raw
   * bytes); `lowercase = true` matches case-insensitively while the
   * rebuild always keeps the original tokens. Like the paper's cutter,
   * adjacent/overlapping duplicated windows merge into one removed region,
   * and a repeat longer than k tokens is removed whole (its every window
   * duplicates). Also like the paper: when the winners of a long repeat's
   * windows land in different documents, the copies can shred — each doc
   * keeps only the fragments it won (documented there as rare and benign
   * for training data).
   *
   * Scale shape: grams hash to 64 bits BEFORE the shuffle, so the count
   * aggregation moves 20-byte rows, not strings (a 64-bit collision
   * falsely marks a window duplicated; at 10^12 windows that is ~10^4
   * windows corpus-wide — noise against what dedup removes, and the
   * string-keyed [[duplicateGrams]] is the exact audit when it matters).
   * The count aggregation stays PRIMITIVE: the obvious one-pass keeper,
   * `min(struct(id, pos))`, plans as ObjectHashAggregate, whose tiny
   * sort-fallback threshold (128 keys) turns the whole near-unique-key
   * aggregation row-at-a-time sort-based — measured 81.8 s at 1M docs
   * versus 50–63 s for the primitive shapes (the remaining spill is the
   * inherent near-unique-key sort, see [[duplicateGrams]]). By default
   * the keeper PACKS `(id, pos)` into one long riding the count
   * aggregation as a primitive min — two window passes total; ids
   * outside the packable domain fail fast at the offending row, and
   * `packedKeeper = false` is the escape hatch (keeper = min id, then
   * min pos among its windows via a third, duplicate-windows-sized
   * pass — both orderings ≡ the struct's lexicographic min). NOTHING
   * here is cached: the corpus-sized window frame obviously fits no
   * cache tier, and the dup-windows frame — "small" in the common case —
   * is corpus-PROPORTIONAL whenever duplication is heavy: caching it
   * OOM'd the 5M-doc tier (3% full-dup docs → 34M rows of columnar
   * cache build buffers), while recomputing costs one window projection
   * per consumer. Per-doc cut lists are
   * bounded by the doc's own window count (collect_set after the dup
   * join), and the rebuild is a per-row higher-order filter costing
   * O(tokens × cut windows) — a measured tradeoff: the interval-merge
   * form that bounds the pathological fully-duplicated-long-doc case ran
   * ~2× slower END-TO-END at realistic cut densities and was reverted
   * (see the inline note; chunk pathological documents upstream); no
   * driver state anywhere. A boilerplate
   * gram duplicated across the whole corpus skews the dup-hash join;
   * AQE's skew split handles it (the dup side carries only counts, never
   * pair expansion).
   */
  def removeDuplicateSpans(df: DataFrame, id: String, text: String,
      k: Int = 8, minCount: Long = 2L, keepOne: Boolean = true,
      lowercase: Boolean = false, out: String = "clean_text",
      packedKeeper: Boolean = true): DataFrame = {
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 8.0) // as duplicateGrams
    val base = tokenWindows(df, id, text, k, lowercase)
    val cutKept =
      if (keepOne && packedKeeper) {
        // packed keeper: (id, pos) folds into ONE long (id·2^24 + pos,
        // numerically ≡ the lexicographic min while pos < 2^24 and
        // 0 <= id < 2^39), so the keeper is a primitive min riding the
        // count aggregation — the window stream is computed exactly
        // twice (count, cut join) with no winner pass and no cache.
        // Out-of-domain rows fail fast AT the offending row (raise_error
        // costs nothing until it fires); content-hash-style ids should
        // pass packedKeeper = false instead, taking the three-pass path.
        val packable = col("__id") >= 0 && col("__id") < lit(1L << 39) &&
          col("__pos") < lit(1 << 24)
        val w = base.select(col("__id"), col("__pos"),
          xxhash64(col("__gram")).as("__wh"),
          when(packable, shiftleft(col("__id"), 24) + col("__pos"))
            .otherwise(raise_error(format_string(
              "removeDuplicateSpans: packed keeper needs 0 <= id < 2^39 " +
                "and pos < 2^24, got id=%s pos=%s — pass packedKeeper = " +
                "false for ids outside the domain",
              col("__id"), col("__pos")))).as("__pk"))
        val dup = w.groupBy(col("__wh"))
          .agg(count(lit(1)).as("__n"), min(col("__pk")).as("__minPk"))
          .filter(col("__n") >= minCount)
          .select(col("__wh"), col("__minPk"))
        w.join(dup, Seq("__wh")).filter(col("__pk") =!= col("__minPk"))
      } else {
        val w = base.select(col("__id"), col("__pos"),
          xxhash64(col("__gram")).as("__wh"))
        val dup = w.groupBy(col("__wh"))
          .agg(count(lit(1)).as("__n"), min(col("__id")).as("__minId"))
          .filter(col("__n") >= minCount)
          .select(col("__wh"), col("__minId"))
        val dupW = w.join(dup, Seq("__wh"))
        if (keepOne) {
          val winners = dupW.filter(col("__id") === col("__minId"))
            .groupBy(col("__wh")).agg(min(col("__pos")).as("__winPos"))
          dupW.join(winners, Seq("__wh"))
            .filter(!(col("__id") === col("__minId") &&
              col("__pos") === col("__winPos")))
        } else dupW
      }
    val cuts = cutKept.groupBy(col("__id"))
      .agg(sort_array(collect_set(col("__pos"))).as("__cuts"))
    val t = Vocab.tokensOf(col(text), lowercase = false)
    // plain per-window exists, deliberately: an interval-merge rewrite
    // (aggregate the sorted cuts into disjoint [s, e) spans, then scan
    // intervals instead of windows) would make the rebuild linear for a
    // fully-duplicated long doc — but MEASURED ~2× slower end-to-end at
    // 1M docs (140-144 s vs this form's 50-79 s across repeat runs; the
    // interpreted array-building aggregate lambda costs more than the
    // scans it saves at realistic cut densities), so it was reverted. The residual hazard is real and
    // documented: a single ~10^5-token doc that is ENTIRELY duplicated
    // pays O(tokens × windows) in one task — chunk pathological documents
    // upstream ([[Chunking]]) rather than carrying the 2.9× everywhere.
    val kept = filter(t, (_, i) =>
      !exists(col("__cuts"), p => p <= i && i < p + lit(k)))
    df.join(cuts, df(id) === cuts("__id"), "left")
      .withColumn(out,
        when(col("__cuts").isNull, col(text)).otherwise(concat_ws(" ", kept)))
      .withColumn("removed_tokens",
        when(col("__cuts").isNull, lit(0L))
          .otherwise((size(t) - size(kept)).cast("long")))
      .drop("__id", "__cuts")
  }

  // ------------------------------------------------------------------
  // Semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
  // at web-scale through semantic deduplication", arXiv:2303.09540):
  // cluster the embedding space with k-means, then call two documents
  // semantic duplicates when their embedding cosine clears a threshold
  // WITHIN a cluster. The cluster pass bounds candidate generation
  // exactly like an LSH band bucket, but with DATA-ADAPTIVE regions
  // instead of random hyperplanes ([[embeddingNearDupPairs]]' sign-LSH):
  // the paper's observation is that near-identical embeddings
  // concentrate inside k-means cells, so Σ|cell|² pairs replace n².

  /**
   * Within-cluster semantic-duplicate pairs `(id_a, id_b, cosine)`.
   *
   * Scale shape, all existing machinery: centroids come from
   * [[Similarity.kmeansCentroids]] (or pass `centroids` precomputed —
   * the paper clusters once and reuses); cell assignment is the
   * broadcast argmax (zero shuffle, one projection); pair generation is
   * [[pairsFromBanded]] with cells as buckets (groupBy + in-group
   * expansion, `maxBucket`-capped, warns uncapped — a mega-cell is this
   * operator's degenerate bucket, and `numCells` is the first lever
   * against it); every candidate is verified with the exact quantized
   * cosine before the threshold applies, so a loose clustering can only
   * lose pairs across cell boundaries (the paper accepts exactly this
   * approximation), never fabricate one.
   */
  def semanticDupPairs(
      df: DataFrame, id: String, vec: String,
      threshold: Double = 0.95, numCells: Int = 8, iterations: Int = 3,
      centroids: Option[DataFrame] = None,
      maxBucket: Int = Int.MaxValue, strict: Boolean = false): DataFrame = {
    graft.core.ShuffleSizing.ensureFor(df, expansionFactor = 8.0)
    val cents = centroids.getOrElse(
      Similarity.kmeansCentroids(df, id, vec, numCells, iterations))
    val centArr = Similarity.centroidArray(cents)
    val banded = Similarity.assignCells(df, id, vec, id, centArr)
      .select(col(id), lit(0).as("band"), col("cell").cast("string").as("bucket"))
    verifyPairs(df, id, vec,
      pairsFromBanded(banded, id, maxBucket,
        caller = "semanticDupPairs", strict = strict),
      threshold)
  }

  /**
   * SemDeDup applied: the corpus minus non-canonical semantic duplicates.
   * Pairs resolve to connected components ([[dupClusters]] — transitive:
   * a ≈ b ≈ c collapses to one survivor even when cos(a, c) dips under
   * the threshold) and every component keeps its min id; the drop is a
   * broadcast-friendly anti-join on the (pairs-sized, ≪ corpus) drop set.
   */
  def semanticDedup(
      df: DataFrame, id: String, vec: String,
      threshold: Double = 0.95, numCells: Int = 8, iterations: Int = 3,
      centroids: Option[DataFrame] = None,
      maxBucket: Int = Int.MaxValue, strict: Boolean = false): DataFrame = {
    val pairs = semanticDupPairs(df, id, vec, threshold, numCells,
      iterations, centroids, maxBucket, strict)
    val drop = dupClusters(pairs)
      .filter(col("id") =!= col("cluster")).select(col("id").as("__drop"))
    df.join(drop, df(id) === col("__drop"), "left_anti")
  }

  /**
   * Embedding near-dup pairs + audit histogram from ONE banded frame
   * (Caches-tracked persist, as `minhashLshWithStats`): the audit costs one
   * extra aggregation instead of recomputing bucketing, the q30+q59 profile.
   */
  def embeddingNearDupWithStats(
      df: DataFrame, id: String, vec: String,
      threshold: Double = 0.95, signBits: Int = 8,
      bands: Int = 1, maxBucket: Int = Int.MaxValue,
      strict: Boolean = false): (DataFrame, DataFrame) = {
    val banded = graft.core.Caches.track(
      embeddingBanded(df, id, vec, signBits, bands))
    (verifyPairs(df, id, vec,
        pairsFromBanded(banded, id, maxBucket,
          caller = "embeddingNearDupWithStats", strict = strict),
        threshold),
      bucketStatsFromBanded(banded))
  }
}
