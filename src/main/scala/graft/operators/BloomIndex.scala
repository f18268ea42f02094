package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Sharded, mergeable Bloom membership index — the EXACT-duplicate gate a
 * re-crawl-heavy ingest needs at 100 TB.
 *
 * The standing near-dup machinery ([[BandIndex]] + MinHash) catches exact
 * duplicates too, but it pays the full fingerprint cost to do it: shingling,
 * `numHashes` permutations, and a banded bucket join — per batch document.
 * A nightly crawl's most common duplicate is the BYTE-IDENTICAL
 * re-submission (re-crawls, retries, mirrored pages), and those need only a
 * membership test on a content hash. This index answers that test with:
 *
 *   - `blooms/`  — one Bloom filter per hash SHARD, stored as parquet rows
 *     `(shard int, bloom binary)`. Appends add GENERATION rows per shard
 *     (a bloom built from just the new keys); a probe ORs a key against
 *     every generation of its shard, so append is O(batch) with no
 *     read-modify-write, and re-appending the same batch is a semantic
 *     no-op (bloom insertion is idempotent — the bits are already set).
 *     [[compact]] folds generations back to one row per shard.
 *   - `keys/shard=<n>/` — the exact key LEDGER `(key string, id long)`,
 *     shard-partitioned. The bloom alone cannot be exact (false positives
 *     are inherent), so a probe VERIFIES its candidates against the ledger
 *     — and reads only the candidate shards' directories (partition
 *     pruning). The bloom's guarantee is the other direction: a MISS is
 *     definite, so the non-candidate majority of a mostly-new batch costs
 *     zero ledger I/O.
 *
 * Probe result is therefore EXACT (`is_dup` true iff the key is present),
 * while the expected cost per batch key is one xxhash64 + a few bit reads;
 * only true dups and the fpp-sized false-positive tail touch storage.
 *
 * Scale shape (10B standing keys, 1024 shards, fpp ~1%): blooms total
 * ~12 GB as DISTRIBUTED rows (never on the driver), keys ledger ~200 GB —
 * both orders of magnitude under the corpus text, and a probe moves only
 * the batch's `(key, hash)` pairs plus the touched shards' bloom rows
 * through one exchange. Build shuffles raw 16-byte key rows INTO the
 * shards rather than partially aggregating blooms on the map side — with
 * bloom-sized buffers, map-side combine would ship
 * `tasks × shards × bloomBytes` (terabytes at 1000 tasks), while the raw
 * rows are `keys × 16 B`; "functions, not UDFs" loses to arithmetic here,
 * which is why build/probe use the typed `groupByKey`/`cogroup` API — the
 * bloom is opaque binary state deserialized once per shard, not per row.
 *
 * Reference behavior this extends: the reference dedupes each incremental
 * load against the standing mart before landing it
 * (ref: /root/reference/docs/KIMBALL_CDC_DATA_DESIGN.md:289-296); this is
 * the membership-test form of that gate for content-identical rows.
 *
 * Retraction: [[removeIds]] tombstones by numeric id (the engine's id
 * contract); the probe's verify step subtracts tombstoned ledger rows, so
 * retracted content stops matching IMMEDIATELY. [[vacuum]] rewrites only
 * the touched shard directories. Bloom BITS of removed keys persist until
 * [[rebuildBlooms]] — harmless for correctness (the ledger decides), they
 * only keep the false-positive tail a little wider than fresh.
 */
object BloomIndex {

  val ShardCol = "shard"
  val KeyCol = "key"
  val IdCol = "id"

  private val BloomsDir = "blooms"
  private val KeysDir = "keys"

  /** Build geometry, persisted in the index marker. `bitsPerShard` and
    * `itemsPerShard` must be identical across every generation of a shard
    * or the filters cannot merge (hash-function count derives from them),
    * so [[append]]/[[probe]] read them back from the marker rather than
    * trusting the caller. */
  final case class Geometry(shards: Int, bitsPerShard: Long, itemsPerShard: Long) {
    require(shards > 0, "shards must be positive")
    require(bitsPerShard > 0, "bitsPerShard must be positive")
    require(itemsPerShard > 0, "itemsPerShard must be positive")
  }

  private def bloomsPath(path: String) = s"$path/$BloomsDir"
  private def keysPath(path: String) = s"$path/$KeysDir"

  /** Marker key: bloom generation rows per shard (upper bound — the number
    * of write passes since the last fold/rebuild). Maintained driver-side
    * so the nightly fold can be GATED without a Spark job; absent (an index
    * from before the counter existed) reads as "unknown → fold". */
  private val GenerationsKey = "generations"

  /** Marker key: ledger rows physically removed by [[vacuum]] since the
    * last [[rebuildBlooms]]/[[save]] — the exact numerator of the stale-bit
    * share ([[staleShare]]). Removed keys' bloom BITS persist until a
    * rebuild, so this is what widens the false-positive tail. */
  private val RemovedKey = "removedSinceRebuild"

  /** Marker key: standing ledger rows, maintained WITHOUT any counting
    * job — an accumulator rides the generation-build pass save/append/
    * rebuild already run (every key row flows through it), and vacuum
    * subtracts its removed count. The stale-share denominator; slight
    * over-count on task retries or replayed appends is fine for a health
    * ratio. Absent on a pre-counter index → staleShare falls back to one
    * metadata count and persists it. */
  private val LiveRowsKey = "ledgerRows"

  /** Read-update-write of the marker map (single-maintainer assumption,
    * like every other maintenance entry point). */
  private def updateMarker(spark: SparkSession, path: String)(
      f: Map[String, String] => Map[String, String]): Unit =
    IndexMeta.write(spark, path, f(IndexMeta.read(spark, path)))

  private def markerLong(spark: SparkSession, path: String, key: String)
      : Option[Long] =
    IndexMeta.read(spark, path).get(key).flatMap(v =>
      scala.util.Try(v.toLong).toOption)

  private def writeGeometry(spark: SparkSession, path: String, g: Geometry): Unit =
    IndexMeta.write(spark, path, Map(
      "layout" -> "bloom_v1",
      "shards" -> g.shards.toString,
      "bitsPerShard" -> g.bitsPerShard.toString,
      "itemsPerShard" -> g.itemsPerShard.toString,
      GenerationsKey -> "1",
      RemovedKey -> "0"))

  /** The recorded geometry; fails fast when the marker is absent or from a
    * different layout (probing with guessed geometry would hash keys into
    * the wrong shards and silently miss every standing duplicate). */
  def readGeometry(spark: SparkSession, path: String): Geometry = {
    val m = IndexMeta.read(spark, path)
    require(m.get("layout").contains("bloom_v1"),
      s"no bloom_v1 index marker at $path — build with BloomIndex.save " +
        "first (probing with guessed geometry would miss every duplicate)")
    Geometry(m("shards").toInt, m("bitsPerShard").toLong,
      m("itemsPerShard").toLong)
  }

  /** `(key, hash, shard)` projection — ONE xxhash64 per key drives both the
    * shard route and the bloom insert/lookup value. Inserting the 64-bit
    * hash (not the string) keeps bloom updates allocation-free; a 64-bit
    * collision between distinct keys at worst adds a false positive, which
    * the ledger verify absorbs. */
  private def keyed(df: DataFrame, keyCol: String, shards: Int): DataFrame =
    df.select(col(keyCol).cast("string").as(KeyCol))
      .withColumn("__h", xxhash64(col(KeyCol)))
      .withColumn(ShardCol, pmod(col("__h"), lit(shards.toLong)).cast("int"))

  /** [[keyed]] plus the ledger id column. */
  private def keyedWithId(df: DataFrame, keyCol: String, idCol: String,
      shards: Int): DataFrame =
    df.select(col(keyCol).cast("string").as(KeyCol),
        col(idCol).cast("long").as(IdCol))
      .withColumn("__h", xxhash64(col(KeyCol)))
      .withColumn(ShardCol, pmod(col("__h"), lit(shards.toLong)).cast("int"))

  /** One bloom generation per shard from `(key, hash, shard)` rows — a
    * single shuffle by shard, one filter alive per group at a time.
    * `rowTally` (when given) counts the key rows as they stream through —
    * the [[LiveRowsKey]] bookkeeping, free because this pass runs anyway. */
  private def buildGenerations(keyedDf: DataFrame, g: Geometry,
      rowTally: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = keyedDf.sparkSession
    import spark.implicits._
    val (items, bits) = (g.itemsPerShard, g.bitsPerShard)
    keyedDf.select(col(ShardCol), col("__h")).as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val bf = BloomFilter.create(items, bits)
        rows.foreach { r =>
          rowTally.foreach(_.add(1L))
          bf.putLong(r._2)
        }
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        (shard, out.toByteArray)
      }
      .toDF(ShardCol, "bloom")
  }

  /** Cluster ledger rows by (shard, key) range before a partitioned write —
    * the [[BandIndex]] write discipline: without it every task writes into
    * every shard directory (tasks × shards small files). */
  private def clusteredKeys(keyedDf: DataFrame): DataFrame =
    keyedDf.select(col(ShardCol), col(KeyCol), col(IdCol))
      .repartitionByRange(col(ShardCol), col(KeyCol))

  /** Create (or rebuild) the index at `path` from `df`'s `(keyCol, idCol)`
    * rows. Key rows should be distinct per (key, id); duplicates are
    * harmless for membership but waste ledger bytes. */
  def save(df: DataFrame, keyCol: String, idCol: String, path: String,
      shards: Int = 64, bitsPerShard: Long = 1L << 23,
      itemsPerShard: Long = (1L << 23) / 10): Unit = {
    val spark = df.sparkSession
    val g = Geometry(shards, bitsPerShard, itemsPerShard)
    val kb = keyedWithId(df, keyCol, idCol, g.shards)
    // marker BEFORE data (the Sketches appendNight discipline): a crash
    // mid-save leaves a marker-only or blooms-only state every later
    // entry point handles (probe treats the absent dirs as empty, the
    // nightly bootstrap's exists() check routes the re-run to append) —
    // marker-LAST instead left an unreadable index only a manual delete
    // could recover
    writeGeometry(spark, path, g)
    val tally = spark.sparkContext.longAccumulator("bloom_ledger_rows")
    buildGenerations(kb, g, Some(tally))
      .write.mode("overwrite").parquet(bloomsPath(path))
    clusteredKeys(kb)
      .write.mode("overwrite").partitionBy(ShardCol).parquet(keysPath(path))
    updateMarker(spark, path)(_.updated(LiveRowsKey, tally.value.toString))
  }

  /** Append a batch's `(key, id)` rows: one new bloom generation row per
    * touched shard, then the ledger rows. ORDER MATTERS for exactness:
    * blooms land FIRST, so a crash between the writes leaves keys that are
    * bloom-candidates with no ledger row — a false positive the verify
    * absorbs — never a ledger row the bloom doesn't know (a false NEGATIVE
    * that would wave a duplicate through). Re-running a crashed append is
    * safe: bloom bits are idempotent and duplicate ledger rows don't
    * change membership (same (key, id) pair — min(id) is unaffected). */
  def append(df: DataFrame, keyCol: String, idCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val g = readGeometry(spark, path)
    DirSwap.repair(spark, bloomsPath(path)) // crashed compact/rebuild swap
    val kb = keyedWithId(df, keyCol, idCol, g.shards)
    val tally = spark.sparkContext.longAccumulator("bloom_ledger_rows")
    buildGenerations(kb, g, Some(tally))
      .write.mode("append").parquet(bloomsPath(path))
    clusteredKeys(kb)
      .write.mode("append").partitionBy(ShardCol).parquet(keysPath(path))
    // the counters are PERF/health gates only (probe ORs every generation,
    // folded or not; the ledger decides correctness), so a crash between
    // the writes and this update merely defers one fold / skews a ratio —
    // never a correctness state
    updateMarker(spark, path)(m => m
      .updated(GenerationsKey, (m.get(GenerationsKey).flatMap(v =>
        scala.util.Try(v.toLong).toOption).getOrElse(0L) + 1L).toString)
      .updated(LiveRowsKey, (m.get(LiveRowsKey).flatMap(v =>
        scala.util.Try(v.toLong).toOption).getOrElse(0L)
        + tally.value).toString))
  }

  /** Exact membership of `batch`'s `keyCol` values against the standing
    * index: one row per DISTINCT batch key with `is_dup` (exact) and
    * `kept_id` (the smallest standing id holding that key, null when new).
    *
    * Plan shape: batch keys hash+shard → cogroup with the shard blooms
    * (each task deserializes its shards' generations once, streams its
    * keys through them) → candidates verify against the key ledger with
    * the read PRUNED to candidate shard directories, the candidate set
    * broadcast (batch-bounded by the ingest contract), and the ledger
    * never shuffled.
    *
    * `excludeIds` (one numeric column) removes those ids from the ledger
    * side before the verify — the replay-idempotence hook: a crashed
    * night's partial append must not drop the re-delivered batch's own
    * rows as duplicates of themselves. Exclusion happens at VERIFY, so it
    * also covers ids only present as bloom bits (they simply fail to
    * verify). */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: String, excludeIds: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val g = readGeometry(spark, path)
    val keys = keyed(batch.select(col(keyCol)).distinct(), keyCol, g.shards)

    // reader-funnel repair (the PqIndex discipline): a compact/rebuild
    // crash between its rename-aside and rename-in leaves no live blooms
    // dir and a marked stage — roll it forward here instead of tripping
    // the keys-without-blooms guard below (which would demand a manual
    // rebuild for a state repair can finish mechanically). Concurrency
    // caveat as DirSwap documents: reader repair shares the maintainer's
    // window on stores without atomic directory rename.
    DirSwap.repair(spark, bloomsPath(path))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBlooms = fs.exists(new org.apache.hadoop.fs.Path(bloomsPath(path)))
    val hasKeys = fs.exists(new org.apache.hadoop.fs.Path(keysPath(path)))
    // keys without blooms would make every bloom miss a FALSE NEGATIVE —
    // the one state this index must never serve reads from. The inverse
    // (blooms without keys — a crash between save/append's two writes)
    // is served below: candidates simply fail to verify.
    require(hasBlooms || !hasKeys,
      s"bloom index at $path has a key ledger but no bloom directory — " +
        "the membership test would silently pass duplicates; rebuild with " +
        "BloomIndex.save or rebuildBlooms")

    val result =
      if (!hasBlooms) keys.withColumn("kept_id", lit(null).cast("long"))
      else {
        val blooms = spark.read.parquet(bloomsPath(path))
          .select(col(ShardCol), col("bloom")).as[(Int, Array[Byte])]
        // candidates: keys whose shard's generations might contain them.
        // A shard with no bloom rows yields no candidates (nothing was
        // ever appended there).
        val cands = keys.select(col(KeyCol), col("__h"), col(ShardCol))
          .as[(String, Long, Int)]
          .groupByKey(_._3)
          .cogroup(blooms.groupByKey(_._1)) { (_, ks, bs) =>
            val gens = bs.map(b => BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(b._2))).toArray
            if (gens.isEmpty) Iterator.empty
            else ks.collect {
              case (key, h, shard) if gens.exists(_.mightContainLong(h)) =>
                (key, shard)
            }
          }
          .toDF(KeyCol, ShardCol)
          // bounded by the batch (distinct keys ≤ batch rows); pinned so
          // the shard-list collect and the verify join share one run
          .localCheckpoint(true)

        val candShards = cands.select(ShardCol).distinct()
          .collect().map(_.getInt(0))
        val kept =
          if (candShards.isEmpty || !hasKeys)
            keys.limit(0).select(col(KeyCol),
              lit(null).cast("long").as("kept_id"))
          else {
            val ledger0 = spark.read.parquet(keysPath(path))
              .filter(col(ShardCol)
                .isin(candShards.map(Integer.valueOf).toIndexedSeq: _*))
            val ledger1 = Tombstones.read(spark, path) match {
              case Some(ts) => ledger0.join(broadcast(ts),
                ledger0(IdCol) === ts(Tombstones.IdCol), "left_anti")
              case None => ledger0
            }
            val ledger = excludeIds match {
              case Some(ex) =>
                val exIds = ex.select(ex.columns.head)
                  .withColumnRenamed(ex.columns.head, "__ex_id")
                ledger1.join(broadcast(exIds),
                  ledger1(IdCol) === col("__ex_id").cast("long"), "left_anti")
              case None => ledger1
            }
            ledger.join(broadcast(cands.select(col(KeyCol))), Seq(KeyCol))
              .groupBy(col(KeyCol))
              .agg(min(col(IdCol)).as("kept_id"))
          }
        keys.join(kept, Seq(KeyCol), "left")
      }
    result.select(col(KeyCol).as(keyCol), col("kept_id"),
      col("kept_id").isNotNull.as("is_dup"))
  }

  /** [[exactGate]]'s output: the batch minus exact duplicates, plus the
    * two drop sets as `(id, kept_id)` evidence frames. */
  final case class GateResult(survivors: DataFrame,
      corpusDropped: DataFrame, intraDropped: DataFrame)

  /**
   * The ingest pipelines' EXACT-duplicate gate over this index — shared by
   * [[graft.reports.IngestPipeline.runNight]]'s step 0b and the streaming
   * sinks, so the nightly and streaming paths cannot drift.
   *
   * Scope: rows with a non-null `md5(textCol)` AND a non-null `idCol` (a
   * null text is never a duplicate of anything — SQL null semantics — and
   * a null id can't be ledgered or tombstoned); out-of-scope rows pass
   * through untouched. Intra-batch duplicates keep the SMALLEST id per
   * content hash (the same pair resolution the banded intra path applies);
   * corpus verdicts come from [[probe]] with `excludeIds` (the batch's own
   * ids — replay idempotence: a crashed run's partial append must not
   * self-drop the re-delivered batch). A missing index directory means
   * bootstrap: no corpus verdicts, intra dedup still applies.
   *
   * `survivors` is PINNED (eager localCheckpoint): it feeds the minhash
   * hashing, the survivor anti-join and the landing downstream — the
   * bounded-intermediate pin discipline (SCALE.md rounds 15/17/18).
   * Dropped frames are normalized to `(idCol, kept_id)`.
   */
  /** `needDrops = false` (callers that never read the dropped frames —
    * no drop ledger configured) skips the intermediate `joined` pin: the
    * survivor pin below still materializes the probe exactly once, and
    * the never-consumed drop frames stay lazy plans that cost nothing. */
  def exactGate(batch: DataFrame, idCol: String, textCol: String,
      path: String, excludeIds: DataFrame,
      needDrops: Boolean = true): GateResult = {
    val spark = batch.sparkSession
    val keyCol = "__exact_key"
    val cols = batch.columns.toSeq
    val withKey = batch.withColumn(keyCol,
      md5(col(textCol).cast("binary")))
    val inScope = withKey.filter(
      col(keyCol).isNotNull && col(idCol).isNotNull)
    val outScope = withKey.filter(
      col(keyCol).isNull || col(idCol).isNull)
    val keep = inScope.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("__keep_id"))
    val intraKept = inScope.join(keep, Seq(keyCol))
    val intraSurvivors = intraKept.filter(col(idCol) === col("__keep_id"))
    val intraDropped = intraKept.filter(col(idCol) =!= col("__keep_id"))
      .select(col(idCol), col("__keep_id").as("kept_id"))
    val p = new org.apache.hadoop.fs.Path(path)
    val bloomExists =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    val (corpusSurvivors, corpusDropped) =
      if (!bloomExists)
        (intraSurvivors,
          intraSurvivors.limit(0)
            .select(col(idCol), lit(null).cast("long").as("kept_id")))
      else {
        val verdict = probe(spark, path,
          intraSurvivors.select(col(keyCol)), keyCol,
          excludeIds = Some(excludeIds))
        // pinned: the survivor pin below AND a drop-ledger consumer both
        // read this join — without the pin the candidate-shard ledger
        // scan + broadcast verify would execute once per consumer.
        // MEASURED stats: the plain checkpoint inherits the join-product
        // estimate (~189 TB for a 2 MB batch, measured round 19), which
        // pinned the session's ShuffleSizing at its 4096-partition max.
        // With needDrops=false there IS only one consumer (the survivor
        // pin) — the intermediate pin would be a pure extra action
        val joined0 = intraSurvivors.join(verdict, Seq(keyCol))
        val joined =
          if (needDrops) org.apache.spark.sql.graft.ColumnBridge
            .pinnedWithMeasuredStats(joined0)
          else joined0
        (joined.filter(!col("is_dup")),
          joined.filter(col("is_dup")).select(col(idCol), col("kept_id")))
      }
    // measured-stats pin: survivors feed the minhash hashing downstream —
    // an inherited join-product estimate here would mis-size every shuffle
    // of the rest of the night (see pinnedWithMeasuredStats)
    val survivors = org.apache.spark.sql.graft.ColumnBridge
      .pinnedWithMeasuredStats(corpusSurvivors.select(cols.map(col): _*)
        .unionByName(outScope.select(cols.map(col): _*)))
    GateResult(survivors, corpusDropped, intraDropped)
  }

  /** The `(md5(text), id)` key rows [[exactGate]]-gated survivors should
    * [[append]] (or bootstrap-[[save]]) after landing — the gate's scope
    * rule applied to the append side. */
  def survivorKeys(survivors: DataFrame, idCol: String,
      textCol: String): DataFrame =
    survivors
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(md5(col(textCol).cast("binary")).as("__exact_key"),
        col(idCol))

  /** Bootstrap-or-append for the ingest surfaces: save() with the given
    * geometry when no index exists at `path`, append() otherwise — ONE
    * implementation for the nightly pipeline and the streaming sinks (the
    * exactGate anti-drift rule applied to the append side too). */
  def appendOrBootstrap(keys: DataFrame, keyCol: String, idCol: String,
      path: String, shards: Int, bitsPerShard: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val exists = p.getFileSystem(
      keys.sparkSession.sparkContext.hadoopConfiguration).exists(p)
    if (!exists)
      save(keys, keyCol, idCol, path, shards = shards,
        bitsPerShard = bitsPerShard,
        itemsPerShard = math.max(1L, bitsPerShard / 10))
    else append(keys, keyCol, idCol, path)
  }

  /** Retract numeric ids from the index: O(|ids|), probe-visible
    * immediately (the verify subtracts them), physical at [[vacuum]]. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.append(spark, path, ids)

  /** Physically drop tombstoned ledger rows (touched shard directories
    * only) and clear the set. Bloom bits of the removed keys persist until
    * [[rebuildBlooms]] — a false-positive-width cost, never a correctness
    * one. Returns rows removed. */
  def vacuum(spark: SparkSession, path: String): Long = {
    // an index bootstrapped from an all-empty batch has a blooms dir and
    // marker but no keys dir (an empty partitionBy write commits nothing)
    // — nothing to vacuum, and reading the absent dir would throw. The
    // tombstone set still clears: a removeIds against the empty index may
    // have appended ids, and leaving them would (a) make every future
    // probe broadcast-anti-join the set forever and (b) wrongly subtract
    // those ids if they are legitimately appended LATER (re-admission
    // after retraction is an accepted submission, spec-pinned).
    val kp = new org.apache.hadoop.fs.Path(keysPath(path))
    if (!kp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(kp)) {
      Tombstones.clear(spark, path)
      0L
    } else {
      val removed =
        PartitionVacuum.vacuum(spark, path, keysPath(path), ShardCol, IdCol)
      if (removed > 0L) {
        // ONE read-modify-write for both counters (two separate updates
        // would double the marker round-trips and a crash between them
        // would skew the stale-share denominator); pre-counter indexes
        // leave LiveRowsKey absent — staleShare falls back to a one-off
        // count
        updateMarker(spark, path) { m =>
          def long(k: String) =
            m.get(k).flatMap(v => scala.util.Try(v.toLong).toOption)
          val bumped = m.updated(RemovedKey,
            (long(RemovedKey).getOrElse(0L) + removed).toString)
          long(LiveRowsKey) match {
            case Some(live) => bumped.updated(LiveRowsKey,
              math.max(0L, live - removed).toString)
            case None => bumped
          }
        }
        val share = staleShare(spark, path)
        if (share > StaleWarnShare)
          graft.core.Warn(f"bloom index at $path: ${share * 100}%.0f%% of " +
            "the bloom population is stale (keys vacuumed since the last " +
            "rebuild keep their bits set) — the false-positive tail is " +
            "widening; run BloomIndex.rebuildBlooms (or maintain) to " +
            "restore precision")
      }
      removed
    }
  }

  /** Fold each shard's bloom generations into one row (append litter →
    * one row per shard, crash-safe via the shared [[DirSwap]] discipline)
    * and dedup/compact the ledger's shard directories. Run on the nightly
    * compaction cadence.
    *
    * Both halves are FRAGMENTATION-GATED so a nightly cadence pays only
    * when litter actually accumulated (the rule
    * [[graft.ops.Compaction.compactPath]] applies to data files, extended
    * to the bloom rows): the fold runs only when the marker's generation
    * counter reaches `minFoldGenerations` (probing g generations costs g
    * `mightContainLong` calls — trivial — while the fold reads and
    * rewrites every shard's bloom bytes, the dominant fixed cost of a
    * small night), and the ledger rewrite skips shard directories whose
    * excess file count is within `ledgerMinExcessFiles` of target. An
    * index from before the counter existed reads as unknown → fold. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = graft.ops.Compaction.DefaultTargetFileBytes,
      minFoldGenerations: Long = 2L,
      ledgerMinExcessFiles: Long = 0L)
      : graft.ops.CompactionResult = {
    import spark.implicits._
    val live = bloomsPath(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    DirSwap.repair(spark, live)
    val gens = markerLong(spark, path, GenerationsKey)
    val foldDue = gens.forall(_ >= minFoldGenerations)
    if (foldDue && fs.exists(new org.apache.hadoop.fs.Path(live))) {
      val staged = live + "__compact"
      fs.delete(new org.apache.hadoop.fs.Path(staged), true)
      spark.read.parquet(live)
        .select(col(ShardCol), col("bloom")).as[(Int, Array[Byte])]
        .groupByKey(_._1)
        .mapGroups { (shard, rows) =>
          val it = rows.map(r => BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r._2)))
          val merged = it.next()
          it.foreach(merged.mergeInPlace)
          val out = new java.io.ByteArrayOutputStream()
          merged.writeTo(out)
          (shard, out.toByteArray)
        }
        .toDF(ShardCol, "bloom")
        .write.mode("overwrite").parquet(staged)
      DirSwap.swap(spark, live, staged)
      spark.catalog.refreshByPath(live)
      updateMarker(spark, path)(_.updated(GenerationsKey, "1"))
    }
    val kp = new org.apache.hadoop.fs.Path(keysPath(path))
    if (!kp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(kp))
      graft.ops.CompactionResult(0, 0L, 0L, 0L) // empty-bootstrap index
    else graft.ops.Compaction.compactPath(spark, keysPath(path),
      Seq(ShardCol), targetFileBytes,
      minExcessFiles = ledgerMinExcessFiles)
  }

  /** Share of the standing key population whose bloom bits are STALE —
    * rows [[vacuum]] physically removed since the last [[rebuildBlooms]],
    * over (removed + live). Removed keys' bits persist in the filters (the
    * ledger decides correctness), so this share is exactly the widening of
    * the false-positive tail heavy retraction traffic causes. Marker reads
    * only — no job — except on a pre-counter index, which pays one
    * metadata count and persists it. */
  def staleShare(spark: SparkSession, path: String): Double = {
    val removed = markerLong(spark, path, RemovedKey).getOrElse(0L)
    if (removed <= 0L) 0.0
    else {
      val live = markerLong(spark, path, LiveRowsKey).getOrElse {
        val counted = readLedgerOrEmpty(spark, path).count()
        updateMarker(spark, path)(
          _.updated(LiveRowsKey, counted.toString))
        counted
      }
      removed.toDouble / (removed + live).toDouble
    }
  }

  /** [[staleShare]] above which [[vacuum]] warns and [[maintain]]
    * rebuilds: a quarter of the bloom population answering for keys the
    * ledger no longer holds measurably widens the verify-candidate tail. */
  val StaleWarnShare: Double = 0.25

  /** The nightly maintenance cadence as ONE entry point — vacuum pending
    * tombstones, compact (fold-gated, see [[compact]]), and rebuild the
    * blooms when retraction traffic has made [[staleShare]] exceed
    * `rebuildShare` (the LshGuard discipline: the footgun fires a loud,
    * self-healing response instead of silently-wider false-positive
    * tails). Returns (compaction result, rebuilt?). */
  def maintain(spark: SparkSession, path: String,
      targetFileBytes: Long = graft.ops.Compaction.DefaultTargetFileBytes,
      minFoldGenerations: Long = 2L,
      ledgerMinExcessFiles: Long = 0L,
      rebuildShare: Double = StaleWarnShare)
      : (graft.ops.CompactionResult, Boolean) = {
    vacuum(spark, path)
    // decide the rebuild BEFORE compacting: a rebuild rewrites every
    // shard's bloom from the ledger anyway (and leaves one generation per
    // shard), so folding first would pay the full-bloom rewrite twice in
    // one night — skip the fold on rebuild nights, keep the ledger sweep
    val rebuilt = staleShare(spark, path) > rebuildShare
    val comp = compact(spark, path, targetFileBytes,
      minFoldGenerations = if (rebuilt) Long.MaxValue else minFoldGenerations,
      ledgerMinExcessFiles = ledgerMinExcessFiles)
    if (rebuilt) rebuildBlooms(spark, path)
    (comp, rebuilt)
  }

  /** Rebuild every shard's bloom from the (post-vacuum) ledger — restores
    * the false-positive rate after retractions. O(ledger) read, staged and
    * swapped crash-safe. */
  def rebuildBlooms(spark: SparkSession, path: String): Unit = {
    val g = readGeometry(spark, path)
    val live = bloomsPath(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    DirSwap.repair(spark, live)
    val staged = live + "__rebuild"
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    val ledger = readLedgerOrEmpty(spark, path)
    val tally = spark.sparkContext.longAccumulator("bloom_ledger_rows")
    buildGenerations(
      ledger.select(col(KeyCol), xxhash64(col(KeyCol)).as("__h"),
        col(ShardCol)), g, Some(tally))
      .write.mode("overwrite").parquet(staged)
    DirSwap.swap(spark, live, staged)
    spark.catalog.refreshByPath(live)
    // a rebuilt bloom holds exactly the live ledger: no stale bits, one
    // generation per shard, and the row tally re-baselines exactly
    updateMarker(spark, path)(
      _.updated(GenerationsKey, "1").updated(RemovedKey, "0")
        .updated(LiveRowsKey, tally.value.toString))
  }

  /** Per-shard health: bloom generations, ledger rows, the filters'
    * estimated item count and expected false-positive rate. A shard whose
    * `est_fpp` approaches 1 has saturated its bit budget — every probe key
    * becomes a verify candidate and the index degrades to a plain ledger
    * join; [[save]] with more bits (or more shards) is the remedy. */
  /** The key ledger, or an empty typed frame when the keys directory
    * never materialized (empty-bootstrap index — an empty partitionBy
    * write commits nothing). */
  private def readLedgerOrEmpty(spark: SparkSession,
      path: String): DataFrame = {
    val kp = new org.apache.hadoop.fs.Path(keysPath(path))
    if (kp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(kp))
      spark.read.parquet(keysPath(path))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(KeyCol,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(IdCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(ShardCol,
          org.apache.spark.sql.types.IntegerType))))
  }

  def stats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    DirSwap.repair(spark, bloomsPath(path)) // crashed compact/rebuild swap
    val ledger = readLedgerOrEmpty(spark, path)
      .groupBy(col(ShardCol)).agg(count(lit(1)).as("ledger_rows"))
    // marker-only index (crash after save wrote the marker, before the
    // blooms write — a state probe/compact explicitly tolerate): report
    // ledger-only health rows instead of throwing PATH_NOT_FOUND
    val bp = new org.apache.hadoop.fs.Path(bloomsPath(path))
    if (!bp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(bp))
      return ledger.select(col(ShardCol),
        lit(null).cast("int").as("generations"),
        lit(null).cast("long").as("est_items"),
        lit(null).cast("double").as("est_fpp"),
        col("ledger_rows"),
        lit(null).cast("double").as("stale_frac"))
        .orderBy(ShardCol)
    // hash-function count, recomputed the way BloomFilter.create derives
    // it from the recorded geometry — needed to invert set-bit counts
    // into an item estimate (cardinality() counts set BITS, not items):
    // n̂ = -(m/k)·ln(1 − X/m), the standard bloom occupancy inversion
    val g = readGeometry(spark, path)
    val k = math.max(1, math.round(
      g.bitsPerShard.toDouble / g.itemsPerShard * math.log(2.0))).toInt
    val blooms = spark.read.parquet(bloomsPath(path))
      .select(col(ShardCol), col("bloom")).as[(Int, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        var gens = 0
        val it = rows.map { r =>
          gens += 1
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(r._2))
        }
        val merged = it.next()
        it.foreach(merged.mergeInPlace)
        val m = merged.bitSize().toDouble // word-aligned actual size
        val setBits = math.min(merged.cardinality().toDouble, m - 1.0)
        val est = math.round(-(m / k) * math.log1p(-setBits / m))
        (shard, gens, est, merged.expectedFpp())
      }
      .toDF(ShardCol, "generations", "est_items", "est_fpp")
    blooms.join(ledger, Seq(ShardCol), "full")
      .na.fill(0L, Seq("ledger_rows"))
      // share of the shard's bloom population the ledger no longer holds —
      // stale bits from vacuumed keys (cardinality is an estimate, so the
      // share clamps to [0,1]); null when the shard has no bloom rows
      .withColumn("stale_frac",
        when(col("est_items") > 0,
          least(lit(1.0), greatest(lit(0.0),
            (col("est_items") - col("ledger_rows"))
              / col("est_items").cast("double")))))
      .orderBy(ShardCol)
  }
}
