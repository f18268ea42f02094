package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/**
 * Shared parameter-marker persistence for the on-disk index families
 * ([[BandIndex]], [[IvfIndex]]). An index probed with parameters different
 * from the ones it was built with fails SILENTLY — LSH buckets from a
 * drifted hash family never collide, and an IVF probe with drifted vector
 * dims mis-ranks or throws deep inside the scorer — so both lifecycles
 * record their build parameters in an underscore-hidden marker file next to
 * the data (parquet readers skip `_`-prefixed files) and fail fast on
 * mismatch at probe/append time.
 */
private[operators] object IndexMeta {

  private val MetaFile = "_graft_index_meta.json"

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, MetaFile)

  def write(spark: SparkSession, path: String,
      params: Map[String, String]): Unit = {
    val fs = metaPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath(path), true)
    try out.write(params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}").getBytes("UTF-8"))
    finally out.close()
  }

  /** The recorded parameters (empty if the index never recorded any). */
  def read(spark: SparkSession, path: String): Map[String, String] = {
    val fs = metaPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath(path))) Map.empty
    else {
      val in = fs.open(metaPath(path))
      val raw = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      """"([^"]+)": "([^"]*)"""".r.findAllMatchIn(raw)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
  }
}

/**
 * Crash-safe replacement of a live index directory by a fully-staged one —
 * the swap discipline the retrain operators share. A plain
 * delete-then-rename has a window where a crash leaves the index with NO
 * live directory and the documented "re-run the retrain" repair then dies
 * reading the absent path. Here the live directory is renamed ASIDE first,
 * so every crash point leaves a state [[repair]] completes forward from:
 *
 *   1. delete a stale `<live>__old` leftover (from a crash after step 3)
 *   2. rename `<live>` → `<live>__old`
 *   3. rename `<staged>` → `<live>`
 *   4. delete `<live>__old`
 *
 * [[repair]] is SUFFIX-AGNOSTIC and runs at every reader entry point
 * (not just the operation that crashed): a missing live directory with a
 * swap-READY staged sibling present — any `<live>__<op>` directory, not
 * a hard-coded one — means the crash hit between steps 2 and 3, and the
 * staged directory is complete by construction, so rolling FORWARD
 * (rename staged in, drop `__old`) restores exactly the state the
 * interrupted swap was committing. Readiness is explicit: [[swap]] drops
 * a `_graft_swap_ready` marker into the staged directory before the
 * first rename, so a PARTIAL stage (crash mid-write, before swap was
 * ever called) can never be mistaken for the committed content and
 * rolled forward — it has no marker. Without the suffix-agnostic form, a
 * crash mid-vacuum followed by a retrain (or probe) found `codes/`
 * missing and died unhelpfully because each operation only repaired its
 * OWN suffix. A leftover `__old` beside a live directory (crash after 3)
 * is simply dropped.
 *
 * CONCURRENCY: [[repair]] runs destructive renames and deletes, and
 * because it funnels through every READER entry point
 * (loadCodes/loadCells/probe), a reader racing a legitimately in-flight
 * [[swap]] — between its rename-aside (step 2) and rename-in (step 3) —
 * can roll the marked stage forward while the swapper is mid-commit. On
 * a filesystem with atomic directory rename the interleaving converges
 * (the loser's rename returns false, which both actors ignore, and every
 * delete is idempotent), but on stores WITHOUT atomic directory rename
 * the window is real. The maintenance-window caveat the vacuum/retrain
 * operations document therefore extends to reader-side repair: while a
 * swap is in flight, probes share the maintainer's window — serialize
 * maintenance against readers externally on non-atomic-rename stores.
 */
private[operators] object DirSwap {

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  def oldPath(live: String): String = live + "__old"

  /** Marker file [[swap]] writes into a staged directory at commit start;
    * its presence is the staged dir's "complete and verified" attestation
    * [[repair]] keys roll-forward on. Underscore-prefixed: parquet
    * readers skip it if it ever rides along. */
  private val ReadyMarker = "_graft_swap_ready"

  /** Claim file a [[repair]] roll-forward creates (atomically,
    * `createNewFile`) BESIDE the live path — `<live>__claim` in the parent
    * directory — before its destructive rename: the best-effort
    * single-actor guard for concurrent reader-funnel repairs. Parent-level
    * on purpose: creating it INSIDE the staged dir would re-create that
    * dir (Hadoop create() mkdirs missing parents) when racing the winner's
    * rename, resurrecting an empty stage. It is a FILE, so the stage
    * listing (directories only) never mistakes it for a stage. */
  private def claimPath(live: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(live.getParent, live.getName + "__claim")

  /** A claim older than this with live still missing is a crashed
    * claimant; the next repair takes it over. */
  private val ClaimStaleMs = 60000L

  /** How long a repair LOSER waits for the winner's rename to land before
    * giving up (the winner's work is one directory rename — milliseconds;
    * the bound only protects against a winner dying mid-flight, where the
    * stale-claim takeover on the next entry finishes the job). */
  private val LoserWaitMs = 10000L

  /** Swap the verified `staged` directory in over `live` (steps 1–4). */
  def swap(spark: SparkSession, live: String, staged: String): Unit = {
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the marker create would silently mkdir a MISSING staged dir — and a
    // crash after it could roll an empty directory forward as live
    require(fs.exists(p(staged)),
      s"swap: staged directory '$staged' does not exist — stage content " +
        "before swapping")
    fs.delete(p(oldPath(live)), true)
    fs.create(new org.apache.hadoop.fs.Path(p(staged), ReadyMarker), true)
      .close() // staged is committed-content from this instant
    fs.rename(p(live), p(oldPath(live)))
    fs.rename(p(staged), p(live))
    fs.delete(new org.apache.hadoop.fs.Path(p(live), ReadyMarker), false)
    fs.delete(p(oldPath(live)), true)
    ()
  }

  /** Complete an interrupted [[swap]] over `live`, whatever operation
    * staged it; returns true if a roll-forward happened (the caller may
    * want to log it). Scans `live`'s parent for `<name>__*` siblings
    * (excluding `__old`) carrying the ready marker; when live is missing
    * and one exists, renames it in. Partial stages (no marker) are left
    * for their owning operation's stale-stage cleanup. Safe — and cheap,
    * one exists() in the common path — when nothing is stranded. */
  def repair(spark: SparkSession, live: String): Boolean = {
    val livePath = p(live)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(livePath)) {
      // crash after step 3: live is current, __old is litter — and a
      // crash between rename(staged→live) and the marker delete strands
      // the ready marker INSIDE live (and possibly a repair's claim file
      // beside it — only meaningful while live is MISSING). Sweep all, so
      // the markers keep meaning "committed stage"/"claim in force".
      fs.delete(new org.apache.hadoop.fs.Path(livePath, ReadyMarker), false)
      fs.delete(claimPath(livePath), false)
      fs.delete(p(oldPath(live)), true)
      false
    } else {
      val parent = livePath.getParent
      val prefix = livePath.getName + "__"
      val ready =
        if (parent == null || !fs.exists(parent)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else fs.listStatus(parent).filter { st =>
          st.isDirectory && st.getPath.getName.startsWith(prefix) &&
            st.getPath.getName != livePath.getName + "__old" &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, ReadyMarker))
        }
      if (ready.isEmpty) false
      else {
        // at most one swap can be mid-flight; if a stale marked stage
        // also lingers (crash after marker write, before rename-aside),
        // the newer one is the interrupted commit
        val chosen = ready.maxBy(_.getModificationTime).getPath
        // SINGLE-ACTOR claim (best-effort): concurrent repairs — two
        // readers funneling through the same entry point after a crash —
        // would otherwise race the destructive rename below. createNewFile
        // is atomic on HDFS; on stores where it is check-then-create
        // (LocalFileSystem among them) two actors can both claim, and the
        // rename-race catch inside rollForward() is the hard backstop —
        // the loser observes live present and reports convergence. LOSERS
        // of the claim wait (bounded) for the winner's rename to land, so
        // their caller reads the repaired live dir, never a missing one.
        // A claim whose owner died (older than ClaimStaleMs with live
        // still missing) is taken over.
        val claim = claimPath(livePath)
        def takeClaim(): Boolean =
          try fs.createNewFile(claim)
          catch { case _: java.io.IOException => false }
        def stealClaim(): Boolean =
          try {
            !fs.exists(livePath) && { fs.delete(claim, false); takeClaim() }
          } catch { case _: java.io.IOException => false }
        def rollForward(): Boolean =
          try {
            // re-check under the claim: another actor may have finished
            // between our listing and our claim
            val rolled =
              try !fs.exists(livePath) && fs.exists(chosen) &&
                fs.rename(chosen, livePath)
              catch {
                // the HARD backstop for a lost rename race: FileSystem
                // .createNewFile is check-then-create on several stores
                // (LocalFileSystem among them), so two actors CAN both
                // hold the claim; the loser's rename then fails mid-op
                // (local fs: renameTo fails once the winner moved the
                // source and the FileUtil.copy fallback throws
                // FileNotFoundException). Convergence is ONLY the state
                // where live exists AND the chosen stage is gone — the
                // winner renamed it in. A partial-copy fault (disk full,
                // permissions) also leaves live present, but with chosen
                // still on disk; swallowing that would bless a corrupt
                // live dir, so it stays loud. The convergence check is two
                // non-atomic probes, and the winner's rename can land
                // BETWEEN them (exists(live) sampled false, then chosen
                // vanishes) — so a non-converged first read re-probes once
                // after a brief sleep before declaring the fault real; a
                // converged crash repair must never be reported as a
                // reader failure.
                case e: java.io.IOException =>
                  def converged(): Boolean =
                    fs.exists(livePath) && !fs.exists(chosen)
                  if (converged()) false
                  else {
                    Thread.sleep(100L)
                    if (converged()) false else throw e
                  }
              }
            if (fs.exists(livePath)) {
              fs.delete(new org.apache.hadoop.fs.Path(livePath, ReadyMarker),
                false)
              fs.delete(p(oldPath(live)), true)
            }
            rolled
          } finally {
            fs.delete(claim, false)
            ()
          }
        val staleAge =
          try System.currentTimeMillis() -
            fs.getFileStatus(claim).getModificationTime > ClaimStaleMs
          catch { case _: java.io.IOException => false }
        if (takeClaim() || (staleAge && stealClaim())) rollForward()
        else {
          // a claimant holds the stage: wait (bounded) for its rename. The
          // winner's work is one directory rename, so a live dir normally
          // appears in milliseconds; if the deadline passes with live
          // STILL missing the claimant is dead or wedged — steal the claim
          // and finish the roll-forward ourselves, so a crash between
          // claim-create and rename strands readers for at most
          // LoserWaitMs, never until the age threshold
          val deadline = System.currentTimeMillis() + LoserWaitMs
          while (!fs.exists(livePath) &&
              System.currentTimeMillis() < deadline)
            Thread.sleep(50L)
          if (fs.exists(livePath)) {
            // the winner may still be between its rename and its marker
            // delete — sweep it here too (idempotent)
            fs.delete(new org.apache.hadoop.fs.Path(livePath, ReadyMarker),
              false)
            false
          } else if (stealClaim()) rollForward()
          else false
        }
      }
    }
  }
}

/**
 * Soft-delete bookkeeping shared by the persisted index families — the
 * retraction half of the lifecycle ([[BandIndex]] / [[IvfIndex]] /
 * [[PqIndex]] / [[IvfPqIndex]] `removeIds` + `vacuum`).
 *
 * Deleting rows from an immutable columnar index by rewriting it is
 * O(index) — the wrong cost for a takedown of a handful of documents from
 * a 100 TB corpus's index. Instead a retraction appends the ids to an
 * underscore-hidden `_tombstones` parquet directory next to the data
 * (invisible to readers of the index root — Hadoop's listing filter skips
 * `_`-prefixed paths), and every probe subtracts the tombstone set from
 * the corpus side as a broadcast anti-join BEFORE scoring. Removal is
 * O(|ids|); the probe surcharge is one bounded broadcast.
 *
 * The set is BOUNDED BY CONTRACT: tombstones hold only ids retracted
 * since the last `vacuum`, and each index's `vacuum` physically rewrites
 * exactly the partitions that still hold tombstoned rows (touched-cell
 * detection via a pruned semi-join scan), then clears the set. Run it on
 * the nightly-compaction cadence; a tombstone set allowed to grow
 * corpus-sized is a misuse this module documents rather than defends.
 */
private[graft] object Tombstones {

  /** Single column name tombstone files store ids under — fixed, so every
    * index family reads every other's sets. */
  val IdCol = "__tomb_id"

  private val Dir = "_tombstones"

  private def p(root: String) = new org.apache.hadoop.fs.Path(root, Dir)

  private def fs(spark: SparkSession, root: String) =
    p(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append `ids` (first column taken, cast long) to the set at `root`.
    * A retraction batch is small by contract — coalesce(1) keeps each
    * retraction to one file so the set stays listable. Duplicate ids
    * across retractions are fine (the anti-join and vacuum are
    * set-semantics). The column must be numeric (the engine's id
    * contract) — a string id would null-cast and the retraction would
    * silently retract NOTHING, so fail up front instead. */
  def append(spark: SparkSession, root: String, ids: DataFrame): Unit = {
    val c = ids.columns.head
    require(ids.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tombstones store numeric ids; column '$c' has type " +
        s"${ids.schema(c).dataType} — map string ids to a stable numeric " +
        "key first (a null-cast here would silently retract nothing)")
    ids.select(col(c).cast("long").as(IdCol))
      .where(col(IdCol).isNotNull).distinct()
      .coalesce(1).write.mode("append").parquet(p(root).toString)
  }

  /** The current tombstone set (None when nothing is retracted) — one
    * distinct `__tomb_id` long column. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    if (!fs(spark, root).exists(p(root))) None
    else Some(spark.read.parquet(p(root).toString).distinct())

  /** A pending set larger than this (on-disk bytes — one listStatus, no
    * job) means vacuum is overdue: the probe-side broadcast stops being
    * free around here. ~16 MB of long ids ≈ 2M pending retractions. */
  val WarnBytes: Long = 16L * 1024 * 1024

  /** Corpus side minus the tombstone set — the probe-path subtraction.
    * No-op (and no filesystem read beyond one exists()) when the set is
    * empty; otherwise a broadcast anti-join on `idCol`, with a Warn once
    * the set's on-disk size says vacuum is overdue (the bounded-set
    * contract is the caller's to keep; the guard makes breaking it loud
    * instead of silently-slower probes). */
  def subtract(spark: SparkSession, root: String, df: DataFrame,
      idCol: String): DataFrame =
    read(spark, root) match {
      case None => df
      case Some(ts) =>
        val bytes = fs(spark, root).getContentSummary(p(root)).getLength
        if (bytes > WarnBytes)
          graft.core.Warn(s"tombstone set at $root is ${bytes >> 20} MB — " +
            "vacuum is overdue; every probe broadcasts this set")
        df.join(broadcast(ts), df(idCol) === ts(IdCol), "left_anti")
    }

  /** Drop the set — the vacuum commit point. Clearing LAST makes vacuum
    * crash-safe: until the clear, probes keep subtracting, so a partially
    * rewritten index is still answered correctly and a vacuum re-run
    * completes the remainder. */
  def clear(spark: SparkSession, root: String): Unit = {
    fs(spark, root).delete(p(root), true)
    ()
  }
}

/**
 * The physical half of retraction for PARTITIONED index layouts
 * ([[BandIndex]] bands, [[IvfIndex]]/[[IvfPqIndex]] cells): rewrite
 * exactly the partition directories that still hold tombstoned rows,
 * leave every other directory byte-untouched, then clear the set.
 *
 * Touched-partition detection is a pruned semi-join scan (id + partition
 * columns only); survivors stage under `<dataRoot>__vacuum` and swap in
 * per partition with a rename-aside discipline. Asides live under a
 * hidden `_vac_aside/` subdirectory so a crash mid-swap never exposes a
 * duplicate partition to readers — and the aside keeps its `cell=3` name
 * UNDER that hidden parent, because Spark's listing filter deliberately
 * KEEPS underscore-prefixed names that contain `=` (they parse as
 * partition directories — a flat `_vac_old_cell=3` sibling would join
 * partition discovery and fail every read with
 * CONFLICTING_PARTITION_COLUMN_NAMES). [[vacuum]]'s entry repair ROLLS
 * BACK any stranded aside whose live directory is missing (the tombstone
 * set is still in force until the final clear, so restoring the
 * un-vacuumed bytes is always correct; the re-run then vacuums them
 * again).
 * Crash-state walk: before any swap — nothing changed; between aside and
 * rename-in — live dir missing, survivors safe in BOTH the aside and the
 * staged dir, entry repair restores; after rename-in — aside is litter,
 * entry repair deletes it; after all swaps but before the clear — re-run
 * finds no touched partitions and just clears.
 *
 * Like `resplitCell`/`retrainSubspace`, vacuum is a maintenance-window
 * operation with respect to CONCURRENT probes: a probe whose plan listed
 * files before the swap can hit a transient missing-file read mid-swap —
 * retry it. (Correctness is never at stake: until the clear, a fresh
 * probe subtracts the tombstones regardless of which files it sees.)
 */
private[graft] object PartitionVacuum {

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private val AsideDir = "_vac_aside"

  /** Remove rows whose `idCol` is in `tombRoot`'s tombstone set from the
    * partitioned parquet layout at `dataRoot`, touched partitions only,
    * then clear the set. Returns the number of rows physically removed.
    * No-op (0) when the set is empty. */
  def vacuum(spark: SparkSession, tombRoot: String, dataRoot: String,
      partCol: String, idCol: String): Long = {
    val fs = hp(dataRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    repair(fs, dataRoot)
    val staged = dataRoot + "__vacuum"
    fs.delete(hp(staged), true) // stale partial stage from a crashed run
    Tombstones.read(spark, tombRoot) match {
      case None => 0L
      case Some(ts) =>
        val df = spark.read.parquet(dataRoot)
        val bts = broadcast(ts)
        val hit = df.join(bts, df(idCol) === bts(Tombstones.IdCol), "left_semi")
        // ≤ #partitions by construction; the scan reads two columns and
        // prunes nothing else
        val touched = hit.groupBy(col(partCol)).count().collect()
          .map(r => (r.get(0), r.getLong(1)))
        if (touched.isEmpty) { Tombstones.clear(spark, tombRoot); return 0L }
        val removed = touched.map(_._2).sum
        val touchedVals = touched.map(_._1).toIndexedSeq
        val survivors = df.filter(partitionPred(partCol, touchedVals))
          .join(bts, df(idCol) === bts(Tombstones.IdCol), "left_anti")
        replacePartitions(spark, dataRoot, partCol, touchedVals, survivors)
        Tombstones.clear(spark, tombRoot) // commit point — see scaladoc
        removed
    }
  }

  /** Predicate selecting exactly `touchedVals`' partitions. isin never
    * matches null — a null partition value needs its own isNull arm or
    * its rows silently vanish from the replacement set. */
  private[graft] def partitionPred(partCol: String,
      touchedVals: Seq[Any]): org.apache.spark.sql.Column = {
    val (nullTouched, nonNullVals) = touchedVals.partition(_ == null)
    Seq(
      if (nonNullVals.nonEmpty)
        Some(col(partCol).isin(nonNullVals.map(_.asInstanceOf[AnyRef]).toIndexedSeq: _*))
      else None,
      if (nullTouched.nonEmpty) Some(col(partCol).isNull) else None
    ).flatten.reduce(_ || _)
  }

  /** Stage `replacement` (a frame already filtered to exactly
    * `touchedVals`' partitions — the caller controls its content, sort
    * order, and file shape) and swap those partition directories in with
    * the aside-per-partition crash discipline documented on this object.
    * Shared by [[vacuum]] (tombstone survivors) and in-place row folds
    * ([[Bm25Index.compact]]'s replay-litter dedup). Directories absent
    * from the staged output are treated as fully-emptied: the delete IS
    * the rewrite. */
  private[graft] def replacePartitions(spark: SparkSession, dataRoot: String,
      partCol: String, touchedVals: Seq[Any], replacement: DataFrame): Unit = {
    val fs = hp(dataRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    repair(fs, dataRoot)
    val staged = dataRoot + "__vacuum"
    fs.delete(hp(staged), true) // stale partial stage from a crashed run
    replacement.write.partitionBy(partCol).mode("overwrite").parquet(staged)
    // Directory names must be built with the SAME escaping rule
    // Spark's writer used for both the live layout and the stage
    // (special characters percent-escape, null and empty string map
    // to __HIVE_DEFAULT_PARTITION__) — a hand-built s"$partCol=$v"
    // misses escaped values, the swap no-ops, and the rows the rewrite
    // meant to drop silently survive.
    val dirNames = touchedVals.map(dirNameFor(partCol, _))
    // Validate EVERY computed live dir before the first destructive
    // rename: a touched partition by definition has live bytes, so a
    // missing live dir means name reconstruction broke — abort loudly
    // with nothing renamed rather than half-swap.
    dirNames.foreach { d =>
      val live = hp(s"$dataRoot/$d")
      require(fs.exists(live),
        s"partition rewrite computed live directory '$live' which does " +
          "not exist — partition-name reconstruction mismatch; " +
          "aborting before any swap (live layout untouched)")
    }
    fs.mkdirs(hp(s"$dataRoot/$AsideDir"))
    dirNames.foreach { dirName =>
      val live = hp(s"$dataRoot/$dirName")
      val aside = hp(s"$dataRoot/$AsideDir/$dirName")
      val stagedDir = hp(s"$staged/$dirName")
      fs.delete(aside, true)
      fs.rename(live, aside)
      // a fully-emptied partition has no staged rows: the delete IS the
      // rewrite
      if (fs.exists(stagedDir)) fs.rename(stagedDir, live)
      fs.delete(aside, true)
    }
    fs.delete(hp(s"$dataRoot/$AsideDir"), true)
    fs.delete(hp(staged), true)
    // the rewrite replaced files under an unchanged path: invalidate
    // cached plans and file listings over it, or a probe whose plan
    // matches a pre-rewrite cached frame silently reads the old rows
    // (spec-pinned — the CacheManager matches plans by path, not by
    // file list)
    spark.catalog.refreshByPath(dataRoot)
  }

  /** The physical directory name Spark's writer gave this partition
    * value: delegate to Spark's own rule
    * ([[org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils]])
    * so escaping (`%`, `:`, space, `=`, …) and the null /
    * empty-string → `__HIVE_DEFAULT_PARTITION__` mapping match the
    * layout byte-for-byte. Value→string uses the external form
    * (`Date.toString` = yyyy-MM-dd, numbers verbatim); an exotic type
    * whose toString drifts from the writer's form is caught by the
    * pre-swap exists() validation in [[vacuum]], never silently. */
  private def dirNameFor(partCol: String, v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val s = v match {
      case null => ""  // getPartitionPathString maps "" to the null dir
      case other => other.toString
    }
    ExternalCatalogUtils.getPartitionPathString(partCol, s)
  }

  /** Entry-point repair for callers that SCAN the layout before calling
    * [[replacePartitions]] (which repairs again, idempotently): a
    * stranded aside must roll back before the caller's read or its rows
    * are invisible to the detection scan. */
  private[graft] def repairAt(spark: SparkSession, dataRoot: String): Unit =
    repair(hp(dataRoot).getFileSystem(spark.sparkContext.hadoopConfiguration),
      dataRoot)

  /** Roll back any partition stranded mid-swap by a crash (aside present,
    * live missing). Runs at [[vacuum]] entry; safe when nothing is
    * stranded. */
  private def repair(fs: org.apache.hadoop.fs.FileSystem,
      dataRoot: String): Unit = {
    val asideRoot = hp(s"$dataRoot/$AsideDir")
    if (!fs.exists(asideRoot)) return
    fs.listStatus(asideRoot).filter(_.isDirectory).foreach { st =>
      val live = hp(s"$dataRoot/${st.getPath.getName}")
      if (!fs.exists(live)) fs.rename(st.getPath, live)
      else fs.delete(st.getPath, true)
    }
    fs.delete(asideRoot, true)
  }
}
