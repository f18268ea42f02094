package graft.operators

import org.apache.spark.sql.SparkSession

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
 * [[repair]] runs at retrain entry: a missing live directory WITH the
 * staged one present means the crash hit between steps 2 and 3 — and the
 * staged directory is complete by construction (it is only ever swapped
 * after its content is written and verified), so rolling FORWARD (rename
 * staged in, drop `__old`) restores exactly the state the interrupted
 * swap was committing. A leftover `__old` beside a live directory (crash
 * after 3) is simply dropped.
 */
private[operators] object DirSwap {

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  def oldPath(live: String): String = live + "__old"

  /** Swap the verified `staged` directory in over `live` (steps 1–4). */
  def swap(spark: SparkSession, live: String, staged: String): Unit = {
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p(oldPath(live)), true)
    fs.rename(p(live), p(oldPath(live)))
    fs.rename(p(staged), p(live))
    fs.delete(p(oldPath(live)), true)
    ()
  }

  /** Complete an interrupted [[swap]]; returns true if a roll-forward
    * happened (the caller may want to log it). Safe to call when no swap
    * was ever interrupted — it only acts on the stranded states above. */
  def repair(spark: SparkSession, live: String, staged: String): Boolean = {
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p(live)) && fs.exists(p(staged))) {
      fs.rename(p(staged), p(live))
      fs.delete(p(oldPath(live)), true)
      true
    } else {
      // crash after step 3: live is current, __old is litter
      if (fs.exists(p(live))) fs.delete(p(oldPath(live)), true)
      false
    }
  }
}
