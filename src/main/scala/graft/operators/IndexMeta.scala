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
