package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Overlapping document chunking — the step between a curated corpus and an
 * embedding/RAG pipeline: long documents are cut into fixed-size character
 * windows with a stride, so each chunk fits an encoder's context and
 * neighboring chunks share `size - stride` characters of overlap (no
 * sentence is ever split across a boundary without also appearing whole in
 * one of the two windows).
 *
 * Chunk geometry is pure integer arithmetic on the document length —
 * engine-portable and reproducible (the DuckDB oracle mirrors it):
 *
 *   n_chunks(len) = floor((max(len - size, 0) + stride - 1) / stride) + 1
 *   chunk i       = substr(text, i*stride + 1, size),  i in 0..n_chunks-1
 *
 * i.e. ceiling-division of the overhang by the stride, plus the first
 * window. The last chunk may be shorter than `size` (substr clamps at the
 * end of the string — same semantics in Spark and ANSI engines); every
 * character index is covered, and a document no longer than `size` yields
 * exactly one chunk equal to itself. Empty/whitespace-only documents still
 * yield one (empty) chunk — dropping them is a quality-filter decision
 * that belongs upstream, not a silent side effect of chunking.
 *
 * Scale shape: per-row narrow explode — no shuffle, no state, stays in
 * whole-stage codegen (`sequence` + `transform` + `substring`, no UDF).
 * Output rows multiply by chunks-per-doc exactly as the downstream
 * embedding job requires; the writer's partitioning bounds task size.
 * At 100 TB the operator is exactly as parallel as the scan feeding it.
 */
object Chunking {

  /**
   * Explode each document into `(… passthrough cols …, chunk_id,
   * chunk_start, chunk_text)`: `chunk_id` is the 0-based window index,
   * `chunk_start` the 1-based character offset a retriever quotes back
   * (substr addressing), `chunk_text` the window itself.
   *
   * `size` is the window width in characters; `stride` how far consecutive
   * windows advance (`stride < size` ⇒ overlap of `size - stride`;
   * `stride = size` ⇒ exact tiling). `stride > size` would skip characters
   * — rejected, a chunker must cover the document.
   */
  def chunk(df: DataFrame, text: String, size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size] so windows cover every " +
        s"character, got $stride")
    val len = coalesce(length(col(text)), lit(0))
    // ceiling division in exact integer arithmetic; the division below is
    // double-valued in both Spark and DuckDB, exact for any string length
    // (< 2^53), and floor() restores the integer quotient
    val nChunks =
      (floor((greatest(len - size, lit(0)) + lit(stride - 1)) / lit(stride))
        + lit(1)).cast("int")
    df.withColumn("__ck",
        explode(transform(sequence(lit(0), nChunks - 1), i => struct(
          i.cast("int").as("chunk_id"),
          (i * stride + 1).cast("int").as("chunk_start"),
          col(text).substr(i * stride + 1, lit(size)).as("chunk_text")))))
      .withColumn("chunk_id", col("__ck.chunk_id"))
      .withColumn("chunk_start", col("__ck.chunk_start"))
      .withColumn("chunk_text", col("__ck.chunk_text"))
      .drop("__ck")
  }

  /** Chunk-level audit: documents, chunks, expansion factor, and the
    * overlap-duplicated character fraction — what the chunking run reports
    * next to its output (one aggregation over the chunked frame). */
  def chunkReport(chunked: DataFrame, idCol: String): DataFrame =
    chunked.agg(
      countDistinct(col(idCol)).as("n_docs"),
      count(lit(1)).as("n_chunks"),
      sum(length(col("chunk_text"))).as("chunk_chars"))
    .select(col("n_docs"), col("n_chunks"),
      (col("n_chunks").cast("double") / col("n_docs").cast("double"))
        .as("chunks_per_doc"),
      col("chunk_chars"))
}
