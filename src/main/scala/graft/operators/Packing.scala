package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Token-budget shard packing — the step between a curated corpus and a
 * training job: documents are laid out in a deterministic global order and
 * cut into shards of `budget` tokens each, so every trainer shard holds a
 * contiguous, reproducible slice of the token stream.
 *
 * Semantics are START-OFFSET packing: a document belongs to the shard in
 * which its first token falls (`shard = (global_token_offset) / budget`,
 * integer division). That keeps the assignment a pure function of the
 * running token sum — expressible identically in any SQL engine (one
 * window cumsum), stable under re-runs, and mergeable: shard k's documents
 * are exactly those whose offset lies in [k*budget, (k+1)*budget). A shard
 * may overrun the budget by at most one document's tail (the classic
 * close-when-exceeded greedy is a recursive fold — not distributable
 * without giving up engine portability, and its shards are not
 * offset-addressable).
 *
 * Scale shape: the naive formulation is one window over a GLOBAL order —
 * a single-partition sort that dies at 100 TB. [[packShards]] instead
 * computes the same cumsum in two distributed phases:
 *   1. rows are bucketed by an order-preserving range split of the key
 *      (`buckets` fixed dyadic ranges from one min/max aggregate);
 *      per-bucket token totals — `buckets` rows, bounded — become prefix
 *      offsets on the driver;
 *   2. a window PARTITIONED BY bucket (parallel, ~corpus/buckets rows per
 *      task) adds the broadcast bucket offset to the within-bucket cumsum.
 * The result is bit-identical to the single-window form (spec-pinned) with
 * max task state corpus/`buckets`, not the corpus.
 */
object Packing {

  /**
   * Assign each row a `shard` id by packing `tokens` in ascending `key`
   * order into `budget`-token shards, plus the row's `token_offset` (global
   * tokens before it — the byte-offset analogue a loader seeks by).
   *
   * `key` must be numeric (the range bucketing needs an order-preserving
   * arithmetic split; hash a string key into a stable numeric first —
   * any deterministic total order works for training shards) and UNIQUE:
   * duplicate keys make the tie order, and with it every later row's
   * offset, engine-dependent.
   * Null keys or token counts are rejected up front: a null key has no
   * position in the order, and `sum` silently skips null tokens, which
   * would de-sync the two phases' offsets.
   *
   * Cost shape: three narrow scans of (key, tokens) — bucket geometry
   * (min/max), per-bucket totals, and the bucketed window — all
   * column-pruned at the source. `keyBounds` skips the first scan when the
   * caller already knows the key range (monotonic ids, a catalog stat);
   * values only need to COVER the range — rows outside [lo, hi] clamp into
   * the edge buckets, which skews bucket balance but never correctness
   * (the cumsum is exact for any contiguous bucketing).
   */
  def packShards(
      df: DataFrame, key: String, tokens: String, budget: Long,
      buckets: Int = 1024,
      keyBounds: Option[(Double, Double)] = None): DataFrame = {
    require(budget > 0, "packShards budget must be positive")
    require(buckets > 0, "packShards buckets must be positive")
    require(df.schema(key).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packShards key must be numeric (got ${df.schema(key).dataType}); " +
        "hash non-numeric keys into a stable numeric order first")
    // one tiny driver-side aggregate (2 values) fixes the bucket geometry —
    // skipped entirely when the caller supplies the range
    val (lo, hi) = keyBounds.getOrElse {
      val mm = df.agg(min(col(key)).cast("double"), max(col(key)).cast("double")).head()
      if (mm.isNullAt(0)) return df
        .withColumn("token_offset", lit(0L)).withColumn("shard", lit(0L)).limit(0)
      (mm.getDouble(0), mm.getDouble(1))
    }
    require(hi >= lo, s"packShards keyBounds must satisfy hi >= lo (got $lo, $hi)")
    val span = math.max(hi - lo, 0.0) + 1.0
    val bucketCol = greatest(least(
      floor((col(key).cast("double") - lit(lo)) / lit(span / buckets)),
      lit(buckets - 1L)), lit(0L)).cast("int")
    val checked = df.withColumn("__pb",
      when(col(key).isNull, raise_error(lit(
        s"packShards: null $key has no position in the pack order")))
        .when(col(tokens).isNull, raise_error(lit(
          s"packShards: null $tokens would de-sync the shard offsets")))
        .otherwise(bucketCol))
    // phase 1: per-bucket totals -> exclusive prefix offsets (driver-side,
    // bounded by `buckets` regardless of corpus size), broadcast back
    val totals = checked.groupBy(col("__pb"))
      .agg(sum(col(tokens).cast("long")).as("__btok"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (b, tok)) => (b, acc + tok)
    }
    val offsetMap = offsets.sliding(2).collect {
      case Array((_, off), (b, _)) => (b, off)
    }.toMap
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsetMap.toSeq.toDF("__pb", "__boff"))
    // phase 2: within-bucket cumsum (parallel across buckets) + base offset
    val w = Window.partitionBy(col("__pb")).orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    checked.join(offsetDf, Seq("__pb"))
      .withColumn("token_offset",
        col("__boff") + sum(col(tokens).cast("long")).over(w) - col(tokens).cast("long"))
      .withColumn("shard", floor(col("token_offset") / budget).cast("long"))
      .drop("__pb", "__boff")
  }

  /**
   * Deterministic shuffle key for training order: documents sorted by raw
   * ingest key arrive correlated (same crawl, same source, same day next to
   * each other), and a trainer reading shards in key order sees them in
   * that correlated order. `shuffleKey` decorrelates with a stable
   * block-shuffle — the md5 hash bucket (0..99) becomes the high digits and
   * the original key the low digits, so rows land in hash-scattered blocks
   * while the key stays NUMERIC, UNIQUE (given `span` > every key), and
   * engine-portable — exactly what [[packShards]] requires, making
   * "shuffle then pack" a one-line composition:
   * {{{
   *   packShards(df.withColumn("sk", Packing.shuffleKey(col("id"), span)),
   *     "sk", "n_tokens", budget)
   * }}}
   * Reproducible forever (content hash, no seed) — re-running the pipeline
   * on the same corpus yields byte-identical shards.
   *
   * Uniqueness holds ONLY while every key lies in [0, span): a key at or
   * above `span` bleeds into the next hash block (bucket b's key k collides
   * with bucket b+1's key k−span) and a negative key into the previous —
   * either silently corrupts the pack order. The expression checks the
   * bound per row and raises instead (a codegen'd comparison, the
   * [[packShards]] null-guard discipline), so a mis-sized span fails fast.
   */
  def shuffleKey(key: Column, span: Long): Column = {
    require(span > 0, "shuffleKey span must be positive")
    val k = key.cast("long")
    when(k < 0 || k >= span, raise_error(concat(
        lit("shuffleKey: key "), k.cast("string"),
        lit(s" outside [0, $span) — hash blocks would collide and corrupt" +
          " the pack order; raise span above every key"))))
      .otherwise(Sampling.hashBucket(key).cast("long") * span + k)
  }

  /**
   * Shard manifest: per-shard document/token counts and offset range — the
   * sidecar a training loader reads to address shards without scanning
   * them. One aggregation over the packed frame.
   */
  def shardManifest(packed: DataFrame, tokens: String): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokens).cast("long")).as("n_tokens"),
        min(col("token_offset")).as("start_offset"),
        max(col("token_offset") + col(tokens).cast("long")).as("end_offset"))
      .orderBy(col("shard"))

  /**
   * Materialize a packed frame as the layout a training loader consumes:
   * `path/shards/shard=<k>/...jsonl` (one JSON document per line, rows of
   * shard k only, in `key` order within each file) plus
   * `path/manifest` ([[shardManifest]] as parquet). The write
   * range-clusters by shard first so each task owns contiguous shards and
   * file count scales with shards touched, not tasks × shards (the
   * IvfIndex write discipline); `sortWithinPartitions(shard, key)` makes
   * every file's line order reproducible. Loaders that stream a shard
   * straight through get documents in global pack order.
   */
  def writeShards(packed: DataFrame, key: String, tokens: String,
      path: String): Unit = {
    // the packed frame (an aggregate + window upstream) feeds both the
    // shard write and the manifest — persist so the pack computes once
    val p = packed.persist()
    try {
      p.repartitionByRange(col("shard"))
        .sortWithinPartitions(col("shard"), col(key))
        .write.mode("overwrite").partitionBy("shard")
        .json(s"$path/shards")
      shardManifest(p, tokens)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    } finally { p.unpersist(); () }
  }
}
