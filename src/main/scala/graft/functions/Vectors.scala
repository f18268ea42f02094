package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector column functions over `array<float>` columns.
 *
 * Two tiers:
 *  - `dotFast` / `cosineFast`: plain double arithmetic via `aggregate` /
 *    `zip_with` — the hot path for the engine itself (codegen'd, one pass,
 *    no shuffle).
 *  - `dotExact` / `cosineExact`: quantize each component to a 1e-7 integer
 *    grid (`floor(x * 1e7)` as long) so the dot/norm sums are exact integer
 *    arithmetic — bit-identical across engines and across partition orders.
 *    Used where results must hash-match an external oracle; the quantization
 *    error (~1e-7 per component) is far below any similarity threshold.
 */
object Vectors {

  def dotFast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2Fast(a: Column): Column = sqrt(dotFast(a, a))

  def cosineFast(a: Column, b: Column): Column =
    dotFast(a, b) / (norm2Fast(a) * norm2Fast(b))

  import org.apache.spark.sql.graft.ColumnBridge
  import graft.plans.{DotProductQ, QuantizeVector}

  /** floor(x*1e7) per component, as long — deterministic quantization.
    * Native codegen'd expression; `quantizeHof` is the composable reference
    * form (identical results, interpreted lambdas). */
  def quantize(a: Column): Column =
    ColumnBridge.column(QuantizeVector(ColumnBridge.expression(a)))

  def quantizeHof(a: Column): Column =
    transform(a, x => floor(x.cast("double") * lit(1.0e7)).cast("long"))

  /** Exact integer dot product of two quantized vectors (unscaled).
    * Native codegen'd expression; `dotQHof` is the reference form. */
  def dotQ(aq: Column, bq: Column): Column =
    ColumnBridge.column(DotProductQ(
      ColumnBridge.expression(aq), ColumnBridge.expression(bq)))

  /** ADC score `sum over s of lut[s][codes[s]]` — the PQ probe's hot loop
    * as a native codegen'd expression; `PqIndex.adcScoreHof` is the
    * composable reference form it must match (PlansSpec). */
  def adcScoreQ(lut: Column, codes: Column): Column =
    ColumnBridge.column(graft.plans.AdcScoreQ(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes)))

  def dotQHof(aq: Column, bq: Column): Column =
    aggregate(zip_with(aq, bq, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /**
   * Cosine similarity from quantized components: integer dot and norms, one
   * final double division. Deterministic across engines/orders.
   */
  def cosineExact(a: Column, b: Column): Column = {
    val aq = quantize(a)
    val bq = quantize(b)
    dotQ(aq, bq).cast("double") /
      sqrt(dotQ(aq, aq).cast("double") * dotQ(bq, bq).cast("double"))
  }

  /**
   * Cosine from pre-quantized vectors and pre-computed self-dots — the
   * join-hot-path form: quantization and norms are computed once per input
   * row, so each candidate pair costs a single dot product. Bit-identical
   * to `cosineExact`.
   */
  def cosineQ(aq: Column, bq: Column, an: Column, bn: Column): Column =
    dotQ(aq, bq).cast("double") / sqrt(an.cast("double") * bn.cast("double"))
}
