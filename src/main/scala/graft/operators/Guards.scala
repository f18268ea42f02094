package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Row-level data-contract guards shared by the ingest-door gates.
 *
 * Every gate returns (survivors, flagged) where survivors = batch ANTI
 * JOIN flagged on the id — an algebra a null id breaks silently: a null
 * key never matches an equi-join, so a flagged null-id doc would BOTH
 * ledger as dropped AND land in the corpus, and an unflagged one can
 * never be retracted later (tombstones are id-keyed). Out-of-scope
 * routing cannot restore the complement for the same reason, so gates
 * that ledger or score FAIL LOUDLY instead (the [[BloomIndex.exactGate]]
 * pass-through is the one deliberate exception: it makes no ledger claim
 * about the rows it routes).
 *
 * The guard is a row-level `raise_error`, not a driver-side count — no
 * extra pass, and it fires on the survivors side's join key evaluation,
 * which every gate consumer materializes, so it covers docs the SCORING
 * path never sees (a zero-token doc produces no token rows: a guard
 * living only under the tokenize-explode is skipped for it by codegen —
 * the round-20 review finding).
 */
private[operators] object Guards {

  /** `df` with `id` wrapped so the first null row fails the job with a
    * clear message; all other columns pass through untouched. */
  def requireIds(df: DataFrame, id: String, caller: String): DataFrame =
    df.select(df.columns.map { c =>
      if (c == id)
        when(col(id).isNull, raise_error(lit(s"$caller: null-id " +
          "document — a null id cannot be gated, ledgered, or tombstoned " +
          "(a null key never anti-joins out, so the gate's survivors and " +
          "flagged sets would stop being complements); assign stable " +
          "non-null ids upstream")))
          .otherwise(col(id)).as(id)
      else col(c)
    }.toIndexedSeq: _*)
}
