package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The shared deterministic selection device used by every sampling /
  * mixing operator (d16 stratified sample, d32 epoch-mix resample, d36
  * temperature mix): uniform32(key) = first 8 hex digits of md5(key) as
  * a uint32, keep iff uniform32 < threshold32(rate).
  *
  * Both sides of the decision are INTEGERS — the float `rate` is folded
  * into a threshold exactly once, via a single deterministic rounding —
  * so no floating-point fold order, partial-aggregation order, or
  * engine-specific double rendering can move a row across the boundary
  * or wobble a driver hash. `u32 < ceil(rate * 2^32)` selects exactly
  * the same rows as the textbook `u32/2^32 < rate` (for non-integer
  * x, u < x ⟺ u < ceil(x) over integers; for integer x, ceil is
  * identity), so the device is a drop-in for the u01 formulation.
  *
  * No RNG state, no seed plumbing: the decision is a pure function of
  * the row key, reproducible on any engine and stable under
  * re-partitioning — which is what makes a 100 TB sample auditable in a
  * data-lineage review. (Contrast TABLESAMPLE/df.sample:
  * partition-seeded, so the sample changes with the physical layout.)
  */
object HashSelect {

  /** 32-bit uniform hash of a key column: uint32 in [0, 2^32) as LONG. */
  def u32(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  /** Integer selection threshold for a keep-rate in [0, 1]:
    * keep iff u32(key) < thr32(rate). */
  def thr32(rate: Column): Column =
    ceil(rate * lit(4294967296.0)).cast(LongType)

  /** keep-at-rate predicate: deterministic, integer-compared. */
  def selected(key: Column, rate: Column): Column = u32(key) < thr32(rate)

  /** u32 folded back to uniform [0,1) — for DISPLAY columns only; never
    * put this double on a driver-hashed output surface. */
  def u01(key: Column): Column = u32(key).cast("double") / lit(4294967296.0)

  // ---- DuckDB-oracle fragments (textual twins of the above) ----

  def u32Sql(keyExpr: String): String =
    s"CAST('0x' || substr(md5(CAST(($keyExpr) AS VARCHAR)), 1, 8) AS BIGINT)"

  def thr32Sql(rateExpr: String): String =
    s"CAST(ceil(($rateExpr) * 4294967296.0) AS BIGINT)"

  def u01Sql(keyExpr: String): String =
    s"(CAST(${u32Sql(keyExpr)} AS DOUBLE) / 4294967296.0)"
}
