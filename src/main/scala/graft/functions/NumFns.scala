package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable numeric helpers.
  *
  * Rounding a double that was produced by an order-dependent aggregation
  * (sum/avg over a shuffle) is not reproducible across engines: the
  * engines' doubles differ in the last ulp, and their ROUND
  * implementations differ near .5 boundaries. `stableRound` fixes both:
  * format to 15 significant digits (ulp noise vanishes), then parse as a
  * decimal at the target scale (exact HALF_UP). The DuckDB oracle mirrors
  * it with printf('%.15g') + CAST(AS DECIMAL) — see SqlFragments.r15.
  *
  * Doubles produced by *identical* per-row arithmetic in both engines are
  * bit-equal and are emitted raw instead.
  */
object NumFns {
  def stableRound(c: Column, scale: Int): Column =
    // null-preserving: format_string prints a NULL argument as the
    // string "null" (which then fails the decimal cast), while DuckDB's
    // printf propagates NULL — so r15(NULL) is NULL and this must be too
    // (window frames over leading-NULL gains hit this, q107)
    when(c.isNull, lit(null).cast("double"))
      .otherwise(format_string("%.15g", c).cast(s"decimal(38,$scale)").cast("double"))
}
