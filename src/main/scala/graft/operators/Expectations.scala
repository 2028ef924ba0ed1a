package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the dbt-test /
  * Deequ / Great-Expectations shape as a library call: describe the
  * contract, get back one (check, n_violations, ok) row per
  * expectation.
  *
  * Execution shape, not one-query-per-check: every ROW-LEVEL check
  * (null, range, accepted values) folds into a SINGLE aggregate pass
  * over the table — adding a check costs one more conditional sum in
  * the same scan, the way a 100 TB DQ gate must work. Set-level checks
  * cost what they inherently cost: uniqueness one keyed agg (surplus
  * rows beyond the first per key), referential integrity one left-anti
  * probe of the dimension (broadcast when small). Everything unions
  * into one tiny report frame.
  */
object Expectations {

  sealed trait Check
  /** Violation: the column is NULL. */
  final case class NotNull(column: String) extends Check
  /** Violation: NULL or outside [lo, hi] (a contract says the value IS
    * in range; absent is just as broken as out-of-range). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** Violation: NULL or a value outside the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check
  /** Violation count: surplus rows beyond the first per key tuple. */
  final case class Unique(columns: Seq[String]) extends Check
  /** Violation: non-null key with no match in the dimension. */
  final case class ForeignKey(column: String, dim: DataFrame, dimColumn: String)
    extends Check

  private def rowPredicate(c: Check): Option[(String, Column)] = c match {
    case NotNull(col0) =>
      Some(s"not_null:$col0" -> col(col0).isNull)
    case InRange(col0, lo, hi) =>
      Some(s"in_range:$col0" ->
        (col(col0).isNull || col(col0) < lo || col(col0) > hi))
    case AcceptedValues(col0, vs) =>
      Some(s"accepted_values:$col0" ->
        (col(col0).isNull || !col(col0).isin(vs: _*)))
    case _ => None
  }

  /** The per-row violation predicate (OR of all ROW-LEVEL checks) —
    * the routing column a quarantine sink splits on: `true` rows go to
    * quarantine, `false` rows pass. Set-level checks (unique, FK) have
    * no single-row meaning and are ignored here.
    */
  def violationGate(checks: Seq[Check]): Column =
    checks.flatMap(rowPredicate).map(_._2)
      .reduceOption(_ || _).getOrElse(lit(false))

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    val rowChecks = checks.flatMap(rowPredicate)
    val rowReport: Option[DataFrame] = Option.when(rowChecks.nonEmpty) {
      val aggs = rowChecks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"_v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(rowChecks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check"),
          coalesce(col(s"_v$i"), lit(0L)).as("n_violations")) // empty df => null sums
      }: _*)).as("_r")).select(col("_r.check"), col("_r.n_violations"))
    }
    val setReports: Seq[DataFrame] = checks.collect {
      case Unique(cols0) =>
        val surplus = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
          .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("n_violations"))
        surplus.select(lit(s"unique:${cols0.mkString(",")}").as("check"),
          col("n_violations"))
      case ForeignKey(col0, dim, dimCol) =>
        df.where(col(col0).isNotNull)
          .join(dim.select(col(dimCol).as(col0)).distinct(), Seq(col0), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(s"foreign_key:$col0").as("check"), col("n_violations"))
    }
    val all = (rowReport.toSeq ++ setReports)
    require(all.nonEmpty, "no checks given")
    all.reduce(_ unionByName _)
      .withColumn("ok", col("n_violations") === 0L)
  }
}
