package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns, built from codegen'd higher-order functions
  * (zip_with / aggregate) — no UDF, no MLlib Vector boxing on the hot
  * path.
  *
  * Arithmetic is done in double after casting, folding left-to-right in
  * element order, so results are deterministic and reproducible in the
  * DuckDB oracle.
  */
object VectorFns {

  def toDoubleArr(a: Column): Column = transform(a, _.cast("double"))

  /** Left-to-right fold of the element-wise product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => x * y),
      lit(0.0), (s, v) => s + v)

  def norm2(a: Column): Column = dot(a, a)

  def l2Norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity = dot / sqrt(|a|^2 * |b|^2). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, v) => s + v))
}
