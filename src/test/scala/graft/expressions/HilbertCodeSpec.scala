package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HilbertCode against independently-computed reference values (the
  * Wikipedia xy2d walk run by hand in Python), interpreted vs codegen
  * agreement, curve properties, and null contract.
  */
class HilbertCodeSpec extends SparkSpec {
  import spark.implicits._

  // xy2d(1024, x, y) reference points
  private val ref = Seq(
    (0L, 0L, 0L), (1L, 0L, 1L), (1L, 1L, 2L), (0L, 1L, 3L),
    (2L, 0L, 14L), (5L, 3L, 28L),
    (1023L, 1023L, 699050L), (512L, 0L, 961194L), (0L, 512L, 262144L),
    (123L, 456L, 255375L), (777L, 333L, 831672L))

  test("matches the reference xy2d walk at bits=10 (codegen path)") {
    val got = ref.toDF("x", "y", "want")
      .withColumn("h", Layout10(col("x"), col("y")))
      .where(col("h") =!= col("want")).count()
    assert(got == 0)
  }

  private def Layout10(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    graft.operators.Layout.hilbertCode(x, y, bits = 10)

  test("interpreted eval agrees with codegen") {
    ref.foreach { case (x, y, want) =>
      val e = HilbertCode(
        org.apache.spark.sql.catalyst.expressions.Literal(x),
        org.apache.spark.sql.catalyst.expressions.Literal(y), 10)
      assert(e.eval(null) == want, s"($x,$y)")
    }
  }

  test("bijection: all 2^(2*bits) cells map to distinct codes covering [0, 4^bits)") {
    val bits = 5
    val n = 1 << bits
    val df = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
      .select(graft.operators.Layout.hilbertCode(col("x"), col("y"), bits).as("h"))
    val stats = df.agg(countDistinct(col("h")), min(col("h")), max(col("h"))).head()
    assert(stats.getLong(0) == n.toLong * n)
    assert(stats.getLong(1) == 0L && stats.getLong(2) == n.toLong * n - 1)
  }

  test("unit steps: consecutive codes are grid neighbours (the locality property)") {
    val bits = 4
    val n = 1 << bits
    val pts = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("h", graft.operators.Layout.hilbertCode(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    pts.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("null in, null out") {
    val out = Seq((Some(1L), None: Option[Long]), (None, Some(2L)),
        (Some(3L), Some(4L)))
      .toDF("x", "y")
      .withColumn("h", graft.operators.Layout.hilbertCode(col("x"), col("y"), 10))
      .collect().map(r => r.isNullAt(2))
    assert(out.toSeq == Seq(true, true, false))
  }
}
