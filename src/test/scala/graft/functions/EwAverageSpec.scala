package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The speed layer's (x+v)/2 fold (reference
  * twitterConsumerStream.py:100-106): order-dependent, != arithmetic
  * mean; both the column fold and the streaming step must replay the
  * painless-script semantics exactly.
  */
class EwAverageSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vs: Seq[Double]): Double =
    vs.tail.foldLeft(vs.head)((a, v) => (a + v) / 2.0)

  test("column fold equals sequential reference") {
    val vs = Seq(10.0, 20.0, 30.0, 2.0)
    val got = Seq(vs).toDF("arr")
      .select(EwAverage.ewFold(col("arr"))).as[Double].head()
    assert(got == reference(vs)) // exact: same double ops
  }

  test("single element returns itself; empty returns null") {
    assert(Seq(Seq(7.5)).toDF("arr").select(EwAverage.ewFold(col("arr"))).as[Double].head() == 7.5)
    assert(Seq(Seq.empty[Double]).toDF("arr")
      .select(EwAverage.ewFold(col("arr"))).collect().head.isNullAt(0))
  }

  test("streaming step composes to the same fold") {
    val vs = Seq(1.0, 5.0, 9.0)
    val stepped = vs.foldLeft(Option.empty[Double])((st, v) => Some(EwAverage.step(st, v)))
    assert(stepped.contains(reference(vs)))
  }

  test("typed Aggregator (UDAF form) equals the fold, order restored from seq") {
    val data = Seq((3L, 30.0), (1L, 10.0), (2L, 20.0), (4L, 2.0)) // shuffled arrival
    val ds = spark.createDataset(data)
    val got = ds.groupByKey(_ => 1)
      .agg(new EwAverage.EwAgg().toColumn)
      .collect().head._2
    assert(got == reference(Seq(10.0, 20.0, 30.0, 2.0))) // seq order, not arrival
  }

  test("property: bounded by min/max for nonneg inputs") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 1000.0))) { vs =>
      val ew = reference(vs)
      ew >= vs.min - 1e-9 && ew <= vs.max + 1e-9
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
