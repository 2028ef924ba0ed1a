package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private val toy = Seq(
    // y = 1 iff x1 > 0 (cleanly separable along x1)
    (1L, 2.0, 0.1, 1.0), (2L, 1.5, -0.2, 1.0), (3L, 3.0, 0.3, 1.0),
    (4L, -2.0, 0.2, 0.0), (5L, -1.5, -0.1, 0.0), (6L, -3.0, 0.0, 0.0)
  ).toDF("id", "x1", "x2", "y")

  test("GD separates a separable toy set within a few iterations") {
    val w = LogReg.train(toy, Seq("x1", "x2"), "y", lr = 1.0, iters = 20)
    val got = LogReg.score(toy, Seq("x1", "x2"), w)
      .select(col("id"), col("pred")).as[(Long, Boolean)].collect().toMap
    assert((1L to 3L).forall(got(_)) && (4L to 6L).forall(!got(_)), got.toString)
    // the separating direction is along +x1
    assert(w(1) > 0.5, w.mkString(","))
  }

  test("one GD step matches the hand-computed gradient") {
    // from w = 0: sigmoid(0) = 0.5, err = 0.5 - y
    val df = Seq((1.0, 1.0), (2.0, 0.0)).toDF("x1", "y")
    val w = LogReg.train(df, Seq("x1"), "y", lr = 0.5, iters = 1)
    // g0 = (0.5-1) + (0.5-0) = 0; g1 = -0.5*1 + 0.5*2 = 0.5
    // w0 = 0 - 0.5*0/2 = 0; w1 = 0 - 0.5*0.5/2 = -0.125
    assert(w(0) == 0.0 && w(1) == -0.125, w.mkString(","))
  }

  test("trajectory is deterministic across repartitionings") {
    val a = LogReg.train(toy.repartition(1), Seq("x1", "x2"), "y", iters = 3)
    val b = LogReg.train(toy.repartition(7), Seq("x1", "x2"), "y", iters = 3)
    assert(a.toSeq == b.toSeq)
  }
}
