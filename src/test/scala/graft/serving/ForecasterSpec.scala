package graft.serving

import org.scalatest.funsuite.AnyFunSuite

class ForecasterSpec extends AnyFunSuite {

  test("ARX recovers a linear trend") {
    val y = (1 to 50).map(i => 3.0 * i + 10.0).toArray
    val pred = new ArxForecaster(p = 2).predictNext(y, Array.empty)
    assert(math.abs(pred - (3.0 * 51 + 10.0)) < 1e-6)
  }

  test("ARX uses exogenous signal") {
    // y(t) = 2 * x(t) with pseudo-random x (not collinear with lags, so
    // the fit must put the weight on the exog coefficient)
    val x = (0 until 60).map(i => (i * 37 % 11).toDouble).toArray
    val y = x.map(_ * 2.0)
    val exog = x.map(Array(_))
    val pred = new ArxForecaster(p = 2, ridge = 1e-9).predictNext(y, exog)
    // next exog feature reuses the last observed x: x(59)=5 -> ~10
    assert(math.abs(pred - 2.0 * x.last) < 0.2)
  }

  test("deterministic across calls") {
    val y = Array(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 9.0)
    val f = new ArxForecaster(p = 2)
    assert(f.predictNext(y, Array.empty) == f.predictNext(y, Array.empty))
  }

  test("rejects too-short series") {
    intercept[IllegalArgumentException] {
      new ArxForecaster(p = 3).predictNext(Array(1.0, 2.0, 3.0), Array.empty)
    }
  }
}
