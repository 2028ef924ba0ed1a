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

  test("SarimaxLite(p, d=0, P=0) coincides with ArxForecaster(p)") {
    val y = (0 until 40).map(i => math.sin(i * 0.7) * 5 + i * 0.3 + 20).toArray
    val x = (0 until 40).map(i => Array((i * 13 % 7).toDouble)).toArray
    val a = new ArxForecaster(p = 3).predictNext(y, x)
    val b = new SarimaxLiteForecaster(p = 3, d = 0, bigP = 0).predictNext(y, x)
    assert(a == b)
  }

  test("differencing recovers a quadratic trend that plain AR misses") {
    val y = (1 to 60).map(i => 0.5 * i * i).toArray
    val truth = 0.5 * 61 * 61
    val pred = new SarimaxLiteForecaster(p = 1, d = 2).predictNext(y, Array.empty)
    assert(math.abs(pred - truth) < 1e-4, s"pred=$pred truth=$truth")
  }

  test("seasonal lags converge on a trend + weekly-pattern series") {
    // y(t) = 0.5t + pattern[t mod 7]: first difference is exactly
    // periodic with period 7, so d=1 + one seasonal AR lag at s=7
    // nails the one-step forecast
    val pattern = Array(4.0, -2.0, 7.0, 1.0, -5.0, 3.0, 0.0)
    val n = 70
    val y = (0 until n).map(t => 0.5 * t + pattern(t % 7)).toArray
    val truth = 0.5 * n + pattern(n % 7)
    val pred = new SarimaxLiteForecaster(p = 1, d = 1, bigP = 1, s = 7).predictNext(y, Array.empty)
    assert(math.abs(pred - truth) < 0.15, s"pred=$pred truth=$truth")
    // plain ARX(1) on the same series is far off the seasonal step
    val arx = new ArxForecaster(p = 1).predictNext(y, Array.empty)
    assert(math.abs(arx - truth) > math.abs(pred - truth))
  }

  // deterministic pseudo-gaussian innovations (LCG; sum of 3 uniforms,
  // centered) — no RNG state, reproducible across runs
  private def innovations(n: Int): Array[Double] = {
    var seed = 12345L
    def next(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ((seed >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    Array.fill(n)(next() + next() + next())
  }

  test("CSS iteration recovers known ARMA(1,1) coefficients") {
    // z_t = 0.6 z_{t-1} + e_t + 0.4 e_{t-1}
    val e = innovations(800)
    val z = new Array[Double](800)
    z(0) = e(0)
    for (t <- 1 until 800) z(t) = 0.6 * z(t - 1) + e(t) + 0.4 * e(t - 1)
    val (ar, ma) = new SarimaxLiteForecaster(p = 1, q = 1).arMaEstimates(z)
    assert(math.abs(ar(0) - 0.6) < 0.1, s"phi=${ar(0)}")
    assert(math.abs(ma(0) - 0.4) < 0.15, s"theta=${ma(0)}")
  }

  test("MA term improves one-step error on an ARMA series vs pure AR") {
    val e = innovations(400)
    val z = new Array[Double](400)
    z(0) = e(0)
    for (t <- 1 until 400) z(t) = 0.5 * z(t - 1) + e(t) + 0.7 * e(t - 1)
    // one-step-ahead backtest over the last 50 points
    def mse(f: Forecaster): Double = {
      val errs = (350 until 400).map { t =>
        val pred = f.predictNext(z.take(t), Array.empty)
        val d = pred - z(t); d * d
      }
      errs.sum / errs.length
    }
    val withMa = mse(new SarimaxLiteForecaster(p = 1, q = 1))
    val arOnly = mse(new SarimaxLiteForecaster(p = 1, q = 0))
    assert(withMa < arOnly, s"MA(1) mse=$withMa vs AR-only mse=$arOnly")
  }

  test("q=0 path is unchanged by the CSS machinery (coincides with ARX)") {
    val y = (0 until 40).map(i => math.sin(i * 0.9) * 3 + i * 0.1).toArray
    val a = new ArxForecaster(p = 2).predictNext(y, Array.empty)
    val b = new SarimaxLiteForecaster(p = 2, q = 0).predictNext(y, Array.empty)
    assert(a == b)
  }

  test("too-short series for differencing fails with the intended message") {
    val ex = intercept[IllegalArgumentException] {
      new SarimaxLiteForecaster(p = 1, d = 3).predictNext(Array(1.0, 2.0, 3.0), Array.empty)
    }
    assert(ex.getMessage.contains("observations"), ex.getMessage)
  }

  test("seasonal forecaster uses exogenous signal on the differenced scale") {
    // z(t) = first difference = 2 * x(t); exog carries the full signal
    val x = (0 until 50).map(i => (i * 29 % 13).toDouble).toArray
    val y = x.scanLeft(100.0)((acc, v) => acc + 2.0 * v).drop(1).toArray
    val exog = x.map(Array(_))
    val pred = new SarimaxLiteForecaster(p = 1, d = 1, ridge = 1e-9).predictNext(y, exog)
    // next diff ~ 2 * last x -> y_next ~ y_last + 2 * x_last
    assert(math.abs(pred - (y.last + 2.0 * x.last)) < 0.5, s"pred=$pred")
  }
}
