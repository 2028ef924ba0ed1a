package graft.serving

/** One-step-ahead forecaster with exogenous regressors — the serving
  * layer's capability slot (reference: airflow/dags/Serving_layer/
  * prediction.py:11-20,64-76, a pickled pmdarima SARIMAX). No statsmodels
  * offline, so the default implementation is a ridge-regularized linear
  * AR(p)-with-exogenous model solved by normal equations in pure Scala.
  * Driver-side by design: the input is the O(days) collected series, never
  * a distributed dataset (SURVEY.md §3.3 — the reference collects the
  * same way via toPandas()).
  */
trait Forecaster {
  /** @param y    target series, time-ordered
    * @param exog exogenous rows aligned with y (may be empty)
    * @return one-step-ahead prediction for t = y.length
    */
  def predictNext(y: Array[Double], exog: Array[Array[Double]]): Double
}

/** Linear AR(p) + exogenous regression, ridge-regularized, fit by
  * Gaussian elimination on the normal equations. Deterministic.
  */
class ArxForecaster(p: Int = 2, ridge: Double = 1e-6) extends Forecaster {

  override def predictNext(y: Array[Double], exog: Array[Array[Double]]): Double = {
    val n = y.length
    require(n > p, s"need more than $p observations, got $n")
    val nExog = if (exog.nonEmpty) exog(0).length else 0
    val dim = 1 + p + nExog // intercept + lags + exog
    // rows t = p .. n-1: predict y(t) from [1, y(t-1..t-p), exog(t)]
    val rows = (p until n).map { t =>
      val x = new Array[Double](dim)
      x(0) = 1.0
      for (j <- 1 to p) x(j) = y(t - j)
      for (j <- 0 until nExog) x(1 + p + j) = exog(t)(j)
      (x, y(t))
    }
    val xtx = Array.fill(dim, dim)(0.0)
    val xty = new Array[Double](dim)
    for ((x, yt) <- rows; i <- 0 until dim) {
      xty(i) += x(i) * yt
      for (j <- 0 until dim) xtx(i)(j) += x(i) * x(j)
    }
    for (i <- 0 until dim) xtx(i)(i) += ridge
    val beta = solve(xtx, xty)
    // feature row for t = n
    val xNext = new Array[Double](dim)
    xNext(0) = 1.0
    for (j <- 1 to p) xNext(j) = y(n - j)
    for (j <- 0 until nExog)
      xNext(1 + p + j) = if (exog.length > n - 1) exog(n - 1)(j) else exog.last(j)
    (0 until dim).map(i => beta(i) * xNext(i)).sum
  }

  /** In-place Gaussian elimination with partial pivoting. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone())
    val v = b.clone()
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tv = v(col); v(col) = v(piv); v(piv) = tv
      val d = m(col)(col)
      require(math.abs(d) > 1e-300, "singular system")
      for (r <- col + 1 until n) {
        val f = m(r)(col) / d
        if (f != 0.0) {
          for (c <- col until n) m(r)(c) -= f * m(col)(c)
          v(r) -= f * v(col)
        }
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = v(r)
      for (c <- r + 1 until n) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    x
  }
}
