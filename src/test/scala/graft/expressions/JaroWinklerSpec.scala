package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** JaroWinkler against DuckDB-probed reference values (the oracle
  * engine's jaro_winkler_similarity on the same pairs), interpreted vs
  * codegen agreement, metric properties, and the null contract.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, duckdb jaro_winkler_similarity(a, b)) — probed values
  private val ref = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("dwayne", "duane", 0.8400000000000001),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("crate", "trace", 0.7333333333333334),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro 0.6 ≤ 0.7 ⇒ no boost
    ("ABCy", "ABCx", 0.8833333333333334),
    ("ab", "ba", 0.0),                 // window 0: no matches at all
    ("x", "y", 0.0),
    ("a", "a", 1.0),
    ("aaaaa", "aaaaa", 1.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0))                     // DuckDB convention

  test("matches DuckDB reference values exactly (codegen path)") {
    val bad = ref.toDF("a", "b", "want")
      .withColumn("got", JaroWinkler(col("a"), col("b")))
      .where(col("got") =!= col("want") ||
        (col("got").isNull =!= col("want").isNull))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("static helper agrees with the column path (interpreted eval)") {
    ref.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b)) == want, s"($a,$b)")
    }
  }

  test("metric properties: symmetry, identity, range") {
    val rng = new scala.util.Random(3)
    val words = Seq.fill(60)(
      (0 until (1 + rng.nextInt(10))).map(_ => ('a' + rng.nextInt(5)).toChar).mkString)
    for (a <- words.take(20); b <- words.take(20)) {
      val ab = JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = JaroWinkler.similarity(UTF8String.fromString(b), UTF8String.fromString(a))
      assert(ab == ba, s"asymmetric on ($a,$b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }

  test("winkler boost: applied above 0.7 with shared prefix, capped at 4") {
    // identical 8-char tails, prefixes longer than 4 still boost by 4
    val a = "abcdefzz"
    val b = "abcdefyy"
    val j = JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    // jaro = (6/8 + 6/8 + 1)/3 = 5/6; boost l=4: 5/6 + 0.4*(1/6)
    assert(math.abs(j - (5.0 / 6 + 0.4 * (1.0 / 6))) < 1e-12)
  }

  test("null in, null out") {
    val out = Seq((Some("a"), None: Option[String]), (None, Some("b")),
        (Some("ab"), Some("ab")))
      .toDF("a", "b")
      .withColumn("s", JaroWinkler(col("a"), col("b")))
      .collect().map(r => r.isNullAt(2))
    assert(out.toSeq == Seq(true, true, false))
  }
}
