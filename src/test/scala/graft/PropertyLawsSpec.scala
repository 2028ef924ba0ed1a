package graft

import graft.functions.{Scored, TopKBySim}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the hand-written kernels, checked against
  * straightforward reference implementations on randomized inputs
  * (fixed scalacheck seed policy: default RNG, 200 cases each — pure
  * JVM evaluation, no Spark jobs).
  */
class PropertyLawsSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val scoredGen: Gen[List[Scored]] = for {
    n <- Gen.choose(0, 60)
    sims <- Gen.listOfN(n, Gen.choose(-4, 4).map(_ / 4.0)) // few distinct values => many ties
    nids <- Gen.pick(n, 0L until 1000L)
  } yield sims.zip(nids).map { case (s, id) => Scored(s, id) }

  private def refTopK(xs: List[Scored], k: Int): List[Scored] =
    xs.sortBy(s => (-s.sim, s.nid)).take(k)

  test("TopKBySim equals sort-take-k for any input") {
    check("topk", Prop.forAll(scoredGen, Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopKBySim(k)
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      got == refTopK(xs, k)
    })
  }

  test("TopKBySim merge is split-point invariant") {
    check("topk-merge", Prop.forAll(scoredGen, Gen.choose(1, 6), Gen.choose(0, 60)) {
      (xs, k, cut0) =>
        val agg = new TopKBySim(k)
        val cut = math.min(cut0, xs.length)
        val (a, b) = xs.splitAt(cut)
        val merged = agg.finish(agg.merge(
          a.foldLeft(agg.zero)(agg.reduce),
          b.foldLeft(agg.zero)(agg.reduce)))
        merged == refTopK(xs, k)
    })
  }

  test("TopKBuf (native aggregate buffer) equals sort-take-k under any split + serde") {
    check("topkbuf", Prop.forAll(scoredGen, Gen.choose(1, 8), Gen.choose(0, 60)) {
      (xs, k, cut0) =>
        val agg = graft.expressions.TopKSimAgg(
          org.apache.spark.sql.catalyst.expressions.Literal(0.0),
          org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
        val cut = math.min(cut0, xs.length)
        val (l, r) = xs.splitAt(cut)
        def fill(part: List[Scored]) = {
          val b = agg.createAggregationBuffer()
          part.foreach(s => b.insert(s.sim, s.nid))
          b
        }
        // round-trip one side through serialize/deserialize (the shuffle
        // boundary), then merge — must still equal sort-take-k
        val merged = agg.merge(fill(l), agg.deserialize(agg.serialize(fill(r))))
        val got = (0 until merged.n).map(i => Scored(merged.sims(i), merged.nids(i))).toList
        got == refTopK(xs, k)
    })
  }

  private val hashesGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1000000006L))

  test("MinHashSigs equals the per-permutation min reference") {
    val P = 1000000007L
    check("minhash", Prop.forAll(hashesGen) { hs =>
      val expr = graft.expressions.MinHashSigs(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 32)
      val out = expr.nullSafeEval(new GenericArrayData(hs.toArray))
      if (hs.isEmpty) out == null
      else {
        val got = out.asInstanceOf[GenericArrayData].toLongArray().toList
        val ref = (0 until 32).map { i =>
          val a = 2L * i + 1
          val b = (0x9E3779B9L * (i + 1)) % P
          hs.map(h => (a * h + b) % P).min
        }.toList
        got == ref
      }
    })
  }

  test("HhBuf: heavy-hitter superset + CMS upper bound survive merges and serde") {
    val hhGen = for {
      n <- Gen.choose(0, 400)
      // skewed stream: a few dominant keys + a tail
      keys <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.choose(0L, 2L), 3 -> Gen.choose(3L, 10L),
        2 -> Gen.choose(11L, 60L)))
      k <- Gen.choose(2, 12)
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (keys, k, cuts)
    check("hhbuf", Prop.forAll(hhGen) { case (keys, k, cuts) =>
      val agg = graft.expressions.HeavyHittersAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
      val bounds = (0 +: cuts.sorted :+ keys.length).distinct.sorted
      val parts0 = bounds.zip(bounds.tail).map { case (a, b) => keys.slice(a, b) }
      // an empty stream with coincident cuts yields zero slices — still
      // exercise one (empty) buffer
      val parts = if (parts0.isEmpty) Seq(Nil) else parts0
      // independent partial buffers, each round-tripped through the
      // aggregate's serde (the partial/final exchange boundary), then
      // merged in order
      val bufs = parts.map { p =>
        val b = new graft.expressions.HhBuf(k, 0.01, 0.95)
        p.foreach(b.add(_))
        agg.deserialize(agg.serialize(b))
      }
      val total = bufs.head
      bufs.tail.foreach(total.merge)
      val trueCounts = keys.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      val n = keys.length.toLong
      // Misra-Gries law: any key with count > n/(k+1) must survive as
      // a candidate, whatever the merge tree did
      val supersetOk = trueCounts.forall { case (key, c) =>
        c * (k + 1) <= n || total.counters.containsKey(key)
      }
      // CMS law: estimates never undercount
      val cmsOk = trueCounts.forall { case (key, c) =>
        total.cms.estimateCount(key) >= c
      }
      supersetOk && cmsOk && total.counters.size <= k && total.n == n
    })
  }

  test("HhBuf serde round-trips string keys past writeUTF's 64KB limit") {
    val agg = graft.expressions.HeavyHittersAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(""), 4)
    val big = "x" * 70000 // > 65535 UTF-8 bytes: would kill writeUTF
    val b = new graft.expressions.HhBuf(4, 0.01, 0.95)
    b.add(big); b.add(big); b.add("small")
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.n == 3)
    assert(rt.counters.get(big) == 2L)
    assert(rt.counters.get("small") == 1L)
  }

  test("SimHash64 equals the bit-majority reference") {
    check("simhash", Prop.forAll(Gen.listOf(Gen.long)) { hs =>
      val expr = graft.expressions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(1L))
      val got = expr.nullSafeEval(new GenericArrayData(hs.toArray)).asInstanceOf[Long]
      val ref = (0 until 64).map { i =>
        val cnt = hs.map(h => (((h >>> i) & 1L).toInt << 1) - 1).sum
        if (cnt > 0) 1L << i else 0L
      }.foldLeft(0L)(_ | _)
      got == ref
    })
  }
}
