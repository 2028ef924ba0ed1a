package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class StreamSamplerSpec extends AnyFunSuite {

  test("reservoir fold: order- and batching-invariant, k-bounded") {
    val ids = (1L to 100L).toVector
    val k = 7
    val oneShot = StreamSampler.foldReservoir(Vector.empty, ids.iterator, k)
    assert(oneShot.size == k)
    // any batching converges to the same set
    val (a, b) = ids.splitAt(33)
    val twoShot = StreamSampler.foldReservoir(
      StreamSampler.foldReservoir(Vector.empty, a.iterator, k), b.iterator, k)
    assert(twoShot == oneShot)
    // any ORDER converges too
    val shuffled = ids.sortBy(id => (id * 48271L) % 97L)
    assert(StreamSampler.foldReservoir(Vector.empty, shuffled.iterator, k) == oneShot)
    // the set really is the k smallest priorities
    val want = ids.map(id => (StreamSampler.lcgFrac(id), id)).sorted.take(k)
    assert(oneShot == want)
  }

  test("at-least-once redelivery is idempotent (no duplicate members)") {
    val k = 5
    val first = StreamSampler.foldReservoir(Vector.empty, (1L to 20L).iterator, k)
    val redelivered = StreamSampler.foldReservoir(first, (1L to 20L).iterator, k)
    assert(redelivered == first)
    assert(redelivered.map(_._2).distinct.size == k)
  }
}
