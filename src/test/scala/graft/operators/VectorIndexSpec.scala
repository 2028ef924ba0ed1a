package graft.operators

import graft.SparkSpec
import graft.sources.{Scratch, SnapshotStore}
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, sf(), "embeddings")

  test("build -> search -> frozen append -> search: lifecycle over the stored index") {
    val root = Scratch.processScoped("vecidx_spec", sf()) + "/lifecycle"
    Scratch.deleteRecursively(new java.io.File(root))
    val store = new SnapshotStore(spark, root)
    val base = emb.where(col("vec_id") % 5 =!= 0)
    val delta = emb.where(col("vec_id") % 5 === 0)
    val v1 = VectorIndex.buildPq(store, "ann", base, base,
      "vec_id", "embedding", m = 4, k = 8)

    // stored books round-trip the fit exactly
    val fit = Quantize.pqCodebooks(base, "vec_id", "embedding", m = 4, k = 8)
    val loaded = VectorIndex.loadPqBooks(store, "ann")
    assert(loaded.map(_.toSeq).toSeq == fit.map(_.toSeq).toSeq)

    val q = emb.where(col("vec_id") < 3)
    val r1 = VectorIndex.searchPq(store, "ann", q, k = 5, asOf = Some(v1))
    // v1 search only ever sees base-coded vectors
    assert(r1.where(col("nid") % 5 === 0).count() == 0)

    assert(VectorIndex.appendPq(store, "ann", delta, "vec_id", "embedding",
      txnId = 42L).nonEmpty)
    // redelivery converges: same txn id is a no-op, no duplicate codes
    assert(VectorIndex.appendPq(store, "ann", delta, "vec_id", "embedding",
      txnId = 42L).isEmpty)
    assert(store.read("ann_codes").count() == emb.count())
    assert(store.read("ann_codes").select("vec_id").distinct().count() == emb.count())

    // a search planned at v1 BEFORE the append still reads the v1
    // snapshot (manifest isolation)
    assert(VectorIndex.searchPq(store, "ann", q, k = 5, asOf = Some(v1))
      .where(col("nid") % 5 === 0).count() == 0)

    // v2 search sees appended vectors, and the appended codes equal a
    // fresh frozen-books encode (the books were never re-fit)
    val r2 = VectorIndex.searchPq(store, "ann", q, k = 5)
    assert(r2.count() == 3 * 5)
    val expectDelta = Quantize.pqEncode(delta, "vec_id", "embedding", fit)
      .select(col("vec_id"), col("codes"))
    val storedDelta = store.read("ann_codes").where(col("vec_id") % 5 === 0)
    assert(storedDelta.join(expectDelta,
      storedDelta("vec_id") === expectDelta("vec_id") &&
        storedDelta("codes") === expectDelta("codes")).count() == delta.count())
  }

  test("IVF lifecycle: frozen centroids, cells never move, appends land once") {
    val root = Scratch.processScoped("vecidx_spec", sf()) + "/ivf"
    Scratch.deleteRecursively(new java.io.File(root))
    val store = new SnapshotStore(spark, root)
    val base = emb.where(col("vec_id") % 5 =!= 0)
    val delta = emb.where(col("vec_id") % 5 === 0)
    val v1 = VectorIndex.buildIvf(store, "ivf", base, base,
      "vec_id", "embedding", nCells = 4)
    val cents = VectorIndex.loadIvfCents(store, "ivf")
    assert(cents.length == 4)
    // centroids come from the FIT SET only (no %5==0 ids among seeds)
    assert(cents.forall(_._1 % 5 != 0))
    assert(VectorIndex.appendIvf(store, "ivf", delta, "vec_id", "embedding",
      txnId = 9L).nonEmpty)
    assert(VectorIndex.appendIvf(store, "ivf", delta, "vec_id", "embedding",
      txnId = 9L).isEmpty)
    assert(store.read("ivf_cells").count() == emb.count())
    // base members' cell assignment is identical before and after the
    // append (frozen centroids: the index never reshuffles)
    val before = store.read("ivf_cells", Some(v1))
      .select(col("nid"), col("cell").as("c1"))
    val after = store.read("ivf_cells").select(col("nid"), col("cell").as("c2"))
    assert(before.join(after, Seq("nid"))
      .where(col("c1") =!= col("c2")).count() == 0)
    val q = emb.where(col("vec_id") < 3)
    val r1 = VectorIndex.searchIvf(store, "ivf", q, k = 5, nProbe = 2, asOf = Some(v1))
    assert(r1.where(col("nid") % 5 === 0).count() == 0)
    assert(VectorIndex.searchIvf(store, "ivf", q, k = 5, nProbe = 2).count() == 15)
  }
}
