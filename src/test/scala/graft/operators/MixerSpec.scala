package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixerSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(counts: Map[String, Int]) =
    counts.toSeq.sorted.flatMap { case (k, n) => (0 until n).map(i => (s"$k$i".hashCode.toLong.abs, k)) }
      .zipWithIndex.map { case ((_, k), i) => (i.toLong, k) }
      .toDF("id", "key")

  test("tau=1 keeps the natural distribution: exactly one copy per row") {
    val df = mkDf(Map("a" -> 50, "b" -> 10))
    val out = Mixer.temperatureResample(df, "key", "id", tau = 1.0)
    assert(out.count() == 60)
    assert(out.groupBy("copy_id").count().collect().map(r => r.getLong(0)).toSet == Set(1L))
  }

  test("tau=0 fully flattens: every group replicated to ~n_max in expectation") {
    val df = mkDf(Map("a" -> 200, "b" -> 50))
    val out = Mixer.temperatureResample(df, "key", "id", tau = 0.0)
    val byKey = out.groupBy("key").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("a") == 200)
    // rate_b = 4.0 exactly -> deterministically 4 copies each
    assert(byKey("b") == 200)
  }

  test("tau=0.5 up-samples the tail sublinearly and deterministically") {
    val df = mkDf(Map("a" -> 100, "b" -> 25))
    val out1 = Mixer.temperatureResample(df, "key", "id", tau = 0.5)
    val out2 = Mixer.temperatureResample(df.repartition(7), "key", "id", tau = 0.5)
    // rate_b = sqrt(4) = 2 exactly; rate_a = 1
    val byKey = out1.groupBy("key").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("a") == 100 && byKey("b") == 50)
    // partitioning-invariant: LCG keys off the id, not the partition
    assert(out1.orderBy("id", "copy_id").collect().toSeq ==
      out2.orderBy("id", "copy_id").collect().toSeq)
  }

  test("fractional rates replicate within 3 sigma of the expectation") {
    val df = mkDf(Map("a" -> 400, "b" -> 200)) // rate_b = sqrt(2) ~ 1.414
    val out = Mixer.temperatureResample(df, "key", "id", tau = 0.5)
    val nB = out.where($"key" === "b").count()
    val exp = 200 * math.sqrt(2.0)
    val sigma = math.sqrt(200 * 0.414 * 0.586)
    assert(math.abs(nB - exp) <= 3 * sigma, s"nB=$nB exp=$exp")
  }

  test("exactKPerGroup returns exactly k rows per group, deterministically") {
    val df = mkDf(Map("a" -> 50, "b" -> 30, "c" -> 5))
    val out1 = Mixer.exactKPerGroup(df, "key", "id", k = 10)
    val byKey = out1.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a" -> 10, "b" -> 10, "c" -> 5)) // undersized group kept whole
    val out2 = Mixer.exactKPerGroup(df.repartition(5), "key", "id", k = 10)
    assert(out1.orderBy("id").collect().toSeq == out2.orderBy("id").collect().toSeq)
  }

  test("exactKPerGroup plans through WindowGroupLimit (no full-group sort buffering)") {
    val df = mkDf(Map("a" -> 200, "b" -> 100))
    val out = Mixer.exactKPerGroup(df, "key", "id", k = 5)
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      out.queryExecution.executedPlan.toString)
  }

  test("rates join broadcasts; the corpus is never shuffled") {
    val df = mkDf(Map("a" -> 100, "b" -> 30))
    val out = Mixer.temperatureResample(df, "key", "id", tau = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("shardShuffle: uniform-ish shards, contiguous positions, partitioning-invariant") {
    val ids = (0L until 1000L).toDF("id")
    val got = Mixer.shardShuffle(ids, "id", nShards = 8)
      .select("id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1000)
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // roughly uniform (LCG over consecutive ids): no shard degenerate
    assert(byShard.values.forall(s => s.length > 60 && s.length < 190),
      byShard.view.mapValues(_.length).toMap.toString)
    // positions are exactly 1..n within each shard
    byShard.values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1L to s.length).toSeq)
    }
    // in-shard order is NOT id order (the whole point of the shuffle)
    assert(byShard.values.exists(s => s.sortBy(_._3).map(_._1).toSeq != s.map(_._1).sorted.toSeq))
    // repartitioning the input changes nothing
    val again = Mixer.shardShuffle(ids.repartition(13), "id", nShards = 8)
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect()
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("stratifiedSample: exact budget, Hamilton allocation within 1 of quota") {
    val df = mkDf(Map("a" -> 300, "b" -> 150, "c" -> 50, "d" -> 7))
    val got = Mixer.stratifiedSample(df, "key", "id", budget = 100L)
      .select("key", "id").as[(String, Long)].collect()
    assert(got.length == 100)
    val byKey = got.groupBy(_._1).view.mapValues(_.length).toMap
    val total = 507.0
    Map("a" -> 300, "b" -> 150, "c" -> 50, "d" -> 7).foreach { case (k, n) =>
      val quota = 100.0 * n / total
      val a = byKey.getOrElse(k, 0)
      assert(a >= math.floor(quota) && a <= math.ceil(quota),
        s"$k alloc $a outside [floor,ceil] of quota $quota")
    }
  }

  test("stratifiedSample: caps at the stratum size and stays deterministic") {
    // budget larger than one stratum's population: alloc > n would be
    // unsatisfiable; Hamilton gives the small stratum its full quota
    val df = mkDf(Map("big" -> 400, "tiny" -> 3))
    val got = Mixer.stratifiedSample(df, "key", "id", budget = 200L)
      .select("key", "id").as[(String, Long)].collect()
    val byKey = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byKey("tiny") <= 3)
    val again = Mixer.stratifiedSample(df.repartition(9), "key", "id", budget = 200L)
      .select("key", "id").as[(String, Long)].collect()
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("weightedSample: exact k, non-positive weights never drawn, repartition-stable") {
    val df = (1L to 500L).map(i => (i, if (i % 50 == 0) 0.0 else i.toDouble))
      .toDF("id", "w")
    val got = Mixer.weightedSample(df, "id", "w", k = 40)
      .select("id").as[Long].collect()
    assert(got.length == 40 && got.distinct.length == 40)
    assert(got.forall(_ % 50 != 0), "zero-weight rows were drawn")
    val again = Mixer.weightedSample(df.repartition(11), "id", "w", k = 40)
      .select("id").as[Long].collect()
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("weightedSample: heavy weights dominate the draw (ES distribution sanity)") {
    // 10 rows at weight 1000 vs 490 at weight 1: the heavy rows should
    // essentially always all be in a 40-row sample
    val df = (1L to 500L).map(i => (i, if (i <= 10) 1000.0 else 1.0)).toDF("id", "w")
    val got = Mixer.weightedSample(df, "id", "w", k = 40)
      .select("id").as[Long].collect()
    assert((1L to 10L).count(got.contains) >= 9,
      s"heavy rows missing from ${got.sorted.take(20).mkString(",")}")
  }

  test("epochPlan: shares, fractional epochs, and the repeat cap") {
    val docs = (Seq.fill(10)(("big", 100L)) ++ Seq.fill(2)(("small", 10L)))
      .toDF("src", "nt")
    val w = Seq(("big", 0.5), ("small", 0.5)).toDF("src", "w")
    val got = Mixer.epochPlan(docs, "src", col("nt"), w, "src", "w",
        budget = 1000L, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("epochs"),
          r.getAs[Boolean]("clamped"), r.getAs[Double]("effective_tokens"))))
      .toMap
    // big: 500 planned over 1000 avail -> 0.5 epochs, no clamp
    assert(got("big") == ((1000L, 0.5, false, 500.0)))
    // small: 500 planned over 20 avail -> raw 25 epochs, clamped to 4
    assert(got("small") == ((20L, 4.0, true, 80.0)))
  }

  test("assignSplits: boundary math matches the LCG, assignment is append-stable") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val got = Mixer.assignSplits(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def u(id: Long) = ((id * 1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0
    got.foreach { case (id, s) =>
      val want = if (u(id) < 0.8) "train" else if (u(id) < 0.9) "val" else "test"
      assert(s == want, s"id $id: $s != $want (u=${u(id)})")
    }
    // growth stability: the same ids keep their split in a bigger frame
    val grown = Mixer.assignSplits((0L until 2000L).toDF("id"), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    // rough proportions
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 700 && n("train") < 900, n.toString)
  }

  test("groupAwareSplits: a cluster never straddles a split boundary") {
    import spark.implicits._
    val docs = (0L until 300L).toDF("doc_id")
    // chain clusters {0,1,2}, {10,11}, plus a long chain 100..104 —
    // min-id reps 0, 10, 100; everything else is a singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L),
      (100L, 101L), (101L, 102L), (102L, 103L), (103L, 104L))
      .toDF("a", "b")
    val got = Mixer.groupAwareSplits(docs, "doc_id", pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def u(id: Long) = ((id * 1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0
    def splitOf(id: Long) =
      if (u(id) < 0.8) "train" else if (u(id) < 0.9) "val" else "test"
    // clustered docs: group = min id of the component, split follows it
    Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L,
      100L -> 100L, 101L -> 100L, 104L -> 100L).foreach { case (id, g) =>
      assert(got(id) == ((g, splitOf(g))), s"doc $id")
    }
    // singletons group by their own id == assignSplits' assignment
    assert(got(42L) == ((42L, splitOf(42L))))
    // the leakage invariant itself: every cluster maps to ONE split
    val comps = Map(0L -> Seq(0L, 1L, 2L), 10L -> Seq(10L, 11L),
      100L -> (100L to 104L))
    comps.foreach { case (_, members) =>
      assert(members.map(got(_)._2).toSet.size == 1)
    }
  }

  test("capPerKey: audit frame, exact cap, partitioning-invariant ranks") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, s"d${i % 2}")).toDF("id", "key")
    val out = Mixer.capPerKey(df, "key", "id", cap = 5)
    assert(out.count() == 40) // every row emitted, kept and rejected
    val kept = out.where(col("kept")).groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("d0" -> 5L, "d1" -> 5L))
    // ranks are a permutation of 1..n per key and match the LCG order
    val ranks = out.where(col("key") === "d0").collect()
      .map(r => r.getAs[Long]("pick_rank")).sorted
    assert(ranks.toSeq == (1L to 20L))
    val again = Mixer.capPerKey(df.repartition(7), "key", "id", cap = 5)
    assert(out.orderBy("key", "id").collect().toSeq ==
      again.orderBy("key", "id").collect().toSeq)
  }

  test("lengthBucketedBatches: bucket/batch arithmetic and padded cost") {
    import spark.implicits._
    // 20 rows of length 10 (bucket 0) and 3 rows of length 35 (bucket 2)
    val df = ((0L until 20L).map(i => (i, 10L)) ++
      Seq((100L, 35L), (101L, 33L), (102L, 37L))).toDF("id", "len")
    val out = Mixer.lengthBucketedBatches(df, "id", "len",
      bucketWidth = 16L, batchSize = 8)
    val rows = out.collect().map(r => (r.getAs[Long]("bucket"),
      r.getAs[Long]("batch")) -> ((r.getAs[Long]("n_docs"),
      r.getAs[Long]("seq_len"), r.getAs[Double]("padding_frac")))).toMap
    // bucket 0: 20 docs -> batches of 8, 8, 4; all len 10 => zero padding
    assert(rows((0L, 0L)) == ((8L, 10L, 0.0)))
    assert(rows((0L, 1L)) == ((8L, 10L, 0.0)))
    assert(rows((0L, 2L)) == ((4L, 10L, 0.0)))
    // bucket 2: one batch of 3, padded to max 37
    val (n, sl, pf) = rows((2L, 0L))
    assert(n == 3L && sl == 37L)
    assert(math.abs(pf - (1.0 - 105.0 / 111.0)) < 1e-15)
    assert(rows.size == 4)
  }

  test("weightedSamplePerKey: exact k per group, partitioning-invariant, equals per-group global form") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (s"g${i % 4}", i, (i % 13 + 1).toDouble))
    val df = rows.toDF("grp", "id", "w")
    val got = Mixer.weightedSamplePerKey(df, "grp", "id", "w", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got.groupBy(_._1).forall(_._2.size == 20))
    // invariant under partitioning
    val got8 = Mixer.weightedSamplePerKey(df.repartition(8), "grp", "id", "w", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got.toSet == got8.toSet)
    // per group it is exactly weightedSample applied to that group
    for (g <- Seq("g0", "g3")) {
      val solo = Mixer.weightedSample(df.where(col("grp") === g), "id", "w", 20)
        .select("id").as[Long].collect().toSet
      assert(got.filter(_._1 == g).map(_._2).toSet == solo)
    }
  }

  test("weightedSamplePerKey: small groups yield their whole positive-weight set") {
    import spark.implicits._
    // g_small has 3 positive-weight rows (< k); g_zero only weight-0 rows
    val df = (Seq(("g_small", 1L, 2.0), ("g_small", 2L, 1.0), ("g_small", 3L, 5.0),
      ("g_small", 4L, 0.0), ("g_zero", 9L, 0.0)) ++
      (10L to 40L).map(i => ("g_big", i, 1.0))).toDF("grp", "id", "w")
    val got = Mixer.weightedSamplePerKey(df, "grp", "id", "w", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("g_small") == Set(1L, 2L, 3L)) // all positive rows, w=0 dropped
    assert(!byG.contains("g_zero"))           // nothing eligible
    assert(byG("g_big").size == 10)           // capped at k
  }
}
