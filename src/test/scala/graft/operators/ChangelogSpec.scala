package graft.operators

import graft.SparkSpec

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("applyChangelog: last change wins, deletes tombstone, untouched keys pass") {
    val changes = Seq(
      (1L, "a2", "U", 10L), (1L, "a3", "U", 20L),  // two upserts: latest wins
      (2L, "b2", "U", 5L), (2L, "xx", "D", 9L),    // upsert then delete: gone
      (4L, "d1", "U", 1L),                         // insert of a new key
      (5L, "e1", "U", 1L), (5L, "e2", "D", 0L)     // delete BEFORE upsert: upsert wins
    ).toDF("k", "v", "op", "seq")
    val got = Changelog.applyChangelog(base, changes, "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a3", 3L -> "c", 4L -> "d1", 5L -> "e1"), got.toString)
  }

  test("applyChangelog: tieBreak makes equal seqs deterministic") {
    val changes = Seq(
      (1L, "z1", "U", 1L), (1L, "z9", "U", 1L) // same seq: higher tieBreak value wins
    ).toDF("k", "v", "op", "seq")
    val got = Changelog.applyChangelog(base, changes, "k", "seq", "op",
      tieBreak = Seq("v")).as[(Long, String)].collect().toMap
    assert(got(1L) == "z9")
  }

  test("scd2: validity chain is contiguous with one open current row per key") {
    val changes = Seq(
      (1L, "a1", 10L), (1L, "a2", 20L), (1L, "a3", 30L),
      (2L, "b1", 5L)
    ).toDF("k", "v", "seq")
    val got = Changelog.scd2(changes, "k", "seq")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, "a1", 10L, Some(20L), false),
      (1L, "a2", 20L, Some(30L), false),
      (1L, "a3", 30L, None, true),
      (2L, "b1", 5L, None, true)), got.toString)
  }
}
