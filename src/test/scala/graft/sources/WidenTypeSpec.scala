package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ALTER COLUMN TYPE <wider>` — metadata-only type widening: recorded
  * in the manifest, applied as a read-time cast, mixed physical eras
  * plan one wide scan schema (parquet reader type promotion), time
  * travel keeps each version's own type, narrowing refuses.
  */
class WidenTypeSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshStore(): SnapshotStore = {
    n += 1
    val root = Scratch.processScoped("widen_spec", "spec") + s"/case$n"
    new SnapshotStore(spark, root)
  }

  test("INT -> BIGINT spans both physical eras; time travel keeps each version's type") {
    val st = freshStore()
    st.commit("t", Seq((1, 10), (2, 20)).toDF("k", "v"), overwrite = true,
      statsCols = Seq("k"))
    assert(st.read("t").schema("v").dataType == IntegerType)
    val wv = st.alterColumnType("t", "v", "bigint")
    assert(st.read("t").schema("v").dataType == LongType)
    assert(st.manifestDirs("t", Some(wv)) == st.manifestDirs("t", Some(1L)),
      "the widen must republish the same dirs — zero data IO")
    // a post-widen append lands BIGINT physically — beyond int range
    st.commit("t", Seq((3L, 5000000000L)).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v")), overwrite = false,
      statsCols = Seq("k"))
    val rows = st.read("t").select("k", "v").as[(Int, Long)].collect().toMap
    assert(rows == Map(1 -> 10L, 2 -> 20L, 3 -> 5000000000L))
    // time travel: the pre-widen version is still INT
    assert(st.read("t", Some(1L)).schema("v").dataType == IntegerType)
  }

  test("keyed DML across the widen boundary: merge touches mixed eras exactly") {
    val st = freshStore()
    st.commit("t", (0 until 100).map(i => (i, i)).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    st.alterColumnType("t", "v", "bigint")
    st.commit("t", Seq((100, 6000000000L)).toDF("k", "v"),
      overwrite = false, statsCols = Seq("k"))
    // merge rewrites the old-era dir: its rows must re-land WIDE with
    // values intact, and the new-era dir carries by name
    st.mergeInto("t", Seq((5, 7000000000L)).toDF("k", "v"), "k",
      statsCols = Seq("k"))
    val got = st.read("t").as[(Int, Long)].collect().toMap
    assert(got(5) == 7000000000L && got(100) == 6000000000L && got(6) == 6L)
    assert(got.size == 101)
  }

  test("FLOAT -> DOUBLE and DECIMAL precision growth") {
    val st = freshStore()
    st.commit("t", Seq((1, 1.5f)).toDF("k", "x"), overwrite = true)
    st.alterColumnType("t", "x", "double")
    st.commit("t", Seq((2, 2.25)).toDF("k", "x"), overwrite = false)
    assert(st.read("t").select(sum("x")).head().getDouble(0) == 3.75)
    val st2 = freshStore()
    st2.commit("d", Seq((1, BigDecimal("1.50"))).toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(5, 2)).as("m")),
      overwrite = true)
    st2.alterColumnType("d", "m", "decimal(12,2)")
    st2.commit("d", Seq((2, BigDecimal("123456789.25"))).toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(12, 2)).as("m")),
      overwrite = false)
    assert(st2.read("d").schema("m").dataType == DecimalType(12, 2))
    assert(st2.read("d").agg(sum("m")).head().getDecimal(0).toPlainString
      == "123456790.75")
  }

  test("filters on a widened column still push down to the parquet scan") {
    val st = freshStore()
    st.commit("t", (0 until 100).map(i => (i, i)).toDF("k", "v"),
      overwrite = true)
    st.alterColumnType("t", "v", "bigint")
    // Catalyst unwraps the widening cast in the comparison
    // (UnwrapCastInBinaryComparison), so the predicate reaches the
    // scan against the NARROW physical column — the metadata-only
    // widen costs nothing at scan time
    val plan = st.read("t").where(col("v") > 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,50)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(st.read("t").where(col("v") > 50L).count() == 49L)
  }

  test("narrowing and unsupported pairs refuse loudly; no-op refuses") {
    val st = freshStore()
    st.commit("t", Seq((1L, 1.5, "s")).toDF("k", "x", "v"),
      overwrite = true)
    intercept[IllegalArgumentException](st.alterColumnType("t", "k", "int"))
    intercept[IllegalArgumentException](st.alterColumnType("t", "x", "float"))
    intercept[IllegalArgumentException](st.alterColumnType("t", "v", "bigint"))
    intercept[IllegalArgumentException](st.alterColumnType("t", "k", "bigint"))
    intercept[IllegalArgumentException](st.alterColumnType("t", "nope", "bigint"))
  }

  test("widen follows a later RENAME; a full rewrite localizes and clears") {
    val st = freshStore()
    st.commit("t", Seq((1, 10)).toDF("k", "v"), overwrite = true)
    st.alterColumnType("t", "v", "bigint")
    st.renameColumn("t", "v", "amount")
    // the cast must have followed the rename
    assert(st.read("t").schema("amount").dataType == LongType)
    assert(st.read("t").select("amount").as[Long].head() == 10L)
    val v = st.compact("t")
    assert(st.manifestWidens("t", v).isEmpty,
      "a full rewrite must clear the widen list — data is born wide")
    assert(st.read("t").schema("amount").dataType == LongType)
  }

  test("CDF across a widen boundary: packs at the wide type, a widen alone is not a change") {
    val st = freshStore()
    st.commit("t", Seq((1L, 10), (2L, 20)).toDF("k", "v"), overwrite = true)
    st.alterColumnType("t", "v", "bigint")
    st.commit("t", Seq((3L, 5000000000L)).toDF("k", "v"), overwrite = false)
    st.mergeInto("t", Seq((2L, 21L)).toDF("k", "v"), "k")
    val d = st.diff("t", 1L, st.versions("t").max, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(3L -> "insert", 2L -> "update"),
      s"k=1 is value-unchanged — the widen alone must not surface: $d")
  }

  test("restore and shallow clone carry the widen declaration") {
    val st = freshStore()
    st.commit("t", Seq((1, 10)).toDF("k", "v"), overwrite = true)
    val wv = st.alterColumnType("t", "v", "bigint")
    st.commit("t", Seq((2, 20)).toDF("k", "v")
      .select(col("k"), col("v").cast("bigint").as("v")), overwrite = false)
    st.cloneView("t", "c")
    assert(st.read("c").schema("v").dataType == LongType)
    assert(st.read("c").count() == 2L)
    st.restore("t", wv)
    assert(st.read("t").schema("v").dataType == LongType)
    assert(st.read("t").count() == 1L)
  }

  test("SQL: ALTER TABLE t ALTER COLUMN c TYPE BIGINT end to end") {
    val root = Scratch.processScoped("widen_sql_spec", "spec")
    spark.conf.set("spark.graft.store.root", root + s"/sql$n")
    try {
      spark.sql("CREATE TABLE wt1 (k BIGINT, v INT) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO wt1 VALUES (1, 10), (2, 20)")
      val r = spark.sql("ALTER TABLE wt1 ALTER COLUMN v TYPE BIGINT").head()
      assert(r.getString(0) == "wt1" && r.getLong(1) >= 2L)
      spark.sql("INSERT INTO wt1 VALUES (3, 5000000000)")
      assert(spark.sql("SELECT sum(v) FROM wt1").head().getLong(0) ==
        5000000030L)
      // DESCRIBE surfaces the widened type
      val dt = spark.sql("DESCRIBE TABLE wt1").collect()
        .find(_.getString(0) == "v").get.getString(1)
      assert(dt == "bigint", dt)
      intercept[Exception](
        spark.sql("ALTER TABLE wt1 ALTER COLUMN v TYPE INT"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS wt1")
      spark.conf.unset("spark.graft.store.root")
    }
  }
}
