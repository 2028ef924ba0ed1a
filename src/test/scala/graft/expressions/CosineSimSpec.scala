package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-identical to the composed fold") {
    val emb = graft.Tables.load(spark, sf(), "embeddings").limit(200)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .where(col("a") < col("b")).limit(500)
    val diff = pairs
      .withColumn("native", CosineSim(col("va"), col("vb")))
      .withColumn("composed", VectorFns.cosine(col("va"), col("vb")))
      .where(col("native") =!= col("composed")) // bitwise-exact expected
      .count()
    assert(diff == 0)
  }

  test("length mismatch yields null, matching the composed zip_with form") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val out = df.select(CosineSim(col("a"), col("b")).as("native"),
      VectorFns.cosine(col("a"), col("b")).as("composed")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("handles orthogonal and identical vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(CosineSim(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("codegen path evaluates (no fallback errors) on wide rows") {
    val emb = graft.Tables.load(spark, sf(), "embeddings").limit(50)
    val q = emb.select(col("vec_id"), CosineSim(col("embedding"), col("embedding")).as("self"))
    assert(q.where(abs(col("self") - 1.0) > lit(1e-9)).count() == 0)
  }
}
