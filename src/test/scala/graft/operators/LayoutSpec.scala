package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonCode interleaves bits (a even positions, b odd)") {
    val got = Seq((3L, 1L), (0L, 0L), (5L, 2L), (7L, 7L))
      .toDF("a", "b")
      .select(Layout.mortonCode(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    // a=101,b=010 -> z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 0 1 = 25? compute:
    // a0=1->bit0, b0=0->bit1, a1=0->bit2, b1=1->bit3, a2=1->bit4, b2=0->bit5
    assert(got == Seq(
      (1L) | (1L << 1) | (1L << 2) | (0L << 3),          // a=11 b=01 -> 7
      0L,
      (1L) | (0L << 1) | (0L << 2) | (1L << 3) | (1L << 4), // a=101 b=010 -> 25
      63L))                                              // a=b=111 -> all 6 bits
  }

  test("z-ordered files prune a second-dimension box; single-key sort cannot") {
    val n = 1 << 14
    val grid = spark.range(n)
      .select((col("id") % 128).as("x"), expr("id div 128").as("y")) // y in 0..127
    val zPath = java.nio.file.Files.createTempDirectory("zorder").toString + "/z"
    val linPath = java.nio.file.Files.createTempDirectory("zorder").toString + "/lin"
    Layout.zorderWrite(grid, "x", "y", bits = 7, files = 16, path = zPath)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linPath)

    // per-file y-envelopes straight from the written files — the stats
    // a metadata layer would use for file skipping
    def filesIntersecting(path: String, lo: Long, hi: Long): Int = {
      val parts = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      parts.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("y")), max(col("y"))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val zHit = filesIntersecting(zPath, 10, 20)
    val linHit = filesIntersecting(linPath, 10, 20)
    assert(linHit == 16, s"single-key sort should not prune on y (got $linHit)")
    assert(zHit * 2 < linHit, s"z-order should prune most files: z=$zHit lin=$linHit")
  }

  test("hilbert files prune the same box; total envelope area beats z-order's") {
    val n = 1 << 14
    val grid = spark.range(n)
      .select((col("id") % 128).as("x"), expr("id div 128").as("y"))
    val hPath = java.nio.file.Files.createTempDirectory("hilbert").toString + "/h"
    val zPath = java.nio.file.Files.createTempDirectory("hilbert").toString + "/z"
    Layout.hilbertWrite(grid, "x", "y", bits = 7, files = 16, path = hPath)
    Layout.zorderWrite(grid, "x", "y", bits = 7, files = 16, path = zPath)

    def envelopes(path: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    def hits(env: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      env.count { case (_, _, ylo, yhi) => ylo <= hi && yhi >= lo }
    def area(env: Seq[(Long, Long, Long, Long)]): Long =
      env.map { case (xlo, xhi, ylo, yhi) => (xhi - xlo + 1) * (yhi - ylo + 1) }.sum

    val hEnv = envelopes(hPath)
    val zEnv = envelopes(zPath)
    // same skipping behaviour class as z-order on a y-box…
    assert(hits(hEnv, 10, 20) * 2 < 16,
      s"hilbert should prune most files on a y-box (hit ${hits(hEnv, 10, 20)})")
    // …and strictly tighter per-file rectangles overall: the curve has
    // no diagonal jumps, so equal-count code ranges are connected tiles
    assert(area(hEnv) < area(zEnv),
      s"hilbert envelopes should be tighter: h=${area(hEnv)} z=${area(zEnv)}")
  }
}
