package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {

  /** Reference Morton implementation to pin the Column form against. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    val m = (1L << bits) - 1
    val (xs, ys) = (x & m, y & m)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xs >> i) & 1L) << (2 * i)) | (((ys >> i) & 1L) << (2 * i + 1))
    }
  }

  test("mortonCode matches the reference interleave, incl. negatives") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (123456L, 7L), (-1L, 2L), (14999L, 1825L))
    val out = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.mortonCode(col("x"), col("y"), 16).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // pmod folds negatives into [0, 2^bits) before interleaving
      val xf = ((x % 65536) + 65536) % 65536
      val yf = ((y % 65536) + 65536) % 65536
      assert(z == mortonRef(xf, yf, 16), s"($x,$y) -> $z")
    }
  }

  test("mortonCode preserves 2-D locality: sorted prefix blocks bound both dims") {
    import spark.implicits._
    // 32×32 grid; under z-order, each aligned block of 64 consecutive
    // codes covers an 8×8 tile — max-min spread within the block is
    // bounded in BOTH dimensions (the property row-group pruning uses)
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
    val rows = grid.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.mortonCode(col("x"), col("y"), 5).as("z"))
      .orderBy(col("z")).collect()
    rows.grouped(64).foreach { blk =>
      val xs = blk.map(_.getLong(0))
      val ys = blk.map(_.getLong(1))
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"block spread x=${xs.min}..${xs.max} y=${ys.min}..${ys.max}")
    }
  }
}
