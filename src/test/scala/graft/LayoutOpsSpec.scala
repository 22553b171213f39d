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

  test("mortonCode matches the reference interleave on in-range keys") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (14999L, 1825L))
    val out = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.mortonCode(col("x"), col("y"), 16).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x, y, 16), s"($x,$y) -> $z")
    }
  }

  test("mortonCode raises on out-of-range keys instead of silently aliasing the curve") {
    import spark.implicits._
    // the old pmod fold mapped keys 2^bits apart into the SAME cell —
    // every row group's min/max then spanned the whole domain and the
    // layout pruned nothing, silently
    for (bad <- Seq((65536L, 1L), (-1L, 2L))) {
      val e = intercept[Exception] {
        Seq(bad).toDF("x", "y")
          .select(LayoutOps.mortonCode(col("x"), col("y"), 16)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("out of [0, 2^16)")), msgs(e))
    }
  }

  test("zorderKey scales arbitrary domains monotonically — wide-domain locality holds") {
    import spark.implicits._
    // keys far beyond 2^bits: under the old modular fold, consecutive
    // z-blocks contained keys from across the whole domain; scaled,
    // each block stays narrow in both dimensions
    val grid = for { x <- 0 until 32; y <- 0 until 32 }
      yield (1000000L + x * 50000L, 70000L + y * 9000L)
    val df = grid.toDF("x", "y")
    val rows = df
      .select(col("x"), col("y"),
        LayoutOps.zorderKey(df, col("x"), col("y"), 5).as("z"))
      .orderBy(col("z")).collect()
    rows.grouped(64).foreach { blk =>
      val xs = blk.map(_.getLong(0))
      val ys = blk.map(_.getLong(1))
      assert(xs.max - xs.min <= 7 * 50000L && ys.max - ys.min <= 7 * 9000L,
        s"block spread x=${xs.min}..${xs.max} y=${ys.min}..${ys.max}")
    }
  }

  test("zorderKey scales wide spans with INTEGRAL division — exact where double division is off by one") {
    import spark.implicits._
    // r12 advice: Column./ is double division; for spans past
    // 2^(53-bits) the numerator exceeds 2^53 and the rounded quotient
    // can differ by 1 from exact integral division. With span = 2^54-1
    // at bits=8 (inside the 2^54 overflow guard) the values below are
    // measured divergence points — and at v = hi the double quotient
    // rounds 255.99…→256.0, which is OUT of Morton range entirely, so
    // the old formula didn't just swap cells, it raised at execution.
    val span = (1L << 54) - 1
    val hi = span - 1
    val divergent = Seq(17803292276948991L, 17873661021126655L,
      17944029765304319L)
    val xs = Seq(0L, hi) ++ divergent
    val df = xs.zipWithIndex.map { case (x, i) => (x, i.toLong) }.toDF("x", "y")
    val out = df
      .select(col("x"), LayoutOps.zorderKey(df, col("x"), col("y"), 8).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def xScaled(z: Long): Long = // deinterleave the even (x) bits
      (0 until 8).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i)) & 1L) << i))
    xs.foreach { v =>
      val exact = ((BigInt(v) * 256) / span).toLong
      assert(xScaled(out(v)) == exact,
        s"x=$v scaled to ${xScaled(out(v))}, exact integral quotient is $exact")
    }
  }

  test("zorderKey: an over-wide domain fails loudly; an all-null dimension falls back to 1-D") {
    import spark.implicits._
    // r14 review, both arms. Arm 1: hi - lo + 1 in plain longs wraps
    // negative for domains wider than Long.MaxValue and the wrapped
    // span sailed through the width guard
    val wide = Seq(Long.MinValue, 10L).toDF("x")
      .withColumn("y", lit(1L))
    val e = intercept[IllegalArgumentException] {
      wide.select(LayoutOps.zorderKey(wide, col("x"), col("y"), 8)).collect()
    }
    assert(e.getMessage.contains("too wide"))
    // Arm 2: an all-null x over a populated y used to yield a CONSTANT
    // key — silently destroying y's clustering too; now the populated
    // dimension keeps its monotonic 1-D ordering
    val halfNull = Seq((None: Option[Long], 1L), (None, 100L), (None, 50L))
      .toDF("x", "y")
    val keys = halfNull
      .select(col("y"), LayoutOps.zorderKey(halfNull, col("x"), col("y"), 8)
        .as("z"))
      .orderBy("y").as[(Long, Long)].collect().map(_._2)
    assert(keys.distinct.length > 1, s"y clustering must survive: ${keys.toSeq}")
    assert(keys.toSeq === keys.sorted.toSeq,
      "the 1-D fallback must stay monotonic in the populated column")
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
