package graft

import graft.ops.TopKAggregator.TopK

class TopKAggregatorSpec extends SparkSpec {

  private def e(v: Int, t: Long) = (v.toDouble, t)

  test("reduce keeps the k best by (value desc, tiebreak asc)") {
    val agg = new TopK(3)
    val buf = Seq(e(9, 1), e(5, 2), e(7, 3), e(5, 1), e(11, 4))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf === Seq(e(11, 4), e(9, 1), e(7, 3)))
  }

  test("equal values rank by smaller tiebreak") {
    val agg = new TopK(2)
    val buf = Seq(e(5, 9), e(5, 2), e(5, 5)).foldLeft(agg.zero)(agg.reduce)
    assert(buf === Seq(e(5, 2), e(5, 5)))
  }

  test("merge is order-insensitive (partitioning independence)") {
    val agg = new TopK(3)
    val xs = (1 to 20).map(i => e(i % 7, i.toLong))
    val (a, b) = xs.splitAt(8)
    val bufA = a.foldLeft(agg.zero)(agg.reduce)
    val bufB = b.foldLeft(agg.zero)(agg.reduce)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bufA, bufB) === whole)
    assert(agg.merge(bufB, bufA) === whole)
  }

  test("below-cut entries never displace the buffer") {
    val agg = new TopK(2)
    val buf = Seq(e(10, 1), e(9, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(buf, e(1, 3)) === buf)
  }

  test("NaN entries are dropped — merge stays commutative, result partition-independent") {
    // NaN compares false both ways, so an inserted NaN would sit
    // wherever insertion ORDER put it and merge(a,b) != merge(b,a)
    val agg = new TopK(2)
    val withNaN = Seq(e(10, 1), (Double.NaN, 2L), e(9, 3))
    val a = withNaN.foldLeft(agg.zero)(agg.reduce)
    val b = withNaN.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(a === Seq(e(10, 1), e(9, 3)))
    assert(agg.merge(a, b) === agg.merge(b, a))
  }
}
