package graft

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair graphs (SURVEY.md §2h:
  * pairs → dedup groups). Min-label propagation must close chains
  * transitively and keep disjoint components apart.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chain closes transitively, disjoint pair stays separate, keeper = min id") {
    // chain 1-2-3-4 (no direct 1~3, 1~4 edges) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = GraphOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("diamond + reversed edge orientation converge to one component") {
    // edges given in mixed orientation; diameter 2
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 5L), (9L, 7L))
      .toDF("id_a", "id_b")
    val out = GraphOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(2L))
    assert(out.keySet === Set(2L, 5L, 7L, 9L))
  }

  test("long path converges within the iteration cap") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = GraphOps.connectedComponents(pairs, maxIters = 20)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(1L), s"path not fully closed: $out")
  }

  test("hitting the iteration cap throws — non-converged labels are never returned") {
    // min-label propagation moves one hop per round; a chain longer
    // than the cap would return a non-transitive 'closure' that the
    // q56/q89 callers then persist as a content-keyed artifact —
    // permanently wrong dedup groups. Loud beats cached-wrong.
    val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(longChain, maxIters = 3).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("property: equals brute-force union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      n <- Gen.choose(2, 30)            // node id space
      m <- Gen.choose(1, 40)            // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield edges.filter { case (a, b) => a != b } // self-loops excluded by contract
    (0 until 10).foreach { i =>
      val edges = graphGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      if (edges.nonEmpty) {
        // brute-force reference: path-compressed union-find, min id as root
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        edges.foreach { case (a, b) => union(a, b) }
        val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
          .map(x => x -> find(x)).toMap
        // explicit iteration cap at the node-count upper bound: the
        // generated graphs allow path-like components whose diameter
        // can exceed the default maxIters=20, and a widened gen range
        // or new seed must produce a wrong-answer diff, not a
        // confusing non-convergence
        val got = GraphOps.connectedComponents(edges.toDF("id_a", "id_b"),
            maxIters = 64)
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"case $i: ${edges.size} edges diverged")
      }
    }
  }
}
