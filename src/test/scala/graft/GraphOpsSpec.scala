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
}
