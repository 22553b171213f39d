package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape regression net over EVERY graded query (round-6 VERDICT
  * item 6): PlanSpec pins ~50 load-bearing plan properties one by one,
  * but a plan outside that set can silently degrade (the q23 r4
  * regression — 1.4s → 32.9s — was caught by bench timing two rounds
  * late). This spec digests the physical operator TREE (class names +
  * structure, no data-dependent detail) of all registered queries at
  * sf0.001 and diffs against the committed snapshot in
  * `tools/plan_digests.txt`; any drift fails naming the exact queries.
  *
  * Intended workflow on an INTENTIONAL plan change: eyeball the new
  * shape, note it in SURVEY.md if load-bearing, then
  * `GRAFT_REGEN_PLAN_DIGESTS=1 sbt "testOnly graft.PlanDigestSpec"`
  * and commit the refreshed snapshot with the change.
  */
class PlanDigestSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val snapshotPath = Paths.get("tools", "plan_digests.txt")

  private def render(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    sb.append("  " * depth).append(p.getClass.getSimpleName.stripSuffix("Exec")).append('\n')
    p match {
      // the pre-execution tree lives in a field, not in children
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        render(a.inputPlan, depth + 1, sb)
      case _ => p.children.foreach(render(_, depth + 1, sb))
    }
  }

  private def digest(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val sb = new StringBuilder
    render(df.queryExecution.executedPlan, 0, sb)
    sb.toString
  }

  private def parse(text: String): Map[String, String] =
    text.split("(?m)^== ").filter(_.nonEmpty).map { block =>
      val nl = block.indexOf('\n')
      block.take(nl) -> block.drop(nl + 1)
    }.toMap

  test("every graded query's physical plan shape matches the committed snapshot") {
    // the flagship rides along under a reserved pseudo-key: it is the
    // one surface the driver smoke-checks that the registry digests
    // didn't cover (EntrySpec pins its semantics, nothing pinned its
    // shape). entry() honors SPARK_GRAFT_SF_DIR with an sf0.001
    // default — the test env leaves it unset, so the digest data dir
    // matches the registry's.
    val entryDigest = {
      // EntrySpec cache()s this exact frame; if it ran earlier in the
      // same JVM the cache manager would swap the scan for an
      // InMemoryTableScan and the digest would depend on SUITE ORDER.
      // Suites run sequentially, so dropping the cache here cannot
      // interleave with another suite's use of it — EntrySpec
      // re-caches on its own first access either way.
      spark.catalog.clearCache()
      val sb = new StringBuilder
      render(SparkEntry.entry(spark).queryExecution.executedPlan, 0, sb)
      "entry(flagship)" -> sb.toString
    }
    val current = entryDigest +:
      SparkEntry.queries.keys.toSeq.sorted.map(n => n -> digest(n))
    if (sys.env.contains("GRAFT_REGEN_PLAN_DIGESTS")) {
      val rendered = current.map { case (n, d) => s"== $n\n$d" }.mkString
      Files.write(snapshotPath, rendered.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $snapshotPath (${current.size} queries)")
    } else {
      assert(Files.exists(snapshotPath),
        s"missing $snapshotPath — GRAFT_REGEN_PLAN_DIGESTS=1 sbt 'testOnly graft.PlanDigestSpec' to create it")
      val old = parse(new String(Files.readAllBytes(snapshotPath), StandardCharsets.UTF_8))
      val cur = current.toMap
      val added = (cur.keySet -- old.keySet).toSeq.sorted
      val removed = (old.keySet -- cur.keySet).toSeq.sorted
      val changed = current.collect {
        case (n, d) if old.contains(n) && old(n) != d => n
      }
      val report = changed.map { n =>
        s"--- $n was:\n${old(n)}+++ $n now:\n${cur(n)}"
      }.mkString("\n")
      assert(changed.isEmpty && added.isEmpty && removed.isEmpty,
        s"plan shapes drifted (intentional? note in SURVEY.md + regen snapshot):\n" +
          s"changed=${changed.mkString(",")} added=${added.mkString(",")} removed=${removed.mkString(",")}\n$report")
    }
  }
}
