package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** q21+ — north-star extensions (SURVEY.md §2d–§2h): json/window/topk,
  * and the LLM-training-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal plumbing). Filled incrementally.
  */
object NorthQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
