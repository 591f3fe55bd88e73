package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-mandated training-data pipeline operators (dedup, similarity
  * search, text analysis, multimodal) over `documents` / `embeddings`.
  * Filled in as each operator lands (see graft.functions.*).
  */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
