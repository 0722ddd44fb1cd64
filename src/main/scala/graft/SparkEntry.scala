package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.CorpusGen
import graft.pipeline.Extract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` runs the flagship extraction job end-to-end at sf0.001.
  * `queries` carries one entry per implemented operator (SURVEY.md §2);
  * SQL-expressible ones have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship: synthesize the interleaved (doc_id, spans) corpus from the
    * sf0.001 documents table, run the full extraction pipeline. */
  def entry(spark: SparkSession): DataFrame =
    Extract.run(CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_extract_flagship" -> ((s, dir) => Extract.run(CorpusGen.fromDocuments(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    // q_extract_flagship: non-SQL-expressible (DOM/hOCR/classifier work);
    // the driver records the rows-only check, correctness is pinned by the
    // golden + distributed-equivalence suites in src/test.
  )
}
