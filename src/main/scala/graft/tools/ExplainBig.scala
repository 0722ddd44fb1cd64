package graft.tools

import org.apache.spark.sql.SparkSession

/** Count exchanges on the mega-doc path (spreadThreshold=0 forces it). */
object ExplainBig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001")
    val plan = graft.pipeline.Extract.run(corpus, spreadThreshold = 0)
      .queryExecution.executedPlan.toString
    val nExchanges = "(?m)^.*Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"EXCHANGES_ON_BIG_PATH: $nExchanges")
    println(plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    // pass-through short-circuit: the extraction UDF must appear only
    // inside the CASE branch gated on the extracted kinds
    val udfLines = plan.linesIterator.filter(_.contains("UDF(")).toVector
    println(s"UDF_SITES: ${udfLines.length}")
    // nonEmpty guard: with zero UDF sites a forall is vacuously true and
    // the gating would read as "verified" when nothing was checked
    println(s"UDF_GATED: ${udfLines.nonEmpty &&
      udfLines.forall(l => l.contains("CASE WHEN") && l.contains("pdf_layout"))}")
    // pre-split layout: exchanges on the PRE-SPLIT ingest (scan-fused
    // extraction, no raw-byte repartition)
    val pre = graft.fixtures.CorpusGen.preSplit(corpus)
    val planPre = graft.pipeline.Extract.run(pre)
      .queryExecution.executedPlan.toString
    val nPre = "(?m)^.*Exchange hashpartitioning".r.findAllIn(planPre).length
    println(s"EXCHANGES_PRESPLIT: $nPre")
    println(planPre.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
