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
  }
}
