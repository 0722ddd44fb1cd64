package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of the flagship pipeline. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001")
    graft.pipeline.Extract.run(corpus).explain("formatted")
    spark.stop()
  }
}
