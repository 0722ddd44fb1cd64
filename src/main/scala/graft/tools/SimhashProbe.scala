package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: time q_simhash_neardup variants at battery conditions.
  * Usage: runMain graft.tools.SimhashProbe [sfDir] */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm the scan
    spark.read.parquet(s"$dir/documents.parquet").count()
    (1 to 2).foreach { round =>
      val sims = graft.queries.DedupQ.simhash60Sims(spark, dir).cache()
      time(s"votes_materialize_r$round") { sims.count() }
      time(s"full_warmcache_r$round") {
        graft.queries.DedupQ.qSimhashNeardup(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full_again_r$round") {
        graft.queries.DedupQ.qSimhashNeardup(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
