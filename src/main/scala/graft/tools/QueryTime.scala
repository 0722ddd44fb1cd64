package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone per-query timing probe: runs each named SparkEntry query
  * `n` times (noop sink, like Bench's battery) and prints all wall
  * times + the min. Usage:
  *   runMain graft.tools.QueryTime <sfDir> <n> <q1,q2,...>
  * Min-of-n is the only meaningful statistic on this burst-throttled
  * host (CLAUDE.md measurement realities); interleave queries so
  * adjacent runs see similar throttle state.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    // interleaved: q1 q2 ... q1 q2 ... so throttle drift hits all equally
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    (1 to n).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
        } finally graft.queries.QCache.releaseScoped() // bench parity: every rep starts cold
      }
    }
    names.foreach { name =>
      val ts = times(name)
      println(f"QT $name%-24s min=${ts.min}%.2fs runs=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
