package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning evidence: when a join's build side
  * is selective, Spark injects a Bloom filter built from the build-side
  * keys into the PROBE side's scan stage at runtime
  * (`BloomFilterMightContain` / runtime row-level filtering) — at
  * 100 TB this is the lever that keeps a fact-scan from shipping rows a
  * selective dimension filter would discard after the shuffle anyway.
  * Size thresholds are lowered so local-scale data trips the same code
  * path production sizes would; correctness is pinned by result
  * equality with the feature disabled. */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective build side injects a bloom runtime filter into the probe scan; results unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf").toString
    // fact: 200k rows over 1000 keys; dim: 1000 rows, filter keeps 10 keys
    spark.range(0, 200000)
      .selectExpr("id % 1000 AS k", "id AS v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 1000)
      .selectExpr("id AS k", "concat('d', id) AS name", "id % 100 AS grp")
      .write.mode("overwrite").parquet(s"$dir/dim")

    def run(): (String, Array[(Long, Long)]) = {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter("grp = 7") // 10 of 1000 keys
      val joined = fact.join(dim, "k")
        .groupBy("k").count()
        .orderBy("k")
      val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      (joined.queryExecution.executedPlan.toString, rows)
    }

    val (planOn, rowsOn) = withConfsReturn(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(run())
    assert(planOn.toLowerCase.contains("bloomfilter"),
      s"expected a bloom runtime filter in the probe scan; plan:\n${planOn.take(2000)}")

    val (planOff, rowsOff) = withConfsReturn(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(run())
    assert(!planOff.toLowerCase.contains("bloomfilter"))
    assert(rowsOn.sameElements(rowsOff), "pruning must not change results")
    assert(rowsOn.length == 10)
    assert(rowsOn.forall(_._2 == 200L)) // 200k/1000 keys = 200 rows per key
  }

  private def withConfsReturn[A](pairs: (String, String)*)(body: => A): A = {
    var out: Option[A] = None
    withConfs(pairs: _*) { out = Some(body) }
    out.get
  }
}
