package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew-join evidence: AQE's OptimizeSkewedJoin must split the
  * hot-key partition of a sort-merge join at runtime (the automatic
  * counterpart to the manual salting operator q_salted_agg pins). This
  * is the mechanism that keeps a 100-TB join alive when one key holds a
  * disproportionate share of the fact side — without it the join is a
  * single straggler task.
  *
  * The thresholds are lowered so local-scale data trips the same code
  * path production sizes would; correctness is pinned by the exact
  * expected row count plus equality with the AQE-disabled plan. */
class AqeSkewSpec extends AnyFunSuite {

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
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{length, sum}
    // fact: 200k rows, half of them on key 0 (the hot key), with an
    // incompressible md5 payload so the hot partition's COMPRESSED
    // shuffle size actually crosses the detection threshold; dim: unique
    // keys. NOTE: the probe query must not require a hash distribution
    // downstream of the join (e.g. groupBy(k)) — AQE refuses to split a
    // skewed partition when that would break a required distribution.
    val fact = spark.range(0, 200000)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k",
        "md5(CAST(id AS STRING)) AS payload")
    val dim = spark.range(0, 200000).selectExpr("id AS k", "id * 7 AS attr")

    var aqeCount = -1L
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      aqeCount = fact.join(dim, "k").count()
      // global sum = partial agg over the join's own partitions, no
      // required hash distribution, so the skew split is legal
      val plan = fact.join(dim, "k").select(sum(length($"payload") + $"attr").as("s"))
      plan.collect()
      val exec = plan.queryExecution.executedPlan
      val finalPlan = exec.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .getOrElse(exec)
      val txt = finalPlan.toString
      assert(txt.contains("skew=true"),
        s"expected a skew-split sort-merge join in the adaptive plan, got:\n$txt")
    }

    // exact expected cardinality: 100k hot-key matches + 100k odd-key matches
    assert(aqeCount == 200000L)

    // identical result without AQE (plan changes, semantics must not)
    var plainCount = -1L
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      plainCount = fact.join(dim, "k").count()
    }
    assert(plainCount == aqeCount)
  }
}
