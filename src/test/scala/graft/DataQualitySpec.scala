package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DataQualityQ

/** Pipeline-reliability batch laws the oracle cannot express:
  * the clean-input no-false-positive side of the DQ suite, and JSONL
  * round-trip fidelity on hostile strings (the ASCII corpus never
  * exercises escapes). */
class DataQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("dq checks: clean input passes every check (no false positives)") {
    import org.apache.spark.sql.functions.col
    val clean = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val cust = spark.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"))
    val rows = DataQualityQ.checkSuite(clean, cust).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") == 0L, r.getAs[String]("check_name"))
      assert(r.getAs[Boolean]("pass"), r.getAs[String]("check_name"))
    }
    // and the corrupted driver query flags every check
    val bad = DataQualityQ.qDqChecks(spark, dir).collect()
    assert(bad.length == 5)
    bad.foreach(r => assert(!r.getAs[Boolean]("pass"), r.getAs[String]("check_name")))
  }

  test("jsonl round-trip: hostile strings survive write -> read exactly") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "line\nbreak and\ttab"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "unicode: café 中文 and non-BMP 😀"),
      (4L, "control  chars"),
      (5L, "json-looking: {\"k\": [1,2]}"),
      (6L, "")).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_jsonl_spec").toString
    hostile.write.mode("overwrite").json(root)
    val back = spark.read.schema("doc_id LONG, text STRING").json(root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = hostile.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(back == want)
  }

  test("schema evolve: merged read surfaces the evolved column, v1 rows null") {
    val out = DataQualityQ.qSchemaEvolve(spark, dir)
    assert(out.columns.toSeq == Seq("lang", "n_docs", "n_legacy", "sum_quality"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // some rows must actually have legacy (v1) members and some evolved sums
    assert(rows.map(_.getAs[Long]("n_legacy")).sum > 0)
    assert(rows.map(_.getAs[Long]("sum_quality")).sum > 0)
  }
}
