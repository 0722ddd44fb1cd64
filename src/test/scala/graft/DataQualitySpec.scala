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

  test("gopher rules: each rule fires on its planted violation, clean doc keeps") {
    import spark.implicits._
    val d = Files.createTempDirectory("gopher_spec").toString
    // 102 words, every 2-gram unique (so r_rep passes), stopwords the+a
    val clean = (0 until 50).map(i => s"uu$i vv$i").mkString(" ") + " the a"
    Seq(
      (0L, clean, "en", "src0"),                                     // passes everything
      (1L, "the a tiny doc", "en", "src0"),                          // fails r_nwords (4 words)
      (2L, Seq.fill(40)("spark table").mkString(" "), "en", "src0"), // fails r_rep (one 2-gram dominates) + r_stop
      (3L, (0 until 25).map(i => s"w$i").mkString(" "), "en", "src0") // fails r_stop (no stopwords)
    ).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.queries.TextAnalysisQ.qGopherRules(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (rows(id).getAs[Int]("r_nwords"), rows(id).getAs[Int]("r_stop"),
      rows(id).getAs[Int]("r_rep"), rows(id).getAs[Int]("kept"))
    assert(flags(0L) == ((1, 1, 1, 1)), s"clean doc: ${flags(0L)}")
    assert(rows(1L).getAs[Int]("r_nwords") == 0 && rows(1L).getAs[Int]("kept") == 0)
    assert(rows(2L).getAs[Int]("r_rep") == 0 && rows(2L).getAs[Int]("kept") == 0)
    assert(rows(3L).getAs[Int]("r_stop") == 0 && rows(3L).getAs[Int]("kept") == 0)
    // repetition accounting: doc 2 is 80 words of one repeated pair —
    // the top 2-gram ("spark table" or "table spark") covers ~half the
    // word chars, far past the 20% bound
    assert(rows(2L).getAs[Long]("top2_chars") * 5 > rows(2L).getAs[Long]("sum_wchars"))
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
