package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The capstone extract->curate composition: curation invariants over
  * the EXTRACTED text (the half the DuckDB oracle cannot recompute —
  * extraction itself is golden/equivalence-pinned elsewhere). */
class ExtractCurateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-fp groups keep exactly the min doc; reasons partition the corpus") {
    val rows = SparkEntry.queries("q_extract_curate")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    // fingerprint groups: every non-min member must carry dup_extracted
    rows.groupBy(_._2).values.foreach { g =>
      val minDoc = g.map(_._1).min
      g.foreach { case (doc, _, n, reason) =>
        if (doc != minDoc) assert(reason == "dup_extracted", s"$doc")
        else assert(reason != "dup_extracted", s"$doc")
      }
    }
    // reason consistency for representatives
    rows.filter(_._4 == "too_short").foreach { case (_, _, n, _) => assert(n < 20) }
    rows.filter(_._4 == "kept").foreach { case (_, _, n, _) => assert(n >= 20) }
    // the sf0.001 corpus must exercise kept (extraction yields real text)
    assert(rows.exists(_._4 == "kept"))
    // determinism: doc count equals the flagship's doc count
    val nDocs = graft.pipeline.Extract.run(
      graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001")).count()
    assert(rows.length.toLong == nDocs)
  }

  test("a planted span-identical doc is flagged dup_extracted against its source") {
    import org.apache.spark.sql.functions._
    val corpus = graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001")
    val srcId = corpus.select(col("doc_id")).orderBy(col("doc_id")).head().getString(0)
    val planted = corpus.filter(col("doc_id") === srcId)
      .withColumn("doc_id", lit("zzz_planted_dup")) // sorts after every real id
    val rows = graft.pipeline.Extract.extractCurate(corpus.unionByName(planted))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(rows("zzz_planted_dup")._2 == "dup_extracted")
    assert(rows("zzz_planted_dup")._1 == rows(srcId)._1) // identical extracted fp
    assert(rows(srcId)._2 != "dup_extracted") // the min-doc representative survives
  }
}
