package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQ

/** q_source_precedence pinned on a handcrafted corpus: cross-source
  * exact-dup clusters resolve to the highest-precedence source (primary
  * `src*` beats the synthetic 'agg' mirror and any non-src source;
  * lexicographic source then doc_id breaks ties) and the output is the
  * (source_kept, source_dropped) drop matrix. */
class SourcePrecedenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("srcprec").toString
    val docs = Seq(
      // doc 0 (0 % 37 == 0 -> mirrored into 'agg') shares text with doc 1:
      // cluster {0, 1, mirror-of-0}; srcA < srcB wins -> drops srcB + agg
      (0L, "alpha beta", "en", "srcB", 10L),
      (1L, "alpha beta", "en", "srcA", 10L),
      // docs 2/3: whitespace-normalized same fp, same source -> intra-source drop
      (2L, "gamma delta", "en", "srcC", 11L),
      (3L, "gamma  delta", "en", "srcC", 12L),
      // singleton: never appears in the matrix
      (4L, "unique text", "en", "srcD", 11L),
      // non-src source loses to a primary source (prio 1 vs 0)
      (5L, "zeta", "en", "curated", 4L),
      (6L, "zeta", "en", "srcE", 4L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("drop matrix: src-priority winner per cluster, intra-source and agg drops counted") {
    val got = DedupQ.qSourcePrecedence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = Set(
      ("srcA", "agg", 1L),  // mirror of doc 0 loses to doc 1
      ("srcA", "srcB", 1L), // doc 0 loses to doc 1 (srcA < srcB)
      ("srcC", "srcC", 1L), // doc 3 loses to doc 2 within srcC
      ("srcE", "curated", 1L)) // prio 0 beats prio 1
    assert(got == want)
  }
}
