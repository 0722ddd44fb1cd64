package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQ

/** Corpus-curation queries pinned against independent plain-Scala
  * recomputation on a handcrafted corpus (the driver's DuckDB oracle is
  * the cross-engine check; this pins the semantics in-repo). */
class CorpusQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("corpusq").toString
    val docs = Seq(
      // repeated bigram "the the"; dup tokens
      (0L, "the the the cat sat on the mat", "en", "src0", 30L),
      // all-distinct tokens, no 'the'/'and' markers -> lang unknown
      (1L, "alpha beta gamma delta epsilon zeta", "en", "src0", 36L),
      // shares the first 8 tokens with doc 3 -> prefix-dup group
      (2L, "one two three four five six seven eight nine ten the and", "en", "src1", 50L),
      (3L, "one two three four five six seven eight DIFFERENT tail here the and", "en", "src1", 60L),
      // single token (no bigrams at all)
      (4L, "solo", "en", "src2", 4L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition signals: dup-token fraction and top-bigram share, zero-bigram doc") {
    val rows = CorpusQ.qRepetitionSignals(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: 8 tokens [the,the,the,cat,sat,on,the,mat] -> 5 distinct
    assert(rows(0L).getLong(1) == 8 && rows(0L).getLong(2) == 5)
    assert(rows(0L).getDouble(3) == math.rint((8 - 5).toDouble / 8 * 10000) / 10000)
    // bigrams of doc 0: the|the x2 is the top (7 bigrams total)
    assert(rows(0L).getLong(4) == 2 && rows(0L).getLong(5) == 7)
    assert(rows(0L).getDouble(6) == math.rint(2.0 / 7 * 10000) / 10000)
    // doc 4: single token -> no bigrams, share 0.0 (left-join backfill)
    assert(rows(4L).getLong(5) == 0 && rows(4L).getDouble(6) == 0.0)
    // doc 1: all distinct -> dup_tok_frac 0.0, every bigram unique
    assert(rows(1L).getDouble(3) == 0.0 && rows(1L).getLong(4) == 1)
  }

  test("prefix dedup groups docs 2 and 3; all other prefixes singleton") {
    val rows = CorpusQ.qPrefixDedup(spark, dir).collect()
    assert(rows.length == 4) // 5 docs, one shared prefix group
    val byDoc = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byDoc(2L) == 2) // representative = min(2,3), n_docs = 2
    assert(!byDoc.contains(3L))
    assert(byDoc(0L) == 1 && byDoc(1L) == 1 && byDoc(4L) == 1)
  }

  test("tfidf terms: rare terms outrank corpus-wide ones; term-asc tie-break") {
    val rows = CorpusQ.qTfidfTerms(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val doc0 = rows.filter(_._1 == 0L).sortBy(_._5)
    // doc 0: 'the' tf=4 df=3 -> 4/3 beats any tf=1 term; then tf=1 df=1
    // terms (cat, mat, sat — 'on' has df=1 too? no: 'on' df=1) tie at 1.0,
    // term-asc order -> cat, mat
    assert(doc0.head._2 == "the" && doc0.head._3 == 4)
    assert(doc0.map(_._2).toSeq == Seq("the", "cat", "mat"))
    assert(rows.count(_._1 == 4L) == 1) // doc 4 has only one term
    // every doc contributes at most 3 rows, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._5).sorted.sameElements(1L to rs.length))
    }
  }

  test("corpus filter: priority order dup_prefix > lang_unknown > too_short > kept") {
    val rows = CorpusQ.qCorpusFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(3L) == ("dup_prefix", 0L)) // non-canonical member of the prefix group
    assert(rows(1L) == ("lang_unknown", 0L)) // no markers at all
    assert(rows(4L)._1 == "lang_unknown") // 'solo' has no markers either
    assert(rows(0L) == ("too_short", 0L)) // en but 8 tokens < 20
    assert(rows(2L)._1 == "too_short") // canonical rep, en, but 13 tokens
  }

  test("filter is non-vacuous on real testdata: all four reasons appear") {
    val counts = CorpusQ.qCorpusFilter(spark, "/root/testdata/sf0.001")
      .groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("kept", "dup_prefix", "lang_unknown", "too_short"),
      s"reason mix degenerate: $counts")
    assert(counts("kept") > 0)
  }

  test("MAD gate is robust: planted mega-docs all flag, median barely moves") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQ.qMadOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // every planted doc (doc_id % 101 == 0, 20x token count) must flag
    // (its deviation is ~19x the median, far past any 3*MAD): per-source
    // outliers >= planted; tiny strata may add a few NATURAL outliers
    import org.apache.spark.sql.functions._
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 101 === 0).groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, (_, _, _, nOut)) =>
      assert(nOut >= planted.getOrElse(src, 0L), s"$src missed a planted outlier")
    }
    assert(rows.values.map(_._4).sum > 0)
    // robustness: the median with the planted tail stays within one MAD
    // of the unplanted median (a MEAN would be dragged far outside)
    val unplanted = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(expr("percentile(n_tok, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { case (src, (_, med, mad, _)) =>
      assert(math.abs(med - unplanted(src)) <= math.max(mad, 1L), s"$src median dragged")
    }
  }
}
