package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DeltaQ

/** Laws for the delta/catalog batch (exact values pinned by the DuckDB
  * oracles at both scales; these pin the algorithmic guarantees). */
class DeltaQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q_prefix_jaccard: prefix filtering is COMPLETE — equals brute force over all shingle-sharing pairs") {
    import spark.implicits._
    val filtered = DeltaQ.qPrefixJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // brute force: every pair sharing >= 1 shingle (a superset of every
    // pair with Jaccard > 0), exact intersection, same threshold
    val base = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = base.unionAll(base
      .filter(col("doc_id") % 23 === 7 && size(split(trim(col("text")), "\\s+")) >= 30)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" zq zq zq")).as("text")))
    val sh = corpus
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(sequence(lit(1), size(col("toks")) - 2)).as("i"), col("toks"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("toks"), col("i"), lit(3))).cast("binary")).as("fp"))
      .distinct().cache()
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val brute = sh.as("x").join(sh.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .as[(Long, Long, Long)].collect()
      .flatMap { case (a, b, inter) =>
        val (na, nb) = (n(a), n(b))
        if (inter * 10 >= (na + nb - inter) * DeltaQ.PjThresholdTenths)
          Some((a, b, inter, na, nb)) else None
      }.toSet

    assert(filtered === brute, "prefix-filtered result must equal brute force exactly")
    assert(filtered.nonEmpty, "planted variants must surface")
    // every planted pair whose Jaccard clears the bar is present
    val planted = filtered.filter { case (a, b, _, _, _) => b == a + 3000000L }
    assert(planted.nonEmpty)
  }

  test("q_snapshot_diff: counts reconcile with independent per-doc classification") {
    val got = DeltaQ.qSnapshotDiff(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.foreach { case (id, src, _) =>
      val st =
        if (id % 17 == 3) "removed"
        else if (id % 17 == 5) "changed"
        else "unchanged"
      expected((src, st)) += 1
      if (id % 29 == 0) expected((src, "added")) += 1
    }
    assert(got === expected.toMap)
  }

  test("q_col_stats: one-pass stack matches per-column direct aggregates") {
    val rows = DeltaQ.qColStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val nRows = d.count()
    assert(rows.keySet === Set("doc_id", "lang", "n_chars", "source"))
    rows.values.foreach { case (n, nNull, _, _, _) =>
      assert(n === nRows); assert(nNull === 0L)
    }
    assert(rows("lang")._3 === d.select("lang").distinct().count())
    assert(rows("source")._3 === d.select("source").distinct().count())
    val ids = d.select("doc_id").collect().map(_.getLong(0))
    assert(rows("doc_id")._4 === f"${ids.min}%08d")
    assert(rows("doc_id")._5 === f"${ids.max}%08d")
  }

  test("q_file_skipping: pruning is conservative (skipped => no matches) and totals reconcile per layout") {
    val rows = DeltaQ.qFileSkipping(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))

    // skipped = 1 must force n_match = 0 — min/max pruning never loses rows
    rows.foreach { case (layout, fid, _, skipped, nMatch) =>
      if (skipped == 1L) assert(nMatch === 0L, s"$layout file $fid")
    }
    // every layout places every row exactly once, and per-layout match
    // totals agree with a direct corpus count
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0))
    val expectMatch = docs.count(n => n >= 300 && n < 400).toLong
    Seq("insertion", "clustered").foreach { layout =>
      val ofLayout = rows.filter(_._1 == layout)
      assert(ofLayout.map(_._3).sum === docs.length.toLong, s"$layout row placement")
      assert(ofLayout.map(_._5).sum === expectMatch, s"$layout match total")
    }
    // the demonstration is non-vacuous: the clustered layout skips
    // files, the insertion layout does not
    assert(rows.filter(_._1 == "clustered").map(_._4).sum > 0L)
  }
}
