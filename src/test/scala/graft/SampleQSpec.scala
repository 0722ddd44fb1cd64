package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SampleQ

/** Hash-based sampling/split/mix invariants (exact values are pinned by
  * the DuckDB oracle; these pin the SEMANTIC properties). */
class SampleQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("split partitions the corpus, ratios near 90/5/5, stable across reruns") {
    val q = SampleQ.all("q_corpus_split")._1
    val rows = q(spark, dir).collect().map(r => r.getLong(0) -> r.getString(2))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == total) // every doc gets exactly one split
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, frac)
    assert(frac.values.sum == 1.0)
    // determinism: same assignment on a second run
    assert(q(spark, dir).collect().map(r => r.getLong(0) -> r.getString(2)).toMap == rows.toMap)
  }

  test("sample is a subset consistent with the split buckets") {
    val sample = SampleQ.all("q_hash_sample")._1(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every sampled bucket < 6554, and sampled docs are a strict subset
    assert(sample.values.forall(_ < 6554))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(sample.size > 0 && sample.size < total)
  }

  test("mix keeps everything from src0 and respects per-source monotone fractions") {
    val mix = SampleQ.all("q_source_mix")._1(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n0, k0) = mix("src0")
    assert(n0 == k0) // src0 keeps 100%
    mix.foreach { case (_, (n, k)) => assert(k <= n) }
  }

  test("stratified sample: exactly min(10, stratum) per source, rank follows bucket order") {
    val df = graft.queries.SampleQ.all("q_stratified_sample")._1(spark, dir)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 10))
    bySource.values.foreach { g =>
      // ranks are 1..k and bucket is non-decreasing along the rank
      val sorted = g.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to g.length).toSeq)
      val buckets = sorted.map(_.getLong(2)).toSeq
      assert(buckets == buckets.sorted)
    }
    // full sources contribute exactly 10
    assert(bySource.values.count(_.length == 10) > 0)
  }

  test("domain cap: salted two-phase top-N == one-window brute force for any salt count") {
    import org.apache.spark.sql.functions.col
    // brute force: rank the whole domain in memory on the same total order
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      g.sortBy(t => (-t._3, t._1)).take(SampleQ.DomainCap)
        .zipWithIndex.map { case ((id, _, nc), i) => (src, (i + 1).toLong, id, nc) }
    }.toSet
    // phase-1 salting must be invisible in the OUTPUT for every fan-out,
    // including S=1 (degenerate: phase 1 == the brute force itself)
    for (salts <- Seq(1, 3, 4, 8)) {
      val got = SampleQ.domainCapPlan(spark, dir, salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"salts=$salts")
    }
    // cap law: every domain contributes exactly min(cap, |domain|)
    val perSrc = expected.groupBy(_._1).view.mapValues(_.size).toMap
    val sizes = docs.groupBy(_._2).view.mapValues(_.length).toMap
    sizes.foreach { case (src, n) =>
      assert(perSrc(src) == math.min(SampleQ.DomainCap, n), src)
    }
  }
}
