package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bisects q_fuzzy_dedup's runtime: times each sub-plan (corpus scan,
  * ASCII rlike filter, block window, capped self-join, Levenshtein
  * kernel) in one session so the slow stage is attributable. Usage:
  * runMain graft.tools.FuzzyProbe <sfDir>
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-fuzzyprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"FP $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

    // warm the scan
    time("warm_scan_count")(docs.count())
    time("scan_count_2")(docs.count())

    val asciiOnly = docs.filter(!col("text").rlike("[^\\x00-\\x7F]"))
    time("rlike_filter_count")(asciiOnly.count())
    time("rlike_filter_count_2")(asciiOnly.count())

    val variants = asciiOnly
      .filter(col("doc_id") % 37 === 0 && length(col("text")) >= 60)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substr(text, 1, 24)"), lit("qzx"), expr("substr(text, 28)")).as("text"))
    val corpus = asciiOnly.unionAll(variants)
      .select(col("doc_id"), col("text"), expr("substr(text, 1, 16)").as("blk"))
    time("corpus_count")(corpus.count())

    val w = Window.partitionBy(col("blk"))
    val capped = corpus
      .withColumn("bn", count(lit(1)).over(w))
      .filter(col("bn") <= 256)
      .select(col("doc_id"), col("text"), col("blk"))
    time("capped_count")(capped.count())
    time("capped_count_2")(capped.count())

    val joined = capped.as("a")
      .join(capped.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
    val nJoined = time("join_count")(joined.count())
    time("join_count_2")(joined.count())
    println(s"FP   joined_rows = $nJoined")

    // microbench: same pairs, levenshtein over a pre-materialized local relation
    val pairs = joined.select(col("a.text").as("ta"), col("b.text").as("tb")).collect()
    println(s"FP   collected_pairs = ${pairs.length}")
    val t0 = System.nanoTime()
    var acc = 0L
    pairs.foreach { r =>
      acc += org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
        .levenshteinDistance(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
    }
    println(f"FP   utf8_lev_local            ${(System.nanoTime() - t0) / 1e9}%.2fs (acc=$acc)")

    val withLev = joined
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= 8)
    time("lev_count")(withLev.count())
    time("lev_count_2")(withLev.count())

    val full = withLev
      .withColumn("is_planted", col("doc_b") === col("doc_a") + 1000000L)
      .orderBy(col("doc_a"), col("doc_b"))
    time("full_noop_write")(full.write.format("noop").mode("overwrite").save())
    time("full_noop_write_2")(full.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
