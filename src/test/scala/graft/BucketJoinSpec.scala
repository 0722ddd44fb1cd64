package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join — the storage-level answer to "this join
  * must not shuffle 100 TB": two tables bucketed+sorted on the join key
  * join with ZERO Exchange in the physical plan (each bucket pair joins
  * in place). This is the layout the lineage/staging tables and any
  * repeatedly-joined corpus table should be written in at scale; the
  * spec pins that Spark actually elides the shuffle on our layout, and
  * that the result is identical to the plain (shuffling) join. */
class BucketJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", s"/tmp/graft_bucket_wh_${ProcessHandle.current().pid()}")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with zero Exchange and identical results") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val left = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val right = docs.select(col("doc_id"), length(col("text")).as("text_len"))
    spark.sql("DROP TABLE IF EXISTS docs_meta_b")
    spark.sql("DROP TABLE IF EXISTS docs_len_b")
    left.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("docs_meta_b")
    right.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("docs_len_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("docs_meta_b").join(spark.table("docs_len_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1200)}")
      // bucket pruning metadata actually applied on both scans
      assert(plan.contains("Bucketed: true"), plan.take(1200))

      val viaBuckets = joined.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).sortBy(_._1)
      val plain = left.join(right, "doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).sortBy(_._1)
      assert(viaBuckets.length == plain.length && viaBuckets.sameElements(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS docs_meta_b")
      spark.sql("DROP TABLE IF EXISTS docs_len_b")
    }
  }
}
