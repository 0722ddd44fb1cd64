package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQ

/** qDedupCluster (connected components by min-label propagation) against
  * an independent in-test union-find over the same candidate pairs — on
  * a CHAIN corpus whose component diameter forces many propagation
  * rounds (the shape a fixed iteration cap would silently truncate). */
class DedupClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("dedupchain").toString
    // sliding-window texts: docs i and i+1 share 19 of 20 words -> LSH
    // chains adjacent docs; far docs share nothing
    val words = (0 until 80).map(i => s"tok${i}word")
    val chain = (0L until 60L).map { i =>
      (i, words.slice(i.toInt / 3, i.toInt / 3 + 20).mkString(" "))
    }
    val lone = Seq((900L, "completely different content island one of a kind here"),
      (901L, "another unrelated island with its very own words entirely"))
    (chain ++ lone).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("label propagation == union-find on a deep chain (no truncated components)") {
    val pairs = DedupQ.qMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= 15, s"chain corpus produced too few candidate pairs: ${pairs.length}")

    // independent union-find over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val sizes = expected.groupBy(_._2).map { case (rep, m) => rep -> m.size.toLong }

    val got = DedupQ.qDedupCluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (doc, rep, size) =>
      assert(rep == expected(doc), s"doc $doc: rep $rep != union-find ${expected(doc)}")
      assert(size == sizes(rep), s"doc $doc: size $size != ${sizes(rep)}")
    }
    // the point of the corpus: at least one genuinely deep component
    assert(sizes.values.max >= 10, s"chain didn't chain: sizes ${sizes.values.toVector.sorted}")
  }
}
