package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQ

/** Laws for q_para_dedup (paragraph dedup with document reassembly) —
  * the DuckDB oracle pins exact values at sf0.01/sf0.1; this pins the
  * algorithm against an independent in-memory brute force at sf0.001:
  * global first-occurrence semantics, lossless reassembly for documents
  * with no duplicated blocks, and md5-exact rebuilt text for rewritten
  * and emptied documents alike. */
class ParaDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_para_dedup equals an in-memory brute force: first occurrence, lossless reassembly, exact md5") {
    val got = DedupQ.qParaDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    // brute force: 32-token blocks incl. partial tail, global
    // first-occurrence in (doc_id, blk) order
    val blocks = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+")
      val n = (toks.length + 31) / 32
      (0 until n).map(i => (id, i, toks.slice(i * 32, i * 32 + 32).mkString(" ")))
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = blocks.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, bs) =>
      val kept = bs.sortBy(_._2).filter { case (_, _, btext) => seen.add(btext) }
      id -> ((bs.length.toLong, kept.length.toLong,
        md5hex(kept.map(_._3).mkString(" "))))
    }.toMap

    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) => assert(v === expected(id), s"doc $id") }

    // the law is exercised, not vacuous: some doc loses a block, and
    // every no-dup doc reassembles to exactly its normalized text
    assert(expected.exists { case (_, (nb, nk, _)) => nk < nb }, "corpus must contain duplicated blocks")
    val untouched = docs.filter { case (id, _) =>
      val (nb, nk, _) = expected(id); nb == nk
    }
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, text) =>
      assert(expected(id)._3 === md5hex(text.trim.split("\\s+").mkString(" ")),
        s"doc $id with no duplicated blocks must reassemble losslessly")
    }
  }
}
