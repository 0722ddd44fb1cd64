package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.queries.{CorpusQ, Relational}

/** Laws for the profiling additions (exact values pinned by the DuckDB
  * oracles at both scales; these pin the semantic properties). */
class ProfileQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q_grouping_sets: subtotals and grand total are consistent") {
    val rows = Relational.qGroupingSets(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val detail = rows.filter(r => r._1 != "(all)" && r._2 != "(all)")
    val perSource = rows.filter(r => r._1 != "(all)" && r._2 == "(all)")
    val grand = rows.filter(r => r._1 == "(all)" && r._2 == "(all)")
    assert(grand.length === 1)
    assert(grand.head._3 === detail.map(_._3).sum)
    assert(grand.head._4 === detail.map(_._4).sum)
    perSource.foreach { case (src, _, n, c) =>
      val d = detail.filter(_._1 == src)
      assert(n === d.map(_._3).sum, s"n_docs subtotal for $src")
      assert(c === d.map(_._4).sum, s"sum_chars subtotal for $src")
    }
  }

  test("q_hist_quantiles: one-sided error within a bin; exact matches brute force") {
    val rows = CorpusQ.qHistQuantiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, q, estHi, exact, err) =>
      assert(err === estHi - exact)
      assert(err >= 0, s"sketch underestimated $src/$q")
      assert(err < CorpusQ.HistBinWidth, s"error above bin width for $src/$q (unclamped range)")
    }
    // brute force one source's exact values
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val src = docs.head._1
    val vals = docs.filter(_._1 == src).map(_._2).sorted
    rows.filter(_._1 == src).foreach { case (_, q, _, exact, _) =>
      val rank = math.ceil(vals.length * q / 100.0).toLong
      assert(exact === vals(rank.toInt - 1), s"exact $q for $src")
    }
  }

  test("q_media_resize: thumbnails really decode — mean luma preserved across containers") {
    // same deterministic pixels as BMP and as a PNG re-encode must pool
    // to near-identical thumbnails (PNG is lossless; pooling is the same
    // kernel after the ImageIO transcode)
    val bmp = Multimodal.genBmp(42L, 32, 24)
    val png = Multimodal.encodeImage(Multimodal.bmpToImage(bmp).get, "png")
    val (nw, nh) = Multimodal.thumbDims(32, 24)
    val t1 = Multimodal.resizeBmp(bmp, nw, nh).get
    val viaPng = Multimodal.encodeImage(Multimodal.decodeImage(png).get, "bmp")
    val t2 = Multimodal.resizeBmp(viaPng, nw, nh).get
    val s1 = Multimodal.decodeBmp(t1).get
    val s2 = Multimodal.decodeBmp(t2).get
    assert(s1._1 === nw && s1._2 === nh)
    val full = Multimodal.decodeBmp(bmp).get
    assert(math.abs(s1._3 - full._3) < 0.02f, "pooling must preserve mean luma")
    assert(math.abs(s1._3 - s2._3) < 0.01f, "BMP and PNG-container paths must agree")
  }
}
