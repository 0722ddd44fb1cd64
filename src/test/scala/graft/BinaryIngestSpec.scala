package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BinaryIngest

/** The binaryFile ingestion source (C-6 semantics: page order =
  * lexicographic path order, doc = containing directory, type from
  * magic bytes). */
class BinaryIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root: String = {
    val d = Files.createTempDirectory("ingest").toString
    // create out of order on purpose: page order must come from the PATH
    // sort, not creation/arrival order. 12 pages so a non-padded name
    // scheme (p10 < p2 lexicographically) would be caught.
    val docA = Paths.get(d, "docA"); Files.createDirectories(docA)
    val order = scala.util.Random.shuffle((0 until 12).toList)
    order.foreach { p =>
      val magic: Array[Byte] =
        if (p % 2 == 0) Array(0xFF, 0xD8, 0xFF).map(_.toByte)
        else Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
      Files.write(docA.resolve(f"p$p%03d.bin"), magic ++ Array.fill(p + 1)(0.toByte))
    }
    // a second doc, nested deeper (recursive lookup), with a PDF and junk
    val docB = Paths.get(d, "nested", "docB"); Files.createDirectories(docB)
    Files.write(docB.resolve("p000.bin"), "%PDF-1.4 fake".getBytes("ISO-8859-1"))
    Files.write(docB.resolve("p001.bin"), "no magic here".getBytes("ISO-8859-1"))
    Files.write(docB.resolve("ignore.txt"), "not matched by glob".getBytes("ISO-8859-1"))
    d
  }

  test("page order from lexicographic path sort; type + length per page") {
    val rows = BinaryIngest.pages(spark, root, glob = "*.bin")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(3), r.getLong(4)))
    val a = rows.filter(_._1 == "docA").sortBy(_._2)
    assert(a.length == 12)
    // page_idx k corresponds to file p00k (path sort), whose length is k+magic
    a.foreach { case (_, idx, tpe, len) =>
      val expectedType = if (idx % 2 == 0) "JPEG" else "PNG"
      val magicLen = if (idx % 2 == 0) 3 else 4
      assert(tpe == expectedType && len == magicLen + idx + 1, s"page $idx: $tpe $len")
    }
  }

  test("same-named directories under different shards fail loudly, never merge") {
    val d = Files.createTempDirectory("ingest_collide").toString
    for (shard <- Seq("shard1", "shard2")) {
      val doc = Paths.get(d, shard, "docX"); Files.createDirectories(doc)
      Files.write(doc.resolve("p000.bin"), Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte))
    }
    val ex = intercept[Exception] {
      BinaryIngest.pages(spark, d, glob = "*.bin").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("docX")),
      s"collision error must name the colliding directory: ${messages(ex)}")
  }

  test("recursive lookup, glob filter, PDF and unknown magic") {
    val rows = BinaryIngest.pages(spark, root, glob = "*.bin")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(3)))
    val b = rows.filter(_._1 == "docB").sortBy(_._2)
    assert(b.map(_._3).toSeq == Seq("PDF", "UNKNOWN")) // ignore.txt excluded
    assert(!rows.exists(_._1 == "nested")) // doc = IMMEDIATE parent dir
  }
}
