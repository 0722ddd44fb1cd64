package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.BinaryIngest

/** Binary file-system ingestion, oracle-checked with the independent-
  * prediction pattern (like q_pdf_roundtrip): Spark materializes a
  * deterministic directory tree of page files (magic bytes + padding,
  * all derived from doc_id arithmetic), ingests it back through the
  * REAL `binaryFile` source, and reports what it saw — while DuckDB
  * predicts every row (doc, page count, detected type, byte length)
  * from the documents table alone. A broken source scan, path-ordering
  * bug, or magic-byte detector hash-mismatches. */
object IngestQ {

  private def magic(kind: Int): Array[Byte] = kind match {
    case 0 => Array(0xFF, 0xD8, 0xFF).map(_.toByte) // JPEG
    case 1 => Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte) // PNG
    case _ => Array(0x47, 0x49, 0x46).map(_.toByte) // GIF
  }

  /** Write the deterministic fixture tree: docs with
    * doc_id % 50 == 0 get (doc_id % 3) + 1 page files of
    * 64 + doc_id % 10 bytes each. Page files are zero-padded so the
    * lexicographic order the source must reproduce is the page order.
    * The root is DELETED first: an append-only tree would keep stale
    * docN directories from a previous testdata generation and the scan
    * would return rows the oracle does not predict. */
  private def writeFixture(s: SparkSession, dir: String, root: String): Unit = {
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      import scala.jdk.CollectionConverters._
      Files.walk(rootPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") % 50 === 0)
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    docs.foreach { id =>
      val d = Paths.get(root, s"doc$id")
      Files.createDirectories(d)
      (0 to (id % 3).toInt).foreach { p =>
        val m = magic(((id + p) % 3).toInt)
        val body = m ++ Array.fill((64 + id % 10).toInt - m.length)(0.toByte)
        Files.write(d.resolve(f"p$p%03d.bin"), body)
      }
    }
  }

  def qBinaryIngest(s: SparkSession, dir: String): DataFrame = {
    val sfName = Paths.get(dir).getFileName.toString
    val root = s"/tmp/graft_ingest_$sfName"
    writeFixture(s, dir, root)
    BinaryIngest.pages(s, root, glob = "*.bin")
      .select(col("doc_id"), col("page_idx"), col("media_type"), col("length"))
      .orderBy(col("doc_id"), col("page_idx"))
  }

  val qBinaryIngestSql: String =
    """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
      |p AS (SELECT doc_id, CAST(i AS INT) AS page_idx
      |      FROM d, UNNEST(generate_series(0, CAST(doc_id % 3 AS INT))) u(i))
      |SELECT 'doc' || CAST(doc_id AS VARCHAR) AS doc_id, page_idx,
      |  CASE CAST((doc_id + page_idx) % 3 AS INT)
      |    WHEN 0 THEN 'JPEG' WHEN 1 THEN 'PNG' ELSE 'GIF' END AS media_type,
      |  CAST(64 + doc_id % 10 AS BIGINT) AS length
      |FROM p ORDER BY doc_id, page_idx""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_binary_ingest" -> ((qBinaryIngest _, Some(qBinaryIngestSql))))
}
