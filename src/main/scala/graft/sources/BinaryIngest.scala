package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pdf.PdfOps

/** File-system ingestion — the Spark-native form of the reference's
  * entry point (cmd mains: os.ReadFile per PDF, filepath.Glob +
  * sort.Strings for page images, cmd/pdfocr/main.go:260-265 and
  * cmd/gdocai/main.go:624). Spark's `binaryFile` source scans a
  * directory tree distributively into (path, modificationTime, length,
  * content) rows; this module shapes that into the engine's page table.
  *
  * Semantics preserved from the reference:
  *   - document = the containing directory (one doc's pages live
  *     together, as the CLI's per-document glob does);
  *   - page order = LEXICOGRAPHIC path order within the document (C-6:
  *     filepath.Glob returns sorted paths) — materialized as an explicit
  *     `page_idx` column via a per-doc window, so downstream ordering
  *     comes from DATA, never partition order;
  *   - media type from magic bytes (P-10 detectImageType, extended with
  *     the %PDF- header).
  *
  * Scale notes: the binaryFile scan is a real distributed source
  *   (partitioned by file, filter pushdown on path/length); the only
  *   shuffle is the per-doc window over slim (path) rows. One parquet/
  *   Iceberg materialization of this table is the production first step
  *   — the engine's corpus format — after which everything is columnar. */
object BinaryIngest {

  private val detectType = udf((b: Array[Byte]) =>
    PdfOps.detectImageType(b).getOrElse {
      if (b != null && b.length >= 5 && new String(b, 0, 5, ISO_8859_1) == "%PDF-") "PDF"
      else "UNKNOWN"
    })

  /** Directory tree of per-page binary files -> the page table
    * (doc_id, page_idx, path, media_type, length, content). */
  def pages(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("path"))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .withColumn("doc_id", element_at(split(col("path"), "/"), -2))
      .withColumn("page_idx", (row_number().over(w) - 1).cast("int"))
      .withColumn("media_type", detectType(col("content")))
      .select(col("doc_id"), col("page_idx"), col("path"),
        col("media_type"), col("length"), col("content"))
  }
}
