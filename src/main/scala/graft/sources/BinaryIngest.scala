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
  *   - document = the containing DIRECTORY (one doc's pages live
  *     together, as the CLI's per-document glob does). Document
  *     identity is the full parent PATH — two directories that share a
  *     NAME under different shards stay distinct documents; the
  *     `doc_id` column carries the directory name, and its uniqueness
  *     across parent paths is ENFORCED (a colliding batch fails loudly
  *     instead of silently merging documents) while grouping always
  *     keys on the path;
  *   - page order = LEXICOGRAPHIC path order within the document (C-6:
  *     filepath.Glob returns sorted paths) — materialized as an explicit
  *     `page_idx` column via a per-doc window, so downstream ordering
  *     comes from DATA, never partition order;
  *   - media type from magic bytes (P-10 detectImageType, extended with
  *     the %PDF- header).
  *
  * Scale notes: the binaryFile scan is a real distributed source
  *   (partitioned by file, filter pushdown on path/length) that PRUNES
  *   the content column — the page-index pass scans (path) only, so the
  *   window shuffle carries slim listing rows and the raw bytes NEVER
  *   cross the wire (they join back map-side via the broadcast listing;
  *   an ingest batch's file listing is small by construction — a batch
  *   too large to broadcast its listing is split, which production
  *   ingestion does anyway). */
object BinaryIngest {

  private val detectType = udf((b: Array[Byte]) =>
    PdfOps.detectImageType(b).getOrElse {
      if (b != null && b.length >= 5 && new String(b, 0, 5, ISO_8859_1) == "%PDF-") "PDF"
      else "UNKNOWN"
    })

  /** Directory tree of per-page binary files -> the page table
    * (doc_id, page_idx, path, media_type, length, content). */
  def pages(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    def scan = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
    // page indices from a CONTENT-FREE listing scan (binaryFile prunes
    // unselected columns, so this pass never reads file bytes); doc
    // identity = the full parent path, never just its last segment
    val parent = regexp_replace(col("path"), "/[^/]+$", "")
    val w = Window.partitionBy(col("doc_dir")).orderBy(col("path"))
    // the doc_id column carries the directory NAME for readability, so a
    // name shared by two directories under different shards would
    // silently merge distinct documents downstream — ENFORCED unique
    // here (advisor finding, round 3): any doc_id mapping to more than
    // one doc_dir fails the ingest loudly. Listing-sized window; the
    // check never touches content bytes.
    val wId = Window.partitionBy(col("doc_id"))
    val listing = scan.select(col("path"), parent.as("doc_dir"))
      .withColumn("page_idx", (row_number().over(w) - 1).cast("int"))
      .withColumn("doc_id", element_at(split(col("doc_dir"), "/"), -1))
      .withColumn("_uniq", assert_true(
        size(collect_set(col("doc_dir")).over(wId)) === 1,
        concat(lit("BinaryIngest: directory name '"), col("doc_id"),
          lit("' appears under multiple parent paths — same-named documents " +
            "in one ingest batch would merge; ingest the shards separately " +
            "or disambiguate the directory names"))))
      .filter(col("_uniq").isNull) // assert_true: NULL on pass, throws on fail
      .select(col("path"), col("doc_id"), col("page_idx"))
    scan
      .join(broadcast(listing), Seq("path"))
      .withColumn("media_type", detectType(col("content")))
      .select(col("doc_id"), col("page_idx"), col("path"),
        col("media_type"), col("length"), col("content"))
  }
}
