package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The distributed extraction job (SURVEY.md §3.4):
  *
  *   scan (doc_id, spans) -> posexplode -> repartition by (doc_id, pos)
  *   [spreads mega-doc skew across the cluster BEFORE the heavy per-span
  *   work; the reference's own distributed shape is per-page independence,
  *   gdocai.go:77-111] -> per-span extraction (opaque string work in one
  *   UDF; everything around it stays native/codegen) -> groupBy(doc_id)
  *   stitch with array_sort on the `order` field (ordering comes from
  *   data, never from partition order).
  *
  * `order` = position of the span in the input array (offsets are
  * strictly increasing per input_hint, so rank(offset) == pos).
  */
object Extract {

  private val extractUdf =
    udf((kind: String, text: String, mediaRef: String) =>
      SpanExtract.extractSpanText(kind, text, mediaRef))

  /** Exploded per-span extraction, one row per span. */
  def extractSpans(input: DataFrame, spread: Boolean = true): DataFrame = {
    val exploded = input
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
    // Salted spread: without it, all spans of one mega-doc stay in the
    // partition that read the parquet row — a straggler at 100 TB.
    val spreadDf = if (spread) exploded.repartition(col("doc_id"), col("pos")) else exploded
    spreadDf.select(
      col("doc_id"),
      col("span.kind").as("kind"),
      extractUdf(col("span.kind"), col("span.text"), col("span.media_ref")).as("text"),
      col("span.media_ref").as("media_ref"),
      col("pos").as("order"))
  }

  /** Full job: (doc_id, spans) -> (doc_id, span_seq) with span_seq sorted
    * by `order`. */
  def run(input: DataFrame, spread: Boolean = true): DataFrame = {
    extractSpans(input, spread)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("order"), col("kind"), col("text"), col("media_ref")))).as("seq0"))
      .select(
        col("doc_id"),
        transform(col("seq0"), (s: Column) => struct(
          s.getField("kind").as("kind"),
          s.getField("text").as("text"),
          s.getField("media_ref").as("media_ref"),
          s.getField("order").as("order"))).as("span_seq"))
  }
}
