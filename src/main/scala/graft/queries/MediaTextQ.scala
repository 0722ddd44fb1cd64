package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.CorpusGen
import graft.pipeline.Extract

/** Media-span TEXT under the independent oracle (round-3 verdict #7,
  * stretch): the last flagship column class that was only rows-only /
  * golden-pinned.
  *
  * The Spark side runs the FULL extraction pipeline (classifier ->
  * G-13 assembly -> H-13 stitch) and emits md5(text) per media span.
  * The oracle re-derives the text from the documents parquet alone by
  * simulating MediaOcr's sequential splitmix64 Rng stream in a DuckDB
  * RECURSIVE CTE — a 15-phase state machine consuming exactly one draw
  * per step — and then applying the STITCH LAW (derived statically from
  * HocrText/Assembly, pinned against the real pipeline by
  * MediaTextSpec):
  *
  *   stitched = for each line, every word ++ " ", then "\n"
  *              (+ optional orphan-paragraph word line, + optional
  *               "orphan line " line)  ++ "\n\n"
  *
  * Reading order equals generation order because containment is by
  * text-anchor SEGMENTS (ContainmentIndex), which nest exactly as
  * generated; line IDs are unique (original-index ordinals) so the
  * H-13 line dedup never fires; cleanTokenText reduces each token
  * slice to its vocabulary word (trimSpace strips the break char).
  *
  * Rng recurrence (MediaOcr.Rng — splitmix64 proper, distinct from the
  * hash64 absorb loop): state += 0x9E3779B97F4A7C15; z = state;
  * z = (z ^ z>>>30) * 0xBF58476D1CE4E5B9;
  * z = (z ^ z>>>27) * 0x94D049BB133111EB; out = z ^ z>>>31;
  * int(n) = floorMod(signed(out), n). Draw order per classify():
  * pageLang(4); nBlocks 1+int(3); per block nParas 1+int(2); per para
  * nLines 1+int(3); per line nTokens 2+int(6); per token word int(V),
  * conf int(50), int(5) [+ int(4) if 0]; per line int(4) [+ int(4) if
  * 0]; then int(7) [+ word int(V) if 0]; int(11).
  */
object MediaTextQ {

  /** The classifier vocabulary (MediaOcr.vocab — spec-level constant;
    * the spec asserts the two stay identical). */
  private[queries] val Vocab: Array[String] = graft.layout.MediaOcr.vocab

  // ---- Scala reference machine (independent of classify/assembly) ----

  /** Predicted stitched text for one media_ref — the same state machine
    * the SQL oracle runs, in plain Scala. MediaTextSpec pins
    * predictMediaText(ref) == SpanExtract.extractSpanText("media",_,ref)
    * so the law (not just the SQL) is verified against the pipeline. */
  def predictMediaText(ref: String): String = {
    var state = graft.layout.MediaOcr.hash64(ref)
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def int(n: Int): Int = Math.floorMod(next(), n.toLong).toInt
    val sb = new StringBuilder
    int(4) // pageLang
    val nBlocks = 1 + int(3)
    for (_ <- 0 until nBlocks) {
      val nParas = 1 + int(2)
      for (_ <- 0 until nParas) {
        val nLines = 1 + int(3)
        for (_ <- 0 until nLines) {
          val nTokens = 2 + int(6)
          for (_ <- 0 until nTokens) {
            sb.append(Vocab(int(Vocab.length))).append(' ')
            int(50) // confidence
            if (int(5) == 0) int(4) // token language
          }
          if (int(4) == 0) int(4) // line language
          sb.append('\n')
        }
      }
    }
    if (int(7) == 0) sb.append(Vocab(int(Vocab.length))).append(' ').append('\n')
    if (int(11) == 0) sb.append("orphan line \n")
    sb.append("\n\n")
    sb.toString
  }

  // ---- the Spark queries ----

  def qExtractMediaText(s: SparkSession, dir: String): DataFrame =
    Extract.run(CorpusGen.fromDocuments(s, dir))
      .select(col("doc_id"), explode(col("span_seq")).as("sp"))
      .filter(col("sp.kind") === "media")
      .select(col("doc_id"), col("sp.order").as("span_order"),
        md5(col("sp.text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"), col("span_order"))

  /** pdf_layout-span TEXT under the same machine: CorpusGen renders real
    * hOCR from MediaOcr.classify("pdf://<doc>/<i>") and extraction does
    * parse -> H-13 stitch, so the round-trip (render -> parse -> stitch)
    * reproduces exactly the classify -> assembly -> stitch text the Rng
    * machine predicts — only the seed string differs from the media
    * case. SpanTextSpec pins that round-trip law on every pdf span of a
    * corpus-shaped fixture set. Reads the materialized pre-split layout
    * (like q_extract_text): the battery measures extraction, and the
    * pre-split order reconstruction gets a text-level oracle row too. */
  def qExtractPdfText(s: SparkSession, dir: String): DataFrame =
    Extract.run(s.read.parquet(CorpusGen.materializedPreSplit(s, dir)))
      .select(col("doc_id"), explode(col("span_seq")).as("sp"))
      .filter(col("sp.kind") === "pdf_layout")
      .select(col("doc_id"), col("sp.order").as("span_order"),
        md5(col("sp.text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"), col("span_order"))

  // ---- the DuckDB oracle: Rng stream as a recursive state machine ----

  import FlagshipQ.{floorModSql, hash64Sql, hex16Sql, mul64, C1, C2, M64s, Seed}

  /** One Rng output from the incremented state column `nstate`. */
  private def routSql: (String, String, String) = {
    val z1 = mul64("xor(nstate, nstate // 1073741824::HUGEINT)", C1) // >>> 30
    val z2 = mul64("xor(z1, z1 // 134217728::HUGEINT)", C2) // >>> 27
    val rout = "xor(z2, z2 // 2147483648::HUGEINT)" // >>> 31
    (z1, z2, rout)
  }

  /** The classify() ref for a media span ('img://<hex16(hi)>'). */
  private[queries] val mediaRefSql: String = s"'img://' || ${hex16Sql("hi")}"

  /** The classify() ref CorpusGen uses for a pdf_layout span. */
  private[queries] val pdfRefSql: String = "'pdf://' || doc_id || '/' || span_order"

  private[queries] def kindPickSql: String = floorModSql("hi", 10)

  /** The recursive-machine CTE list (no WITH keyword, no final select):
    * [[HtmlTextQ.spanCtesWithText]]'s (doc_id, text, span_order, hi)
    * chain, a `seed` CTE seeding hash64(refExpr) for the spans matching
    * `kindFilter`, and the 15-phase `machine` that consumes exactly one
    * Rng draw per step and accumulates text fragments. Callers append
    * their own final SELECT (and may reference k for kind/media_ref). */
  private[queries] def machineCtes(refExpr: String, kindFilter: String): String = {
    val (z1, z2, rout) = routSql
    def d(n: Int) = floorModSql("rout", n)
    val vocabList = Vocab.map(w => s"'$w'").mkString("[", ", ", "]")
    val word = s"list_extract($vocabList, CAST(${d(Vocab.length)} AS INT) + 1)"
    val tokEnd = s"((phase = 'TL' AND ${d(5)} <> 0) OR phase = 'TL2')"
    val lineEnd = s"((phase = 'LL' AND ${d(4)} <> 0) OR phase = 'LL2')"
    // NB draws int(3), NP int(2), NL int(3), NT int(6)
    s"""${HtmlTextQ.spanCtesWithText}, seed AS (
       |  SELECT doc_id, span_order,
       |         ${hash64Sql(refExpr)} AS st
       |  FROM k WHERE $kindFilter
       |), machine AS (
       |  SELECT doc_id, span_order, 0 AS step, st AS state, 'PL' AS phase,
       |         0 AS b_rem, 0 AS p_rem, 0 AS l_rem, 0 AS t_rem, '' AS frag
       |  FROM seed
       |  UNION ALL
       |  SELECT doc_id, span_order, step + 1, nstate,
       |    CASE
       |      WHEN phase = 'PL' THEN 'NB'
       |      WHEN phase = 'NB' THEN 'NP'
       |      WHEN phase = 'NP' THEN 'NL'
       |      WHEN phase = 'NL' THEN 'NT'
       |      WHEN phase = 'NT' THEN 'W'
       |      WHEN phase = 'W' THEN 'C'
       |      WHEN phase = 'C' THEN 'TL'
       |      WHEN phase = 'TL' AND ${d(5)} = 0 THEN 'TL2'
       |      WHEN $tokEnd AND t_rem > 1 THEN 'W'
       |      WHEN $tokEnd THEN 'LL'
       |      WHEN phase = 'LL' AND ${d(4)} = 0 THEN 'LL2'
       |      WHEN $lineEnd AND l_rem > 1 THEN 'NT'
       |      WHEN $lineEnd AND p_rem > 1 THEN 'NL'
       |      WHEN $lineEnd AND b_rem > 1 THEN 'NP'
       |      WHEN $lineEnd THEN 'E1'
       |      WHEN phase = 'E1' AND ${d(7)} = 0 THEN 'E1W'
       |      WHEN phase = 'E1' THEN 'E2'
       |      WHEN phase = 'E1W' THEN 'E2'
       |      ELSE 'DONE'
       |    END,
       |    CASE WHEN phase = 'NB' THEN CAST(1 + ${d(3)} AS INT)
       |         WHEN $lineEnd AND l_rem = 1 AND p_rem = 1 THEN b_rem - 1
       |         ELSE b_rem END,
       |    CASE WHEN phase = 'NP' THEN CAST(1 + ${d(2)} AS INT)
       |         WHEN $lineEnd AND l_rem = 1 THEN p_rem - 1
       |         ELSE p_rem END,
       |    CASE WHEN phase = 'NL' THEN CAST(1 + ${d(3)} AS INT)
       |         WHEN $lineEnd THEN l_rem - 1
       |         ELSE l_rem END,
       |    CASE WHEN phase = 'NT' THEN CAST(2 + ${d(6)} AS INT)
       |         WHEN $tokEnd THEN t_rem - 1
       |         ELSE t_rem END,
       |    CASE WHEN phase = 'W' THEN $word || ' '
       |         WHEN phase = 'E1W' THEN $word || ' ' || chr(10)
       |         WHEN $lineEnd THEN chr(10)
       |         WHEN phase = 'E2' THEN
       |           CASE WHEN ${d(11)} = 0 THEN 'orphan line ' || chr(10) ELSE '' END ||
       |           chr(10) || chr(10)
       |         ELSE '' END
       |  FROM (
       |    SELECT *, $rout AS rout FROM (
       |      SELECT *, $z2 AS z2 FROM (
       |        SELECT *, $z1 AS z1 FROM (
       |          SELECT machine.*, (state + $Seed::HUGEINT) % $M64s::HUGEINT AS nstate
       |          FROM machine WHERE phase <> 'DONE'
       |        )
       |      )
       |    )
       |  )
       |)""".stripMargin
  }

  /** md5-per-span final select shared by the media and pdf oracles. */
  private val textMd5Select: String =
    """SELECT 'doc_' || doc_id AS doc_id, span_order,
      |       md5(string_agg(frag, '' ORDER BY step)) AS text_md5
      |FROM machine
      |GROUP BY doc_id, span_order
      |ORDER BY doc_id, span_order""".stripMargin

  val oracle: String =
    s"WITH RECURSIVE ${machineCtes(mediaRefSql, s"$kindPickSql >= 7")}\n$textMd5Select"

  val pdfOracle: String =
    s"WITH RECURSIVE ${machineCtes(pdfRefSql, s"$kindPickSql >= 4 AND $kindPickSql < 7")}\n$textMd5Select"
}
