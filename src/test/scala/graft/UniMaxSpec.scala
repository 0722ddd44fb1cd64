package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SampleQ

/** q_unimax_alloc pins: the window-function water-filling closed form
  * must EQUAL the UniMax paper's sequential greedy (ascending caps,
  * alloc = min(cap, floor(remaining / remaining_langs))) on every
  * instance — that equivalence is the whole point of the rewrite (no
  * cross-engine sequential fold). Randomized instances exercise both
  * branches, the q/q+1 remainder tail, and degenerate shapes the real
  * corpus never shows. */
class UniMaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The paper's greedy, exact integers: langs ascending by (cap, lang),
    * each takes min(cap, floor(remaining / remaining_langs)). */
  private def greedy(avail: Seq[(String, Long)], epochCap: Long,
                     budget: Long): Map[String, Long] = {
    val caps = avail.map { case (l, a) => (l, a * epochCap) }
      .sortBy { case (l, c) => (c, l) }
    var r = budget
    var m = caps.length.toLong
    caps.map { case (l, c) =>
      val alloc = math.min(c, r / m)
      r -= alloc; m -= 1
      l -> alloc
    }.toMap
  }

  /** Run the Spark-side SQL over an in-memory documents relation. */
  private def runSql(rows: Seq[(Long, String, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("documents")
    spark.sql(SampleQ.unimaxSparkSql).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
  }

  test("closed form == sequential greedy on randomized instances") {
    val rng = new scala.util.Random(20260820L)
    (1 to 30).foreach { trial =>
      val nLangs = 1 + rng.nextInt(8)
      val rows = (0 until nLangs).flatMap { li =>
        val lang = f"l$li%02d"
        (0 until (1 + rng.nextInt(6))).map { di =>
          (li * 100L + di, "t", lang, "src0", 1L + rng.nextInt(5000).toLong)
        }
      }
      val avail = rows.groupBy(_._3).view
        .mapValues(_.map(r => (r._5 + 3) / 4).sum).toSeq.sortBy(_._1)
      val budget = avail.map(_._2).sum * SampleQ.UniMaxBudgetX
      val expect = greedy(avail, SampleQ.UniMaxEpochCap, budget)
      val got = runSql(rows)
      assert(got.map(_._1).toSeq == avail.map(_._1).sorted, s"trial $trial langs")
      got.foreach { case (lang, av, cap, isCapped, alloc, epochsX100) =>
        assert(alloc == expect(lang), s"trial $trial lang $lang: $alloc != ${expect(lang)}")
        assert(cap == av * SampleQ.UniMaxEpochCap)
        assert(alloc <= cap, s"trial $trial lang $lang over cap")
        // the capped flag implies the cap bound exactly (an uncapped
        // language's uniform share may coincidentally equal its cap, so
        // the converse is not asserted)
        if (isCapped == 1L) assert(alloc == cap, s"trial $trial lang $lang capped flag")
        assert(epochsX100 == (100L * alloc) / math.max(av, 1L))
      }
      // budget exactness: fully spent unless EVERY language capped out
      val spent = got.map(_._5).sum
      if (got.exists(_._4 == 0L)) assert(spent == budget, s"trial $trial spent")
      else assert(spent == got.map(_._3).sum)
    }
  }

  test("cap cascade and remainder tail are exact (hand-computed fixtures)") {
    // skewed instance: both small langs hit their caps, the big one
    // absorbs the rest — budget = 4 * (3+5+9) = 68
    val rows = Seq(
      (1L, "t", "aa", "src0", 9L),   // avail (9+3)/4  = 3  -> cap 15
      (2L, "t", "bb", "src0", 17L),  // avail (17+3)/4 = 5  -> cap 25
      (3L, "t", "cc", "src0", 33L))  // avail (33+3)/4 = 9  -> cap 45
    val got = runSql(rows).map(r => r._1 -> r._5).toMap
    // caps 15 < 25 < 45; shares: floor(68/3)=22 (<15? no -> aa takes 15!)
    // aa IS capped (cap 15 < share 22): greedy -> aa=15, rem 53/2=26>25 ->
    // bb capped at 25, rem 28/1=28 < 45 -> cc=28
    assert(got == Map("aa" -> 15L, "bb" -> 25L, "cc" -> 28L))
    // now with no caps binding: epochCap is fixed, so scale availability
    // evenly (caps 5x the uniform share never bind)
    val rows2 = Seq(
      (1L, "t", "aa", "src0", 41L),  // avail 11 -> cap 55
      (2L, "t", "bb", "src0", 41L),  // avail 11 -> cap 55
      (3L, "t", "cc", "src0", 45L))  // avail 12 -> cap 60
    // budget = 4*34 = 136 = 45*3 + 1 -> q=45 r=1 -> aa=45, bb=45, cc=46
    val got2 = runSql(rows2).map(r => r._1 -> r._5).toMap
    assert(got2 == Map("aa" -> 45L, "bb" -> 45L, "cc" -> 46L))
  }

  test("degenerate single language: uncapped, takes the whole budget") {
    val got = runSql(Seq((1L, "t", "xx", "src0", 100L))) // avail 25
    assert(got.length == 1)
    val (_, av, cap, isCapped, alloc, epochs) = got.head
    assert(av == 25L && cap == 125L && isCapped == 0L)
    assert(alloc == 100L && epochs == 400L) // budget 4*25, under the 5-epoch cap
  }

  test("real corpus: allocation respects caps and spends the exact budget") {
    val dir = "/root/testdata/sf0.001"
    val rows = SampleQ.all("q_unimax_alloc")._1(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * SampleQ.UniMaxBudgetX
    rows.foreach { case (lang, av, cap, _, alloc, _) =>
      assert(alloc <= cap, s"$lang over its epoch cap")
      assert(cap == av * SampleQ.UniMaxEpochCap)
    }
    if (rows.exists(_._4 == 0L)) assert(rows.map(_._5).sum == budget)
    // and the greedy agrees end-to-end on the real distribution
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), (r.getLong(1) + 3) / 4))
    val avail = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val expect = greedy(avail, SampleQ.UniMaxEpochCap, budget)
    rows.foreach { case (lang, _, _, _, alloc, _) =>
      assert(alloc == expect(lang), s"$lang: $alloc != ${expect(lang)}")
    }
  }
}
