package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQ, MiningQ, SimilarityQ}

/** Semantic laws for the mining batch (exact values pinned by the DuckDB
  * oracles; these pin the PROPERTIES that make the numbers meaningful,
  * each against an independent in-memory brute force). */
class MiningQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def docsText(): Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def normWords(t: String): Array[String] =
    t.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT).trim.split(" ")

  // classic DP Levenshtein — the independent reference for the query's
  // levenshtein() builtin (valid here because the corpus is pure ASCII,
  // the documented oracle-safety precondition)
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("fuzzy dedup: every planted variant pair recovered; distances match DP brute force") {
    val rows = MiningQ.qFuzzyDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val docs = docsText()
    val expectedPlants = docs.count { case (id, t) => id % 37 == 0 && t.length >= 60 }
    assert(expectedPlants > 0, "fixture must plant at least one variant")
    val planted = rows.filter(_._4)
    assert(planted.length == expectedPlants, "every planted pair must survive the blocking")
    assert(planted.forall(_._3 <= 3), "a 3-char overwrite is at most 3 edits")
    // distances agree with an independent DP implementation
    val byId = docs.toMap ++ docs.collect {
      case (id, t) if id % 37 == 0 && t.length >= 60 =>
        (id + 1000000L, t.substring(0, 24) + "qzx" + t.substring(27))
    }
    rows.foreach { case (a, b, d, _) =>
      assert(lev(byId(a), byId(b)) == d, s"pair ($a,$b)")
    }
    // blocking soundness: every reported pair shares the 16-char prefix
    rows.foreach { case (a, b, _, _) =>
      assert(byId(a).take(16) == byId(b).take(16))
    }
  }

  test("fuzzy block cap: oversized block excluded entirely, boundary block kept, drop never silent") {
    import spark.implicits._
    // 300 docs share one 16-char prefix (pairwise edit distance <= 3, so
    // every pair WOULD qualify if joined) — over MaxFuzzyBlock, must be
    // excluded before any Levenshtein runs
    val mega = (0 until 300).map(i => (1000L + i, "MEGABLOCKPREFIX_" + f"suffix$i%04d"))
    // exactly MaxFuzzyBlock docs: the boundary block is KEPT (cap is >)
    val edge = (0 until MiningQ.MaxFuzzyBlock).map(i => (5000L + i, "EDGEBLOCKPREFIX_" + f"$i%02x"))
    val small = Seq((1L, "SMALLBLOCKPREFIX one two"), (2L, "SMALLBLOCKPREFIX one twq"))
    val corpus = (mega ++ edge ++ small).toDF("doc_id", "text")
      .withColumn("blk", org.apache.spark.sql.functions.expr("substr(text, 1, 16)"))
    val rows = MiningQ.fuzzyPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!rows.exists(p => p._1 >= 1000L && p._1 < 2000L),
      "mega block (300 > cap) must contribute zero pairs")
    val edgePairs = rows.filter(p => p._1 >= 5000L)
    val n = MiningQ.MaxFuzzyBlock
    assert(edgePairs.length == n * (n - 1) / 2,
      "boundary block (exactly the cap) must keep ALL its pairs")
    assert(edgePairs.forall(_._3 <= 2))
    assert(rows.contains((1L, 2L, 1L)), "small block's qualifying pair survives")
    // the drop-report law on the same corpus shape: dropped flags exactly
    // the oversized block (report built on the pre-cap relation)
    val profile = corpus.groupBy("blk")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(profile("MEGABLOCKPREFIX_") == 300 && profile("EDGEBLOCKPREFIX_") == n.toLong)
  }

  test("count-min: one-sided error law + estimates match an in-memory sketch") {
    val rows = MiningQ.qCmsHeavy(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // the CMS law: never underestimates
    rows.foreach { case (b, exact, est, over) =>
      assert(est >= exact, s"underestimate on '$b'")
      assert(over == (est > exact))
    }
    // independent sketch: count every bigram occurrence into d x w cells
    val d = MiningQ.CmsDepth
    val w = MiningQ.CmsWidth
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    val exactCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, t) <- docsText(); ws = normWords(t); i <- 0 until ws.length - 1) {
      val b = ws(i) + " " + ws(i + 1)
      exactCnt(b) += 1
    }
    for ((b, c) <- exactCnt; j <- 0 until d) {
      val cell = java.lang.Long.parseLong(md5hex(b).substring(j * 7, j * 7 + 7), 16) % w
      cells((j, cell)) += c
    }
    rows.foreach { case (b, exact, est, _) =>
      assert(exactCnt(b) == exact, s"exact count of '$b'")
      val expected = (0 until d).map { j =>
        cells((j, java.lang.Long.parseLong(md5hex(b).substring(j * 7, j * 7 + 7), 16) % w))
      }.min
      assert(expected == est, s"estimate of '$b'")
    }
  }

  test("winnowing: selected set matches brute force; guarantee/density laws") {
    val rows = MiningQ.qWinnowFp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val w = MiningQ.WinnowWindow
    val byDoc = docsText().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, nGrams, nWindows, nFps, per1000) =>
      val ws = normWords(byDoc(id))
      val hashes = (0 to ws.length - 3).map(i => md5hex(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)))
      assert(nGrams == hashes.length)
      assert(nWindows == hashes.length - w + 1)
      val fps = hashes.sliding(w).map(_.min).toSet
      assert(nFps == fps.size, s"doc $id fingerprint set")
      assert(nFps >= 1 && nFps <= nWindows)
      assert(per1000 == 1000 * nFps / nWindows)
    }
    // docs shorter than one full window are excluded, all others present
    val expectedDocs = byDoc.collect { case (id, t) if normWords(t).length - 2 >= w => id }.toSet
    assert(rows.map(_._1).toSet == expectedDocs)
  }

  test("containment: asymmetric, bounded by 1, consistent with brute-force shingle sets") {
    val rows = DedupQ.qShingleContain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty, "threshold must keep some pairs at sf0.001")
    val sets = docsText().filter(_._1 < 40).map { case (id, t) =>
      val n = t.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
      id -> (1 to n.length - 3).map(i => n.substring(i - 1, i + 3)).toSet
    }.toMap
    rows.foreach { case (a, b, inter, nA, c) =>
      val expInter = (sets(a) & sets(b)).size
      assert(inter == expInter && nA == sets(a).size, s"pair ($a,$b)")
      assert(c <= 1.0 && c >= 0.65)
      assert(c == math.round(10000.0 * expInter / sets(a).size) / 10000.0)
    }
  }

  test("pq ann: codes and ADC distances match an in-memory product quantizer") {
    val rows = SimilarityQ.qPqAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray))
      .toMap
    val subs = (v: Array[Long], m: Int) => v.slice(m * 8, m * 8 + 8)
    val dist = (a: Array[Long], b: Array[Long]) =>
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = (0L until 16L).map(c => c -> vecs(c)).toMap
    def code(v: Array[Long], m: Int): Long =
      (0L until 16L).minBy(c => (dist(subs(v, m), subs(cents(c), m)), c))
    val expected = (0L until 5L).flatMap { q =>
      val cand = vecs.keys.filter(_ >= 5).map { id =>
        val adc = (0 until 8).map(m => dist(subs(vecs(q), m), subs(cents(code(vecs(id), m)), m))).sum
        (id, adc)
      }.toSeq.sortBy { case (id, adc) => (adc, id) }.take(10)
      cand.zipWithIndex.map { case ((id, adc), i) => (q, i + 1, id, adc) }
    }.toSet
    assert(rows.toSet == expected)
  }
}
