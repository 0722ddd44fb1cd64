package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPrepQ

/** Training-prep queries pinned against independent plain-Scala
  * recomputation on a handcrafted corpus (the driver's DuckDB oracle is
  * the cross-engine check; this pins the semantics in-repo). */
class TrainPrepQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("trainprepq").toString
    val docs = Seq(
      // doc 0: BENCHMARK (0 % 97 == 0): 9 tokens + sentinel appended
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "srcA", 10L),
      // doc 1: copies doc 0's first 8 tokens -> naturally contaminated
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 xx yy", "en", "srcA", 10L),
      // doc 2: too short for any shingle
      (2L, "p q r", "en", "srcA", 5L),
      // doc 5: 9 clean tokens, no overlap
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "en", "srcB", 10L),
      // doc 13: 13 % 13 == 0 -> sentinel injected -> contaminated
      (13L, "aa bb cc", "en", "srcB", 5L),
      // doc 97: the second benchmark doc
      (97L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "srcB", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("decontaminate: benchmark docs excluded; copied 8-gram and injected sentinel flagged") {
    val rows = TrainPrepQ.qDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!rows.contains(0L) && !rows.contains(97L)) // benchmark docs excluded
    // doc 1: 10 tokens -> 3 shingles; only [w1..w8] is a benchmark shingle
    assert(rows(1L) == ((3L, 1L, 1L)))
    // doc 2: 3 tokens -> 0 shingles, clean
    assert(rows(2L) == ((0L, 0L, 0L)))
    // doc 5: 9 tokens -> 2 shingles, clean
    assert(rows(5L) == ((2L, 0L, 0L)))
    // doc 13: 3 + 8 sentinel tokens -> 4 shingles; the pure-sentinel
    // window matches the benchmark docs' own injected tail
    assert(rows(13L) == ((4L, 1L, 1L)))
  }

  test("ngram novelty: first-copy scores 10000, partial re-use scores the exact fraction") {
    val got = TrainPrepQ.qNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // independent brute force: ascending-doc_id sweep recording each
    // distinct 8-gram's first document
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
      .sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, toks) =>
      toks.sliding(8).filter(_.length == 8).map(_.mkString(" "))
        .foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val expect = docs.flatMap { case (id, toks) =>
      val grams = toks.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
      if (grams.isEmpty) None
      else {
        val novel = grams.count(firstSeen(_) == id).toLong
        Some((id, grams.size.toLong, novel, novel * 10000L / grams.size))
      }
    }
    assert(got.toSeq == expect.toSeq)
    // fixture exercises both poles: a full-novelty doc and a partial one
    assert(got.exists(_._4 == 10000L))
    assert(got.exists(r => r._4 > 0L && r._4 < 10000L))
  }

  test("seq_pack: per-source running pack, correct bin and offset at the boundary") {
    // srcA in doc_id order: doc 0 (9 tok), doc 1 (10 tok), doc 2 (3 tok)
    // srcB: doc 5 (9 tok), doc 13 (3 tok), doc 97 (8 tok)
    val rows = TrainPrepQ.qSeqPack(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(0L) == (("srcA", 9L, 0L, 0L)))
    assert(rows(1L) == (("srcA", 10L, 0L, 9L)))
    assert(rows(2L) == (("srcA", 3L, 0L, 19L)))
    // srcB restarts at offset 0 — packing is per shard
    assert(rows(5L) == (("srcB", 9L, 0L, 0L)))
    assert(rows(13L) == (("srcB", 3L, 0L, 9L)))
    assert(rows(97L) == (("srcB", 8L, 0L, 12L)))
  }

  test("seq_pack: documents overflow into later sequences past the token budget") {
    import spark.implicits._
    val d = Files.createTempDirectory("trainprepq2").toString
    // 3 docs of 100, 200, 30 tokens; SeqLen 256 -> starts 0, 100, 300
    val docs = Seq(
      (0L, Seq.fill(100)("t").mkString(" "), "en", "s", 1L),
      (1L, Seq.fill(200)("t").mkString(" "), "en", "s", 1L),
      (2L, Seq.fill(30)("t").mkString(" "), "en", "s", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TrainPrepQ.qSeqPack(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(rows(0L) == ((0L, 0L)))
    assert(rows(1L) == ((0L, 100L)))
    assert(rows(2L) == ((300L / TrainPrepQ.SeqLen, 300L % TrainPrepQ.SeqLen)))
  }

  test("curate pipeline: reason priority and dense packing over rejects") {
    import spark.implicits._
    val d = Files.createTempDirectory("trainprepq3").toString
    val base8 = "the cat and the dog is on the" // shared 8-token prefix
    val doc10 = base8 + " mat with a hat and a bat plus more filler words here now ok yes"
    val doc11 = base8 + " completely different tail follows here with words that reach twenty tokens"
    val doc12 = "a dog and the cat is in the barn with the corn and the horn plus words to pass twenty"
    val docs = Seq(
      (10L, doc10, "en", "srcX", 1L),
      (11L, doc11, "en", "srcX", 1L), // dup_prefix beats everything but benchmark
      (12L, doc12, "en", "srcX", 1L),
      (13L, doc12 + " extra", "en", "srcX", 1L), // 13 % 13 == 0 -> sentinel -> contaminated...
      (97L, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "srcX", 1L)) // benchmark
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TrainPrepQ.qCuratePipeline(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val n10 = doc10.trim.split("\\s+").length.toLong
    val n12 = doc12.trim.split("\\s+").length.toLong
    assert(rows(10L) == (("kept", 1L, 0L, 0L)))
    assert(rows(11L)._1 == "dup_prefix" && rows(11L)._4 == -1L)
    // doc 12 packs DENSELY after doc 10 — the rejected doc 11 takes no space
    assert(rows(12L) == (("kept", 1L, 0L, n10)))
    // ...but doc 13 shares doc 12's 8-token prefix: dup_prefix OUTRANKS
    // contaminated, pinning the priority order
    assert(rows(13L)._1 == "dup_prefix")
    assert(rows(97L) == (("benchmark", 0L, -1L, -1L)))
    assert(!rows.contains(14L))
    // pack continues monotonically within the source for kept docs only
    assert(rows.values.filter(_._1 == "kept").map(_._4).toSeq.sorted == Seq(0L, n10))
    assert(n10 + n12 < TrainPrepQ.SeqLen) // both in sequence 0 by construction
  }

  test("linear quality: scores equal the independent md5-bucket recomputation") {
    val hex = "0123456789abcdef"
    def weight(tok: String): Long = {
      val h = MessageDigest.getInstance("MD5")
        .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xFF}%02x").mkString
      val bucket = hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))
      (bucket % 21).toLong - 10L
    }
    val expected = Map(
      0L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9", 1L -> "w1 w2 w3 w4 w5 w6 w7 w8 xx yy",
      2L -> "p q r", 5L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9",
      13L -> "aa bb cc", 97L -> "z1 z2 z3 z4 z5 z6 z7 z8"
    ).map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      id -> ((toks.size.toLong, toks.map(weight).sum))
    }
    val rows = TrainPrepQ.qLinearQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    expected.foreach { case (id, (n, score)) =>
      assert(rows(id)._1 == n, s"doc $id n_tokens")
      assert(rows(id)._2 == score, s"doc $id score")
      assert(rows(id)._3 == (if (score >= 0) 1L else 0L), s"doc $id keep")
    }
    // the handcrafted corpus must exercise both keep outcomes
    assert(rows.values.map(_._3).toSet == Set(0L, 1L))
  }

  test("bloom probe: one-sided error, planted mirrors all caught") {
    val dir = "/root/testdata/sf0.001"
    val rows = TrainPrepQ.qBloomProbe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // benchmark docs excluded from the probe side
    assert(rows.forall(_._1 % 97 != 0))
    // a Bloom filter NEVER misses a true member (one-sided error)
    rows.filter(_._4).foreach { case (id, n, hit, _) =>
      assert(hit && n == 4L, s"false negative on doc $id")
    }
    // hit <=> all four bits set
    rows.foreach { case (_, n, hit, _) => assert(hit == (n == 4L)) }
    // every non-benchmark mirror (doc_id % 71 == 0) is a TRUE hit:
    // doc 0 is a benchmark mirror, so the mirrored fp is in the set
    val mirrors = rows.filter(_._1 % 71 == 0)
    assert(mirrors.nonEmpty && mirrors.forall(_._4))
    // and nothing else is a true hit (no natural exact dups across the
    // benchmark boundary in this corpus)
    assert(rows.filter(_._4).forall(_._1 % 71 == 0))
  }

  test("q_dsir_select == in-memory brute force (hashed-bucket importance gate) at sf0.001") {
    val realDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$realDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(w: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % TrainPrepQ.DsirBuckets
    }
    val perDoc: Map[Long, (String, Map[Long, Long])] = docs.map { case (id, src, text) =>
      val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (src, words.groupBy(bucket).view.mapValues(_.length.toLong).toMap)
    }.toMap
    def accum(sel: ((String, Map[Long, Long])) => Boolean): Map[Long, Long] =
      perDoc.values.filter(sel).flatMap(_._2).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
    val tDist = accum(_._1 == "src0")
    val sDist = accum(_ => true)
    val (tTot, sTot) = (tDist.values.sum, sDist.values.sum)
    assert(tTot > 0 && sTot > tTot)

    val rows = TrainPrepQ.qDsirSelect(spark, realDir).collect()
    // docs with at least one token all appear; empty docs are absent in both
    assert(rows.length == perDoc.count(_._2._2.nonEmpty))
    rows.foreach { r =>
      val (id, n, st, ss, sel) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      val c = perDoc(id)._2
      assert(n == c.values.sum, s"n_tokens of $id")
      assert(st == c.map { case (b, k) => k * tDist.getOrElse(b, 0L) }.sum, s"score_target of $id")
      assert(ss == c.map { case (b, k) => k * sDist(b) }.sum, s"score_raw of $id")
      val want = if (BigInt(st) * BigInt(sTot) >= BigInt(ss) * BigInt(tTot)) 1 else 0
      assert(sel == want, s"selected gate of $id")
    }
    // the gate discriminates: both verdicts occur
    assert(rows.exists(_.getInt(4) == 1) && rows.exists(_.getInt(4) == 0))
  }

  test("contam coverage: interval union of benchmark 8-gram hits, exact bp") {
    val rows = TrainPrepQ.qContamCoverage(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(!rows.contains(0L) && !rows.contains(97L)) // benchmark docs excluded
    // doc 1: 10 tokens; only [w1..w8] (i=1) is a benchmark gram ->
    // covered tokens [1,9) = 8, bp = 8*10000 div 10
    assert(rows(1L) == ((10L, 1L, 8L, 8000L)))
    // doc 2: 3 tokens, no gram fits
    assert(rows(2L) == ((3L, 0L, 0L, 0L)))
    // doc 5: clean
    assert(rows(5L) == ((9L, 0L, 0L, 0L)))
    // doc 13: 3 own + 8 sentinel tokens; only the pure-sentinel gram
    // (i=4) matches the benchmark tails -> 8 covered of 11
    assert(rows(13L) == ((11L, 1L, 8L, 8L * 10000 / 11)))
  }

  test("shard manifest == in-memory brute force (hash shards, mergeable checksum)") {
    import graft.layout.MediaOcr.hash64
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy { case (id, _, _) =>
      Math.floorMod(hash64(s"shard:$id"), TrainPrepQ.ManifestShards.toLong).toInt
    }.map { case (shard, ds) =>
      shard -> ((ds.length.toLong, ds.map(_._3).sum,
        ds.map(d => d._2.trim.split("\\s+").length.toLong).sum,
        ds.map(_._1).min, ds.map(_._1).max,
        ds.map(d => Math.floorMod(hash64(s"shard:${d._1}"), 4294967296L)).sum))
    }
    val got = TrainPrepQ.qShardManifest(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want)
    // accounting law: shard doc counts partition the corpus
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("pack efficiency == in-memory greedy fold; greedy never beats concat") {
    val L = TrainPrepQ.SeqLen
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val pieces = ds.sortBy(_._1).flatMap { case (_, _, text) =>
        val n = text.trim.split("\\s+").length
        val full = (n - 1) / L // pieces of exactly L, then the remainder
        Seq.fill(full)(L.toLong) :+ (n - full * L).toLong
      }
      var (fill, waste) = (0L, 0L)
      pieces.foreach { n =>
        if (fill + n <= L) fill += n
        else { waste += L - fill; fill = n }
      }
      val tokens = pieces.sum
      val gWaste = waste + L - fill
      val gBins = (tokens + gWaste) / L
      val cBins = (tokens + L - 1) / L
      src -> ((tokens, gBins, gWaste, tokens * 10000 / (gBins * L),
        cBins, cBins * L - tokens, tokens * 10000 / (cBins * L)))
    }
    val got = TrainPrepQ.qPackEfficiency(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == want)
    // law: doc-boundary packing can only add padding vs concat-and-split
    got.values.foreach { case (_, gBins, gWaste, _, cBins, cWaste, _) =>
      assert(gBins >= cBins && gWaste >= cWaste)
    }
  }

  test("quality calibration == brute-force buckets x contamination cross-tab") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def wt(term: String): Long = {
      val h = md5hex(term)
      val nib = "0123456789abcdef"
      ((nib.indexOf(h(0)) * 16 + nib.indexOf(h(1))) % 21 - 10).toLong
    }
    val sentinel = "the quick brown fox jumps over the lazy"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def injected(id: Long, t: String): String =
      if (id % 97 == 0 || id % 13 == 0) t + " " + sentinel else t
    def grams(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 8) Seq.empty
      else (0 to toks.length - 8).map(i => md5hex(toks.slice(i, i + 8).mkString(" ")))
    }
    val bench = docs.filter(_._1 % 97 == 0)
      .flatMap { case (id, t) => grams(injected(id, t)) }.toSet
    val perDoc = docs.filter(_._1 % 97 != 0).map { case (id, t) =>
      val toks = t.trim.split("\\s+")
      val (n, score) = (toks.length.toLong, toks.map(wt).sum)
      val contam = grams(injected(id, t)).exists(bench.contains)
      val bucket = (((score + 10 * n) * 10000) / n) / 20000
      (bucket, n, if (contam) 1L else 0L)
    }
    val want = perDoc.groupBy(_._1).map { case (b, ds) =>
      val (nd, nc, ts) = (ds.length.toLong, ds.map(_._3).sum, ds.map(_._2).sum)
      b -> ((nd, nc, nc * 10000 / nd, ts / nd))
    }
    val got = TrainPrepQ.qQualityCalibration(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(want.values.exists(_._2 > 0)) // contamination occurs in some bucket
  }

  test("manifest diff: old side == q_shard_manifest; adds accounted; untouched shards keep checksums") {
    val diff = TrainPrepQ.qManifestDiff(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val manifest = TrainPrepQ.qShardManifest(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the diff's old side IS the current manifest (rows the full-outer
    // join adds for snapshot-only shards carry old count 0)
    assert(manifest.forall { case (sh, n) => diff(sh)._1 == n })
    assert(diff.filterNot { case (sh, _) => manifest.contains(sh) }
      .values.forall(_._1 == 0L))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // every % 41 re-ingest lands in exactly one shard's docs_added
    assert(diff.values.map(_._3).sum == docs.count(_ % 41 == 0).toLong)
    diff.values.foreach { case (old_, nw, added, changed) =>
      assert(nw - old_ == added)
      // a shard no snapshot doc landed in must keep its checksum
      if (added == 0L) assert(changed == 0)
    }
    // non-vacuous both ways: some shards changed, some did not
    assert(diff.values.exists(_._4 == 1) && diff.values.exists(_._4 == 0))
  }
}
