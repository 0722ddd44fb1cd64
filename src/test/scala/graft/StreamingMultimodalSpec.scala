package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.pipeline.PagesPipeline
import graft.streaming.StreamingOps

class StreamingMultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed counts == batch windowed counts") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.runWindowedOverDir(spark, sfDir, "smoke_windows")
      .select("w_start", "event_type", "n", "total")
      .collect().map(_.toString).sorted.toSeq
    val batch = StreamingOps.windowedCounts(spark.read.parquet(s"$sfDir/events.parquet"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SLIDING window == batch q_hop_window on shared columns") {
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    // streaming casts ts to TIMESTAMP (LTZ) for the watermark; batch
    // stays NTZ — same instants under the UTC session, so compare epochs
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("w_start").cast("timestamp").cast("long"),
        col("n_events"), col("sum_cents"))
      .collect().map(_.toString).sorted.toSeq
    val streamed = canon(StreamingOps.runSlidingOverDir(spark, sfDir, "smoke_sliding"))
    val batch = canon(graft.queries.Relational.qHopWindow(spark, sfDir))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization (flatMapGroupsWithState) matches batch gap logic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val eventsDf = spark.read.parquet(s"$sfDir/events.parquet")
    val events = eventsDf.as[StreamingOps.Event]
    // batch oracle: same 30-min-gap rule via window functions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val expectedTotalSessions = eventsDf
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new", when(
        unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1).otherwise(0))
      .groupBy(col("user_id")).agg((sum(col("is_new")) + 1).as("n_sessions"))
      .agg(sum("n_sessions")).collect()(0).getLong(0)

    // drive the REAL flatMapGroupsWithState query on a memory stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.sessionize(source.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    source.addData(events.collect().toSeq: _*)
    q.processAllAvailable()
    // push the watermark far forward with a sentinel user so every real
    // session times out and is emitted
    val maxTs = events.collect().map(_.ts.getTime).max
    source.addData(StreamingOps.Event(-1L,
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), -1L, "sentinel", 0.0, "{}"))
    q.processAllAvailable()
    // one more batch so the advanced watermark fires the timeouts
    source.addData(StreamingOps.Event(-2L,
      new java.sql.Timestamp(maxTs + 25L * 3600 * 1000), -1L, "sentinel2", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("sessions_out")
      .filter(org.apache.spark.sql.functions.col("user_id") >= 0)
    assert(emitted.count() == expectedTotalSessions)
  }

  test("streaming dedup: first-seen kept per fingerprint, late dups dropped, state watermark-bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
    val t0 = 1700000000000L
    def ts(minutes: Long) = new java.sql.Timestamp(t0 + minutes * 60000)
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.dedupStream(source.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    // batch 1: two distinct docs + an immediate dup (whitespace-normalized)
    source.addData((1L, ts(0), "alpha beta gamma"), (2L, ts(1), "delta epsilon"),
      (3L, ts(2), "alpha  beta\tgamma"))
    q.processAllAvailable()
    // batch 2: a dup INSIDE the watermark horizon -> dropped
    source.addData((4L, ts(30), "delta epsilon"))
    q.processAllAvailable()
    // batch 3: advance the watermark far past every stored fingerprint's
    // horizon (1h delay) so their state is EVICTED...
    source.addData((5L, ts(600), "watermark pusher"))
    q.processAllAvailable()
    // ...then batch 4: the same content again, after eviction -> kept
    // again (bounded state means the horizon, not forever, is the
    // dedup contract; re-emission proves eviction actually happened)
    source.addData((6L, ts(610), "delta epsilon"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 5L, 6L)) // 3 and 4 deduped; 6 re-kept after eviction
    // and the batch analog agrees on what is distinct within the horizon
    val batchDistinct = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha  beta\tgamma"), (4L, "delta epsilon"))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("text"), "\\s+", " ")).cast("binary")))
      .distinct().count()
    assert(batchDistinct == out.count(_ <= 4L))
  }

  test("streaming minhash near-dup == batch candidate pairs on the real documents table") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.OutputMode
    // stage sf0.01 documents as 4 parquet files -> 4 micro-batches, so
    // pairs must form ACROSS batches through the bucket state
    val dir = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_docs").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val q = StreamingOps.neardupStream(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    // streaming emits one pair per shared band; batch distincts — and
    // batch doc order inside a pair is (smaller, larger), same as ours
    val streamed = spark.table("neardup_stream")
      .select(col("doc_a"), col("doc_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.queries.DedupQ.qMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streaming-only: ${(streamed -- batch).take(5)}; batch-only: ${(batch -- streamed).take(5)}")
    assert(batch.nonEmpty)
  }

  test("streaming extraction (append, stateless) == batch Extract.run") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    // stage the corpus as an append-only parquet dir, stream it in
    // 1-file micro-batches, extract, append to a memory sink
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_corpus").toString
    val corpus = graft.fixtures.CorpusGen.fromDocuments(spark, "/root/testdata/sf0.001")
    corpus.repartition(4).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingOps.extractStream(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("stream_extract")
      .start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("doc_id"), to_json(col("span_seq")).as("j"))
        .collect().map(r => r.getString(0) + "|" + r.getString(1)).sorted.toSeq
    val streamed = canon(spark.table("stream_extract"))
    val batch = canon(graft.pipeline.Extract.run(corpus))
    assert(streamed.size == 500)
    assert(streamed == batch)
  }

  test("multimodal: binary payloads featurize deterministically with real batch shape") {
    val feats = Multimodal.featurize(Multimodal.genTable(spark, 50)).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(Math.abs(f.features.sum - 1.0f) < 1e-3)
      assert(f.mean_luma >= 0f && f.mean_luma <= 1f)
      if (f.kind == "video") assert(f.n_frames >= 1)
      // BMP images, PCM WAVs and Y4M videos (media_id % 9 in {2, 5})
      // take the REAL decode path; only the opaque codec stand-in
      // (media_id % 9 == 8) takes the documented stub
      val expectDecoded = if (f.kind == "video" && f.media_id % 9 == 8) 0 else 1
      assert(f.decoded == expectDecoded, s"${f.kind} ${f.media_id}")
      if (f.kind == "video" && f.media_id % 9 != 8)
        assert(f.n_frames == 2 + (f.media_id % 4).toInt, s"y4m frames ${f.media_id}")
    }
    // determinism across runs
    val again = Multimodal.featurize(Multimodal.genTable(spark, 50)).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("real decoders: handcrafted BMP pixels and WAV samples give exact stats") {
    // 2x1 BMP: pixel0 = pure white, pixel1 = pure black (bottom-up rows,
    // BGR, row padded to 4 bytes -> rowBytes=8)
    val bmp = java.nio.ByteBuffer.allocate(54 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(54)
    bmp.putInt(40).putInt(2).putInt(1).putShort(1).putShort(24)
      .putInt(0).putInt(8).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bmp.put(Array[Byte](-1, -1, -1, 0, 0, 0, 0, 0)) // white, black, pad
    val Some((w, h, luma, hist)) = Multimodal.decodeBmp(bmp.array())
    assert((w, h) == (2, 1))
    assert(math.abs(luma - 0.5f) < 1e-4) // (255 + 0)/2/255
    assert(hist(15) == 0.5f && hist(0) == 0.5f)

    // WAV: two samples, 0 and 16384 (=0.5 amplitude) -> RMS = sqrt(0.125)
    val wav = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    wav.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    wav.put("data".getBytes).putInt(4).putShort(0).putShort(16384)
    val Some((sr, n, rms, _)) = Multimodal.decodeWav(wav.array())
    assert(sr == 8000 && n == 2)
    assert(math.abs(rms - math.sqrt(0.125).toFloat) < 1e-5)

    // corrupt payloads fall through to None (the stub path), not a crash
    assert(Multimodal.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    assert(Multimodal.decodeBmp("BM tiny".getBytes).isEmpty)
  }

  test("page-parallel pipeline (G-21): distributed == sequential, page order from data") {
    import spark.implicits._
    val pages = for {
      d <- 0 until 12
      p <- 0 until (1 + d % 4)
    } yield (s"doc_$d", p, f"img://page/$d%d/$p%d")
    // shuffle input row order to prove ordering comes from page_idx
    val shuffled = scala.util.Random.shuffle(pages.toVector)
    val df = shuffled.toDF("doc_id", "page_idx", "media_ref")
    val got = PagesPipeline.run(df)
      .as[(String, Int, String, String)].collect().map(r => r._1 -> r).toMap
    pages.groupBy(_._1).foreach { case (docId, ps) =>
      val (n, full, text) = PagesPipeline.runSequential(ps.map(p => (p._2, p._3)))
      val g = got(docId)
      assert(g._2 == n, s"$docId n_pages")
      assert(g._3 == full, s"$docId full_text")
      assert(g._4 == text, s"$docId doc_text")
    }
  }
}
