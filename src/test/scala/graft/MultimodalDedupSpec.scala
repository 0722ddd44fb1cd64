package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Perceptual-hash image near-dup: aHash semantics and the pigeonhole-
  * blocked join pinned against driver-side brute force. */
class MultimodalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ahash: stable under small perturbation, far for distinct images, None for non-BMP") {
    val img = Multimodal.genBmp(7L, 32, 24)
    val h = Multimodal.ahash64(img).get
    // 3 flipped pixel bytes barely move 8x8 cell means
    val hPert = Multimodal.ahash64(Multimodal.perturbBmp(img, 7L, 3)).get
    assert(java.lang.Long.bitCount(h ^ hPert) <= Multimodal.MaxHamming)
    // an unrelated image is far beyond the threshold
    val hOther = Multimodal.ahash64(Multimodal.genBmp(8L, 32, 24)).get
    assert(java.lang.Long.bitCount(h ^ hOther) > Multimodal.MaxHamming)
    assert(Multimodal.ahash64(Multimodal.genWav(1L, 16000, 64)).isEmpty)
    assert(Multimodal.ahash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("resizeBmp: real BMP out, target dims, mean luma preserved, distributed-safe") {
    val img = Multimodal.genBmp(21L, 32, 24)
    val (_, _, luma0, _) = Multimodal.decodeBmp(img).get
    val small = Multimodal.resizeBmp(img, 8, 8).get
    val (w, h, luma1, _) = Multimodal.decodeBmp(small).get
    assert(w == 8 && h == 8)
    // average pooling preserves the mean up to rounding + uneven blocks
    assert(math.abs(luma0 - luma1) < 0.02f, s"$luma0 vs $luma1")
    // resize of the resize still decodes (idempotent pipeline step)
    assert(Multimodal.decodeBmp(Multimodal.resizeBmp(small, 4, 4).get).get._1 == 4)
    assert(Multimodal.resizeBmp(Multimodal.genWav(1L, 16000, 64), 8, 8).isEmpty)
    // ahash of a downsampled image stays near the original's (the hash
    // IS an 8x8 pooling, so pre-resizing must not destroy it)
    val h0 = Multimodal.ahash64(img).get
    val h1 = Multimodal.ahash64(small).get
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 8)
  }

  test("audio fingerprint: amplitude-scale invariant, far for distinct audio, None otherwise") {
    val wav = Multimodal.genWav(5L, 16000, 900)
    val h = Multimodal.audioFingerprint(wav).get
    // volume rescale (9/10, integer truncation) must not move the hash
    // beyond the near-dup threshold — energy-delta signs are scale-free
    val hScaled = Multimodal.audioFingerprint(Multimodal.rescaleWav(wav, 9, 10)).get
    assert(java.lang.Long.bitCount(h ^ hScaled) <= Multimodal.MaxHamming)
    // a different recording is far away
    val hOther = Multimodal.audioFingerprint(Multimodal.genWav(6L, 16000, 900)).get
    assert(java.lang.Long.bitCount(h ^ hOther) > Multimodal.MaxHamming)
    assert(Multimodal.audioFingerprint(Multimodal.genBmp(1L, 16, 12)).isEmpty)
    assert(Multimodal.audioFingerprint(Multimodal.genWav(7L, 16000, 32)).isEmpty) // < 64 samples
  }

  test("audio blocked join == brute force (completeness over fingerprints)") {
    import spark.implicits._
    val base = Multimodal.genTable(spark, 90)
    val variants = base.filter(r => r.kind == "audio" && r.media_id % 15 == 1)
      .map(r => r.copy(media_id = r.media_id + 100000,
        payload = Multimodal.rescaleWav(r.payload, 9, 10)))
    val all = base.unionByName(variants)
    val got = Multimodal.audioNearDup(all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = all.collect().flatMap(r => Multimodal.audioFingerprint(r.payload).map(r.media_id -> _))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= Multimodal.MaxHamming
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(got.nonEmpty && got.forall { case (a, b, _) => b == a + 100000 })
  }

  test("blocked join == brute force over all hash pairs (completeness of pigeonhole)") {
    import spark.implicits._
    val base = Multimodal.genTable(spark, 90)
    // container-appropriate near-dups, like qImageNeardup: pixel
    // perturbation for BMPs, a JPEG re-encode for PNG/JPEG originals
    val variants = base.filter(r => r.kind == "image" && r.media_id % 10 == 0)
      .map { r =>
        val near =
          if (r.payload(0) == 'B' && r.payload(1) == 'M')
            Multimodal.perturbBmp(r.payload, r.media_id, 3)
          else Multimodal.encodeImage(Multimodal.decodeImage(r.payload).get, "jpg", 0.9f)
        r.copy(media_id = r.media_id + 100000, payload = near)
      }
    val all = base.unionByName(variants)
    val got = Multimodal.imageNearDup(all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force on the driver over the same hashes (ahashAny = the
    // distributed job's hash: BMP hand-rolled or ImageIO)
    val hashes = all.collect().flatMap(r => Multimodal.ahashAny(r.payload).map(r.media_id -> _))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= Multimodal.MaxHamming
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(got.nonEmpty && got.forall { case (a, b, _) => b == a + 100000 })
    // every planted pair type is recovered: the PNG and JPEG originals
    // (ids 30, 60) pair with their re-encodes, not just the BMP ones
    assert(got.exists(_._1 == 30L) && got.exists(_._1 == 60L))
  }

  test("y4m: generate -> decode round-trips structure; frame hashes stable under perturbation") {
    val v = Multimodal.genY4m(contentKey = 42L, w = 24, h = 16, nFrames = 4)
    // container size is the exact formula the q_media_profile oracle uses
    assert(v.length == 37 + 4 * (6 + 24 * 16 * 3 / 2))
    val Some((w, h, nf, luma, hist)) = Multimodal.decodeY4m(v)
    assert(w == 24 && h == 16 && nf == 4)
    assert(luma > 0f && luma < 1f)
    assert(Math.abs(hist.sum - 1.0f) < 1e-3)
    // frame sampling: stride 2 over 4 frames -> frames 0 and 2
    val Some(hashes) = Multimodal.y4mFrameHashes(v)
    assert(hashes.map(_._1) == Vector(0, 2))
    // a one-pixel-swap perturbation preserves the frame mean, so at
    // most the two touched cells can flip (Hamming <= 2, provable);
    // a different contentKey is far
    val Some(pert) = Multimodal.y4mFrameHashes(Multimodal.perturbY4m(v, 42L, 1))
    hashes.zip(pert).foreach { case ((f1, a), (f2, b)) =>
      assert(f1 == f2)
      assert(java.lang.Long.bitCount(a ^ b) <= 2, s"frame $f1")
    }
    val Some(other) = Multimodal.y4mFrameHashes(Multimodal.genY4m(43L, 24, 16, 4))
    assert(java.lang.Long.bitCount(hashes.head._2 ^ other.head._2) > Multimodal.MaxHamming)
    // structural honesty: truncated payload and bad magic decode to None
    assert(Multimodal.decodeY4m(v.take(v.length - 5)).isEmpty)
    assert(Multimodal.decodeY4m("JUNKHEADER\n".getBytes).isEmpty)
  }

  test("video blocked join == brute force over sampled frame hashes") {
    import spark.implicits._
    val media = (0 until 60).map { i =>
      val id = i.toLong * 3 + 2 // video ids
      // every 4th row is a perturbed copy of the NEXT row's content, so
      // the set contains real near pairs (id, id+3) plus distinct noise
      val payload =
        if (i % 4 == 0 && i + 1 < 60)
          Multimodal.perturbY4m(Multimodal.genY4m(3L * (i + 1) + 2, 20, 16, 3), id, 1)
        else Multimodal.genY4m(id, 20, 16, 3)
      Multimodal.MediaRow(id, "video", payload, 0, 0, 0)
    }
    val ds = spark.createDataset(media)
    val joined = Multimodal.videoNearDup(ds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: all pairs, all aligned sampled frames, Hamming <= MaxHamming
    val hs = media.flatMap(r =>
      Multimodal.y4mFrameHashes(r.payload).toSeq.flatten.map { case (f, h) => (r.media_id, f, h) })
    val brute = (for {
      (ia, fa, ha) <- hs
      (ib, fb, hb) <- hs
      if ia < ib && fa == fb && java.lang.Long.bitCount(ha ^ hb) <= Multimodal.MaxHamming
    } yield ((ia, ib), fa)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size.toLong }
    assert(joined == brute, s"blocked=${joined.size} brute=${brute.size}")
    assert(joined.nonEmpty)
  }

  test("imageio: png re-encode is pixel-lossless (stats + exact ahash bits)") {
    val bmp = Multimodal.genBmp(11L, 32, 24)
    val png = Multimodal.encodeImage(Multimodal.bmpToImage(bmp).get, "png")
    assert(Multimodal.imageIoType(png).contains("png"))
    val img = Multimodal.decodeImage(png).get
    val (w, h, luma, hist) = Multimodal.imageStats(img)
    val (w0, h0, luma0, hist0) = Multimodal.decodeBmp(bmp).get
    assert(w == w0 && h == h0)
    assert(math.abs(luma - luma0) < 1e-6f)
    assert(hist.zip(hist0).forall { case (a, b) => math.abs(a - b) < 1e-6f })
    // identical pixels => identical aHash bits across the two decode paths
    assert(Multimodal.ahashImage(img) == Multimodal.ahash64(bmp).get)
    // and ahashAny dispatches both containers
    assert(Multimodal.ahashAny(png).get == Multimodal.ahashAny(bmp).get)
  }

  test("imageio: jpeg re-encode stays within the near-dup threshold") {
    for (id <- Seq(0L, 3L, 12L, 30L, 60L, 84L)) {
      val bmp = Multimodal.genBmp(id, 16 + (id % 8).toInt * 4, 12 + (id % 5).toInt * 4)
      val jpg = Multimodal.encodeImage(Multimodal.bmpToImage(bmp).get, "jpg", 0.9f)
      assert(Multimodal.imageIoType(jpg).contains("jpeg"))
      val d = java.lang.Long.bitCount(
        Multimodal.ahash64(bmp).get ^ Multimodal.ahashAny(jpg).get)
      assert(d <= Multimodal.MaxHamming, s"id=$id hamming=$d")
    }
    // undecodable bytes fall through to None, not an exception
    assert(Multimodal.decodeImage(Array.fill[Byte](64)(0x55)).isEmpty)
    assert(Multimodal.ahashAny(Multimodal.genWav(1L, 16000, 64)).isEmpty)
  }
}
