package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs
import graft.queries.{DedupQ, SimilarityQ}

/** q_semdedup pinned against a full in-memory brute force at sf0.001:
  * nearest-centroid assignment, the (csim asc, vec_id asc) keep order
  * and the drop rule (some earlier-ordered same-cluster member within
  * cosine >= tau) are re-derived with driver-side loops over quantized
  * ints, so the distributed plan must agree verdict-for-verdict. Plus
  * the q_dedup_soft mass law: every exact-dup cluster contributes
  * n * floor(10000/n) total basis points (one document's worth, minus
  * only the floor loss), and singletons weigh exactly 10000.
  * Cross-engine values are oracle-checked at sf0.01/sf0.1 by the
  * driver. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference for the CAPPED SemDeDup verdict rule: within
    * each cluster, pair-eligible (nonzero-norm) members are ranked by
    * (csim asc, vec_id asc); v is dropped iff an earlier member with
    * rank <= MaxSemEarlier is within cosine >= tau. Zero-norm members
    * never pair and are always kept. */
  private def bruteKept(members: Seq[(Long, Long, Double)],
                        sim: (Long, Long) => Double,
                        nonzero: Long => Boolean): Map[Long, Int] = {
    val ranks: Map[Long, Int] = members.filter(m => nonzero(m._1))
      .groupBy(_._2).flatMap { case (_, ms) =>
        ms.sortBy(m => (m._3, m._1)).zipWithIndex.map { case (m, i) => m._1 -> (i + 1) }
      }
    members.map { case (v, cid, _) =>
      val dropped = nonzero(v) && members.exists { case (a, acid, _) =>
        a != v && acid == cid && nonzero(a) &&
          ranks(a) <= SimilarityQ.MaxSemEarlier && ranks(a) < ranks(v) &&
          sim(a, v) >= SimilarityQ.SemDedupTau
      }
      v -> (if (dropped) 0 else 1)
    }.toMap
  }

  test("q_semdedup == brute force (assignment, keep order, drop rule) at sf0.001") {
    val vecs: Map[Long, Array[Long]] =
      SimilarityQ.embeddings(spark, dir).collect()
        .flatMap { r =>
          if (r.isNullAt(1)) None
          else {
            val arr = r.getSeq[Float](1).toArray
            if (arr.isEmpty) None
            else Some(r.getLong(0) -> arr.map(VectorExprs.quantize))
          }
        }.toMap

    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def sim(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      dot(va, vb).toDouble / (math.sqrt(dot(va, va).toDouble) * math.sqrt(dot(vb, vb).toDouble))
    }

    val cents = vecs.keys.filter(_ < 16).toSeq.sorted
    assert(cents.size >= 8)
    // nearest centroid (sim desc, cid asc) + the centroid similarity
    val assign: Map[Long, (Long, Double)] = vecs.keys.map { v =>
      val (cid, cs) = cents.map(c => (c, sim(v, c))).minBy { case (c, s) => (-s, c) }
      v -> (cid, cs)
    }.toMap
    // drop v iff one of the first MaxSemEarlier members in the cluster's
    // (csim asc, vec_id asc) order is earlier than v and within cosine
    // >= tau — the paper's sorted-scan rule with the capped earlier side
    val expected: Map[Long, Int] = bruteKept(
      vecs.keys.toSeq.map(v => (v, assign(v)._1, assign(v)._2)),
      (a, b) => sim(a, b), _ => true)

    val rows = SimilarityQ.qSemDedup(spark, dir).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) == assign(v)._1, s"cluster of $v")
      assert(math.abs(r.getDouble(2) - assign(v)._2) < 1e-12, s"csim of $v")
      assert(r.getInt(3) == expected(v), s"kept verdict of $v")
    }
    // non-vacuous both ways: something dropped, something kept
    assert(rows.exists(_.getInt(3) == 0) && rows.exists(_.getInt(3) == 1))
  }

  test("degenerate mega-cluster: cap bounds the earlier side (round-4 verdict #3)") {
    import spark.implicits._
    val R = SimilarityQ.MaxSemEarlier
    // One 126-member cluster (> R, the unguarded-quadratic shape) plus a
    // planted pair at ranks R+1/R+2 that only the UNCAPPED rule would
    // separate: members 1..R live in span{e1,e2}, the planted pair is
    // e3 (orthogonal to all of them, identical to each other). Capped
    // semantics: rank R+2 survives because its only >=tau neighbor has
    // rank R+1 > R; uncapped would drop it — the two rules must differ
    // on this input or the test is vacuous.
    val rows: Seq[(Long, Long, Double, Array[Float])] = (1 to (R + 62)).map { r =>
      val v: Array[Float] =
        if (r == R + 1 || r == R + 2) Array(0f, 0f, 1f, 0f)
        else Array(((r % 8) + 1).toFloat, ((r / 8) % 8 + 1).toFloat, 0f, 0f)
      (r.toLong, 0L, r.toDouble, v)
    }
    val assigned = rows.toDF("vec_id", "centroid", "csim", "v")
      .withColumn("nrm", graft.functions.VectorExprs.qdot(
        org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("v")))
    val got = SimilarityQ.semDedupKept(assigned).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap

    val qvecs: Map[Long, Array[Long]] =
      rows.map { case (id, _, _, v) => id -> v.map(graft.functions.VectorExprs.quantize) }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long = a.indices.map(i => a(i) * b(i)).sum
    def sim(a: Long, b: Long): Double = {
      val (va, vb) = (qvecs(a), qvecs(b))
      dot(va, vb).toDouble / (math.sqrt(dot(va, va).toDouble) * math.sqrt(dot(vb, vb).toDouble))
    }
    val expected = bruteKept(rows.map(r => (r._1, r._2, r._3)), sim, _ => true)
    assert(got.size == rows.size)
    got.foreach { case (v, k) => assert(k == expected(v), s"kept verdict of $v") }
    // the cap must MATTER here: rank R+2 is kept under the capped rule
    // but would be dropped by its rank-(R+1) twin under the uncapped one
    assert(got(R + 2L) == 1)
    assert(sim(R + 1L, R + 2L) >= SimilarityQ.SemDedupTau)
    // and the report law: pairs_capped < pairs_full for an m > R+1 cluster
    val m = rows.size.toLong
    val full = m * (m - 1) / 2
    val capped = R.toLong * (R + 1) / 2 + (m - 1 - R) * R
    assert(capped < full)
  }

  test("zero-norm vectors never pair (NaN-cosine cross-engine guard) and are kept") {
    import spark.implicits._
    // twin identical vectors (the later one must be dropped) + one
    // all-zero vector ordered FIRST: if the zero vector entered the pair
    // relation its NaN cosine would (a) never drop anyone in Spark but
    // (b) drop them in DuckDB's NaN-sorts-greatest order — the advice
    // divergence. It must be excluded from ranking entirely and kept.
    val rows: Seq[(Long, Long, Double, Array[Float])] = Seq(
      (1L, 0L, 0.1, Array(0f, 0f, 0f, 0f)),
      (2L, 0L, 0.2, Array(1f, 2f, 0f, 0f)),
      (3L, 0L, 0.3, Array(1f, 2f, 0f, 0f)))
    val assigned = rows.toDF("vec_id", "centroid", "csim", "v")
      .withColumn("nrm", graft.functions.VectorExprs.qdot(
        org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("v")))
    val got = SimilarityQ.semDedupKept(assigned).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 0))
  }

  test("q_dedup_soft: cluster mass law and singleton weights at sf0.001") {
    val rows = DedupQ.qDedupSoft(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, w) =>
      assert(w == 10000L / n, "weight_bp must be floor(10000 / n_copies)")
    }
    rows.filter(_._3 == 1).foreach { case (doc, rep, _, w) =>
      assert(w == 10000L && rep == doc, "singletons weigh 10000 and rep themselves")
    }
    // per-cluster total mass: n * floor(10000/n) — within floor loss of one doc
    rows.groupBy(_._2).foreach { case (_, members) =>
      val total = members.map(_._4).sum
      assert(total <= 10000L && total > 10000L - members.length)
    }
    // n_copies agrees with q_dedup_exact's cluster sizes
    val exact = DedupQ.qDedupExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap // rep doc_id -> n_copies
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(exact(rep) == members.length.toLong)
      assert(members.forall(_._3 == members.length.toLong))
    }
  }
}
