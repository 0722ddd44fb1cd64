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
    // drop v iff an earlier member (csim asc, vec_id asc) of the SAME
    // cluster is within cosine >= tau — the paper's sorted-scan rule
    val expected: Map[Long, Int] = vecs.keys.map { v =>
      val (cid, cs) = assign(v)
      val dropped = vecs.keys.exists { a =>
        a != v && assign(a)._1 == cid && {
          val as = assign(a)._2
          (as < cs || (as == cs && a < v)) && sim(a, v) >= SimilarityQ.SemDedupTau
        }
      }
      v -> (if (dropped) 0 else 1)
    }.toMap

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
