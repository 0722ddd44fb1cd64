package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQ

/** Link-graph semantic invariants (exact values pinned by the DuckDB
  * oracle; these pin the PROPERTIES that make the numbers meaningful). */
class GraphQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("pagerank: degree accounting, rank floor, sink baseline, mass bound") {
    val rows = GraphQ.qPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == n)
    // every edge has one src and one dst
    assert(rows.map(_._2).sum == rows.map(_._3).sum)
    // the damping term is a hard floor; a node with no inbound sits exactly on it
    assert(rows.forall(_._4 >= 150000L))
    // any inbound edge contributes >= floor(150000/3) > 0, so a node sits
    // exactly on the floor iff it has no inbound at all (at this sf the
    // LCG stride is coprime with N, so usually every node has inbound)
    rows.foreach { case (_, _, ind, rank) => assert((rank == 150000L) == (ind == 0L)) }
    // some node must accumulate real mass (non-degenerate graph)
    assert(rows.exists(_._4 > 1000000L))
    // total mass never exceeds the initial injection (leak-only dynamics:
    // per-round total <= 0.15*N*1e6 + 0.85*(previous total))
    assert(rows.map(_._4).sum <= n * 1000000L)
    // determinism across reruns
    assert(GraphQ.qPagerank(spark, dir).collect().map(_.getLong(3)).toSeq ==
      rows.map(_._4).toSeq)
  }

  test("anchor aggregation: count bounds and argmax consistency") {
    val rows = GraphQ.qAnchorAgg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, inlinks, distinct, top, topCount) =>
      assert(distinct >= 1L && distinct <= inlinks)
      assert(topCount >= 1L && topCount <= inlinks)
      // the winning anchor must cover at least an equal share
      assert(topCount * distinct >= inlinks)
      assert(top != null && top.nonEmpty)
    }
    // inlink totals agree with pagerank's in_degree column
    val indeg = GraphQ.qPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { case (t, inlinks, _, _, _) => assert(indeg(t) == inlinks) }
  }
}
