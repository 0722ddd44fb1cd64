package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExprs
import graft.layout.MediaOcr

/** Pins the native SplitMix64 expression (graft.functions.HashExprs)
  * to the engine's shared scalar kernel MediaOcr.hash64, value-for-value
  * — in BOTH evaluation modes (whole-stage codegen with silent fallback
  * disabled, and forced-interpreted), on ASCII, multi-byte and non-BMP
  * inputs, plus the unsigned-hex ordering law q_epoch_shuffle keys on.
  */
class HashExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.registerOn(s)
    s
  }

  private def withModes(check: => Unit): Unit = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try check
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  /** ASCII shard-key shapes, multi-byte Latin/CJK, non-BMP (surrogate
    * pairs — 4-byte UTF-8), the empty string, and long mixed strings. */
  private val fixtures: Seq[String] = Seq(
    "", "a", "shuffle:0:42", "shuffle:1:42", "corpus:123",
    "span:9:0", "the quick brown fox", "0" * 300,
    "café", "straße", "日本語",
    "emoji 😀 tail", "😀",
    "mixed café 日 🎉 end"
  ) ++ (0 until 200).map(i => s"doc_$i:${i * 2654435761L}")

  test("expression == MediaOcr.hash64 on ASCII/multibyte/non-BMP, both modes") {
    import spark.implicits._
    val df = fixtures.toDF("s").cache()
    val expected = fixtures.map(s => s -> MediaOcr.hash64(s)).toMap
    withModes {
      val got = df.select(col("s"), HashExprs.hash64s(col("s")).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size == expected.size)
      expected.foreach { case (s, h) =>
        assert(got(s) == h, s"mismatch on ${s.take(30)}")
      }
    }
  }

  test("null string hashes to null, both modes") {
    val df = spark.sql("SELECT CAST(NULL AS STRING) AS s UNION ALL SELECT 'x' AS s")
    withModes {
      val rows = df.select(HashExprs.hash64s(col("s")).as("h"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      assert(rows.count(_.isEmpty) == 1)
      assert(rows.flatten.toSeq == Seq(MediaOcr.hash64("x")))
    }
  }

  test("graft_hash64 is SQL-callable and matches the DataFrame path") {
    import spark.implicits._
    fixtures.toDF("s").createOrReplaceTempView("hash_fixtures")
    val viaSql = spark.sql("SELECT s, graft_hash64(s) AS h FROM hash_fixtures")
    val viaCol = spark.table("hash_fixtures")
      .select(col("s"), HashExprs.hash64s(col("s")).as("h"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("%016x of the signed long orders as the unsigned value (epoch-shuffle key law)") {
    // q_epoch_shuffle sorts on the hex key; this is only a faithful
    // "unsigned 64-bit order" if lexicographic-on-hex == compareUnsigned.
    val rnd = new scala.util.Random(77)
    val vals = Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue,
      Long.MinValue + 1, Long.MaxValue - 1) ++ Seq.fill(500)(rnd.nextLong())
    val byHex = vals.sortBy(v => f"$v%016x")
    val byUnsigned = vals.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
    assert(byHex == byUnsigned)
  }
}
