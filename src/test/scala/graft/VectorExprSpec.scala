package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs
import graft.queries.SimilarityQ

/** Pins the native codegen expressions (graft.functions.VectorExprs) to
  * the higher-order-function formulations they replaced, element-for-
  * element and row-for-row — in BOTH evaluation modes (whole-stage
  * codegen and forced-interpreted), on adversarial floats (ties at .5
  * like 1/16 -> 62.5, negatives, subnormals) and on real testdata.
  */
class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // === the original HOF formulations, kept verbatim as the reference ===
  private def decVec(c: Column): Column =
    transform(c, (x: Column) => round(x.cast("double") * 1000).cast("long"))
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(decVec(a), decVec(b), (x: Column, y: Column) => x * y),
      lit(0L), (acc: Column, x: Column) => acc + x)
  private def hofBucket(v: Column): Column =
    (0 until 8).map { h =>
      val dotH = aggregate(
        zip_with(typedLit(SimilarityQ.hyperplaneSigns(h).toSeq), decVec(v),
          (sgn: Column, x: Column) => sgn * x),
        lit(0L), (acc: Column, t: Column) => acc + t)
      when(dotH > 0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Adversarial vectors: exact .5 quantization ties (1/16*1000 = 62.5,
    * -3/16), exact zeros, +-1 range, tiny subnormal-ish values. */
  private def advVectors(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(4242)
    (0L until n.toLong).map { id =>
      val v = Array.fill(dim) {
        rnd.nextInt(6) match {
          case 0 => (rnd.nextInt(64) - 32) / 16.0f   // .5 tie candidates
          case 1 => 0.0f
          case 2 => rnd.nextFloat() * 2e-6f          // quantizes to 0
          case _ => rnd.nextFloat() * 2f - 1f
        }
      }
      (id, v)
    }
  }

  private def withModes(check: => Unit): Unit = {
    // whole-stage codegen, with silent interpreted fallback DISABLED so a
    // broken doGenCode throws instead of quietly passing via eval()
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

  test("quantize mirrors Spark round(cast*1000) incl. ties away from zero") {
    assert(VectorExprs.quantize(1.0f / 16) == 63L)    // 62.5 -> away from zero
    assert(VectorExprs.quantize(-1.0f / 16) == -63L)  // -62.5 -> away from zero
    assert(VectorExprs.quantize(0.0f) == 0L)
    assert(VectorExprs.quantize(-0.0f) == 0L)
    assert(VectorExprs.quantize(0.0624f) == 62L)
    assert(VectorExprs.quantize(-0.9999f) == -1000L)  // -999.9 -> -1000
  }

  test("qdot == HOF dot on 200 adversarial pairs, both eval modes") {
    import spark.implicits._
    val rows = advVectors(400, 64)
    val df = rows.grouped(2).map(p => (p(0)._1, p(0)._2, p(1)._2)).toSeq
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
      .cache()
    withModes {
      val diff = df.select(
          VectorExprs.qdot(col("a"), col("b")).as("native"),
          hofDot(col("a"), col("b")).as("hof"))
        .filter(col("native") =!= col("hof") || col("native").isNull =!= col("hof").isNull)
        .count()
      assert(diff == 0L)
    }
  }

  test("qdot null semantics: null array / mismatched lengths / null element / empty") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1, array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        | (2, CAST(NULL AS ARRAY<FLOAT>),                      array(CAST(1.0 AS FLOAT))),
        | (3, array(CAST(1.0 AS FLOAT)),                       array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        | (4, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        | (5, array(CAST(1.0 AS FLOAT)), array(CAST(NULL AS FLOAT))),
        | (6, array(), array())
        | AS t(id, a, b)""".stripMargin)
      .select(col("id"),
        col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
      .cache()
    withModes {
      val got: Map[Int, (Any, Any)] = df.select(col("id"), VectorExprs.qdot(col("a"), col("b")).as("q"),
          hofDot(col("a"), col("b")).as("h"))
        .collect().map { r =>
          r.getInt(0) -> ((if (r.isNullAt(1)) null else r.getLong(1),
                           if (r.isNullAt(2)) null else r.getLong(2)): (Any, Any))
        }.toMap
      // id -> (native, hof): 1 exact value, 2-5 null==null, 6 empty==0
      assert(got.forall { case (_, (n, h)) => n == h })
      assert(got(1)._1 == 500L * 1000L + (-250L) * 2000L)
      assert(got(6)._1 == 0L)
    }
  }

  test("hyperplaneBucket == HOF bucket on adversarial + testdata vectors, both modes") {
    import spark.implicits._
    val adv = advVectors(300, 64).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val real = SimilarityQ.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val both = adv.unionByName(real).cache()
    withModes {
      val diff = both.select(
          VectorExprs.hyperplaneBucket(col("embedding"), SimilarityQ.hyperplaneSigns).as("native"),
          hofBucket(col("embedding")).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0L)
    }
  }

  test("hyperplaneBucket degenerate inputs: wrong length and null element -> 0") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        | (2, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))),
        | (3, array())
        | AS t(id, v)""".stripMargin)
      .select(col("id"), col("v").cast("array<float>").as("v")).cache()
    withModes {
      val got = df.select(col("id"),
          VectorExprs.hyperplaneBucket(col("v"), SimilarityQ.hyperplaneSigns).as("b"),
          hofBucket(col("v")).as("h"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      got.foreach { case (id, b, h) =>
        assert(b == 0 && h == 0, s"id=$id native=$b hof=$h")
      }
    }
  }
}
