package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives both registration paths for the native SQL functions:
  * [[GraftExtensions.registerOn]] against a live session (the library
  * path), and the `spark.sql.extensions` static-conf hook on a freshly
  * built SparkContext (the spark-submit path — static confs are read
  * only at context build time, so that test deliberately stops and
  * rebuilds the shared test context; suites run sequentially in this
  * fork and later suites transparently rebuild via getOrCreate). */
class GraftExtensionsSpec extends AnyFunSuite {

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

  test("registerOn: qdot is SQL-callable and matches the round/cast formulation") {
    val r = spark.sql(
      """SELECT qdot(array(CAST(0.5 AS FLOAT), CAST(-0.0625 AS FLOAT)),
        |            array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d,
        |       aggregate(zip_with(
        |         transform(array(CAST(0.5 AS FLOAT), CAST(-0.0625 AS FLOAT)), x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |         transform(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |         (x, y) -> x * y), 0L, (a, x) -> a + x) AS ref""".stripMargin).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) == 500L * 1000L + (-63L) * 2000L) // tie -62.5 away from zero
  }

  test("registerOn: hyperplane_bucket matches the DataFrame-path expression") {
    import org.apache.spark.sql.functions._
    val e = graft.queries.SimilarityQ.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    e.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql("SELECT vec_id, hyperplane_bucket(embedding) AS b FROM emb_ext")
    val viaCol = e.select(col("vec_id"),
      graft.functions.VectorExprs.hyperplaneBucket(col("embedding"),
        graft.queries.SimilarityQ.hyperplaneSigns).as("b"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    assert(viaSql.select(countDistinct(col("b"))).head().getLong(0) > 1)
  }

  test("arity errors are rejected at analysis time") {
    val err = intercept[Exception](spark.sql("SELECT qdot(array(CAST(1.0 AS FLOAT)))").collect())
    assert(err.getMessage.contains("2 arguments") || err.getMessage.toLowerCase.contains("qdot"))
  }

  test("spark.sql.extensions hook registers on a freshly built context") {
    // static conf — only honored when the SparkContext itself is built
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    val d = fresh.sql(
      """SELECT qdot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d,
        |       hyperplane_bucket(array(CAST(1.0 AS FLOAT))) AS b""".stripMargin).head()
    assert(d.getLong(0) == 1000L * 2000L)
    assert(d.getInt(1) == 0) // wrong-length vector -> bucket 0
  }
}
