package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{HyperplaneBucket, QuantizedDot, SplitMix64}

import graft.queries.SimilarityQ

/** Registers graft's native Catalyst expressions as SQL functions via the
  * public extension API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT qdot(a.embedding, b.embedding) FROM ...
  *   SELECT hyperplane_bucket(embedding) FROM embeddings
  * }}}
  *
  * The DataFrame API path (graft.functions.VectorExprs) does not require
  * the extension — it builds the expressions directly; this makes the
  * same kernels available to pure-SQL users and to `spark.sql(...)`
  * pipelines. Registered at session build time (the only public hook for
  * native-function registration); GraftExtensionsSpec drives it through
  * a real session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.defs.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
}

object GraftExtensions {

  /** (sql name, implementing class, builder) for each native function —
    * shared by the extension hook above and by [[registerOn]]. */
  val defs: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("qdot", classOf[QuantizedDot].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "qdot(arrayA, arrayB) takes exactly 2 arguments")
        QuantizedDot(children(0), children(1))
      }),
    ("hyperplane_bucket", classOf[HyperplaneBucket].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "hyperplane_bucket(array) takes exactly 1 argument")
        HyperplaneBucket(children(0), SimilarityQ.hyperplaneSigns)
      }),
    ("graft_hash64", classOf[SplitMix64].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_hash64(string) takes exactly 1 argument")
        SplitMix64(children(0))
      }))

  /** Registers the same functions on an ALREADY-RUNNING session —
    * `spark.sql.extensions` is a static conf read at SparkContext build
    * time, so a library handed an existing session (notebooks, the
    * driver harness) uses this instead. Session-scoped, idempotent. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    defs.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, name, builder)
    }
}
