package graft.functions

import org.apache.spark.sql.graft.{HyperplaneBucket, QuantizedDot}

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Native Catalyst expressions for the embedding-similarity hot paths.
  *
  * Spark's higher-order functions (`transform`, `zip_with`, `aggregate`)
  * are `CodegenFallback`: every per-element lambda step is interpreted and
  * allocates, and their presence breaks the surrounding whole-stage-codegen
  * span. The similarity queries run a quantize+dot per CANDIDATE PAIR
  * (brute-force top-k, LSH/IVF verify stages) — at 100 TB that interpreted
  * inner loop is the dominant cost. These expressions compile the exact
  * same arithmetic to a tight generated-Java loop and keep the projection
  * inside WholeStageCodegen.
  *
  * Semantics are pinned to the HOF formulation they replace (and to the
  * DuckDB oracle SQL, unchanged):
  * round-half-away-from-zero((double)x * 1000) per element — identical to
  * Spark `round(cast(x as double) * 1000)` (BigDecimal HALF_UP) and DuckDB
  * `ROUND(...)` for every float input: the product of a 24-bit float
  * mantissa and 1000 is exact in double, so all three see the same value,
  * and all three round ties away from zero. VectorExprSpec pins
  * expression == HOF equality element-for-element, including ties
  * (x = 1/16 -> 62.5 -> 63) and negatives.
  */
object VectorExprs {

  /** Quantized value of one float element; mirrors
    * `round(x.cast("double") * 1000).cast("long")`. */
  @inline def quantize(x: Float): Long = {
    val p = x.toDouble * 1000.0
    if (p >= 0) math.floor(p + 0.5d).toLong else -math.floor(-p + 0.5d).toLong
  }

  /** Exact int-quantized dot product of two float vectors (see [[QuantizedDot]]). */
  def qdot(a: Column, b: Column): Column =
    ColumnBridge.of(QuantizedDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** 8-bit random-hyperplane LSH signature of a float vector (see [[HyperplaneBucket]]). */
  def hyperplaneBucket(v: Column, signs: Array[Array[Long]]): Column =
    ColumnBridge.of(HyperplaneBucket(ColumnBridge.expr(v), signs))
}
