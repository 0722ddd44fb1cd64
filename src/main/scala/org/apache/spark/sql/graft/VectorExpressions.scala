package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType, LongType}

import graft.functions.VectorExprs

/** `qdot(a, b) = SUM_i round(a_i*1000) * round(b_i*1000)` as one fused
  * codegen loop over the raw `array<float>` columns.
  *
  * Replaces `aggregate(zip_with(transform(a), transform(b), *), 0L, +)`
  * with identical null semantics: NULL if either array is NULL, if the
  * lengths differ (zip_with pads with NULL, poisoning the sum), or if any
  * element is NULL; 0 for two empty arrays (the aggregate's seed).
  * A welcome side effect: plans carry the 4-byte-per-element raw float
  * arrays through joins instead of pre-quantized 8-byte longs — half the
  * shuffle width of the HOF formulation.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += VectorExprs.quantize(x.getFloat(i)) * VectorExprs.quantize(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val pa = ctx.freshName("pa")
      val pb = ctx.freshName("pb")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $pa = ((double) $a.getFloat($i)) * 1000.0;
         |    final double $pb = ((double) $b.getFloat($i)) * 1000.0;
         |    final long $qa = $pa >= 0 ? (long) Math.floor($pa + 0.5d) : -(long) Math.floor(-$pa + 0.5d);
         |    final long $qb = $pb >= 0 ? (long) Math.floor($pb + 0.5d) : -(long) Math.floor(-$pb + 0.5d);
         |    $acc += $qa * $qb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The 8-plane random-hyperplane signature `SUM_h (dot_h > 0 ? 1<<h : 0)`
  * where `dot_h = SUM_i signs(h)(i) * round(v_i*1000)` — one codegen loop
  * over the raw float vector instead of 8 interpreted
  * `aggregate(zip_with(lit_signs, v, *))` chains per row.
  *
  * Null semantics: a vector whose length differs from the sign rows (64)
  * or that contains a NULL element makes every per-plane HOF dot NULL, and
  * `when(null > 0, bit)` takes the otherwise(0) branch on every plane —
  * i.e. bucket 0; this expression mirrors that. The one divergence is a
  * NULL input array (HOF's `when` also swallows it to 0; here it stays
  * NULL, the conventional expression behavior) — every call site filters
  * `isNotNull && size > 0` first, pinned by VectorExprSpec.
  *
  * The sign table is a deterministic md5-derived constant (computed once
  * on the driver, unit-pinned against the oracle's md5 SQL rule in
  * SimilaritySignsSpec) and rides into generated code as a reference
  * object — no hashing at execution time.
  */
case class HyperplaneBucket(child: Expression, signs: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  private def dim: Int = signs(0).length

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim) return 0
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0; i += 1 }
    val q = new Array[Long](n)
    i = 0
    while (i < n) { q(i) = VectorExprs.quantize(v.getFloat(i)); i += 1 }
    var bucket = 0
    var h = 0
    while (h < signs.length) {
      val row = signs(h)
      var acc = 0L
      i = 0
      while (i < n) { acc += row(i) * q(i); i += 1 }
      if (acc > 0) bucket |= (1 << h)
      h += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val q = ctx.freshName("q")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val bucket = ctx.freshName("bucket")
      val ok = ctx.freshName("ok")
      s"""
         |final int $n = $v.numElements();
         |int $bucket = 0;
         |boolean $ok = ($n == ${dim});
         |for (int $i = 0; $ok && $i < $n; $i++) { if ($v.isNullAt($i)) $ok = false; }
         |if ($ok) {
         |  final long[] $q = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $p = ((double) $v.getFloat($i)) * 1000.0;
         |    $q[$i] = $p >= 0 ? (long) Math.floor($p + 0.5d) : -(long) Math.floor(-$p + 0.5d);
         |  }
         |  for (int $h = 0; $h < ${signs.length}; $h++) {
         |    final long[] $row = $signsRef[$h];
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) { $acc += $row[$i] * $q[$i]; }
         |    if ($acc > 0) $bucket |= (1 << $h);
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
