package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** splitmix64 over the UTF-8 bytes of a string column — the engine's
  * shared corpus hash (graft.layout.MediaOcr.hash64) as a NATIVE codegen
  * expression, so queries can key shuffles/shards on it without a Scala
  * UDF (which would box every row and break the surrounding
  * whole-stage-codegen span).
  *
  * Semantics are pinned to MediaOcr.hash64 byte-for-byte: Catalyst's
  * UTF8String stores exactly the UTF-8 encoding, so iterating its bytes
  * IS the `s.getBytes(UTF_8)` loop (MediaOcr's ASCII fast path hashes
  * chars, which for ASCII equal the UTF-8 bytes). The same recurrence is
  * DuckDB-expressible (queries/FlagshipQ.hash64Sql), which keeps every
  * consumer under the independent oracle. HashExprSpec pins expression ==
  * MediaOcr.hash64 on ASCII, multi-byte and non-BMP inputs in both
  * evaluation modes.
  */
case class SplitMix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hash64"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) {
      h ^= (s.getByte(i) & 0xFFL)
      h *= 0xBF58476D1CE4E5B9L
      h ^= (h >>> 27)
      h *= 0x94D049BB133111EBL
      h ^= (h >>> 31)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $s.numBytes();
         |long $h = 0x9E3779B97F4A7C15L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h ^= ($s.getByte($i) & 0xFFL);
         |  $h *= 0xBF58476D1CE4E5B9L;
         |  $h ^= ($h >>> 27);
         |  $h *= 0x94D049BB133111EBL;
         |  $h ^= ($h >>> 31);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
