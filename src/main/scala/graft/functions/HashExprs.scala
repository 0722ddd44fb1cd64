package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, SplitMix64}

/** DataFrame-API entry point for the native corpus-hash expression.
  * See [[org.apache.spark.sql.graft.SplitMix64]]; SQL users get the same
  * kernel as `graft_hash64(...)` via [[graft.GraftExtensions]]. */
object HashExprs {

  /** splitmix64 of a string column's UTF-8 bytes, identical to
    * `graft.layout.MediaOcr.hash64` — a signed 64-bit LongType column. */
  def hash64s(c: Column): Column =
    ColumnBridge.of(SplitMix64(ColumnBridge.expr(c)))
}
