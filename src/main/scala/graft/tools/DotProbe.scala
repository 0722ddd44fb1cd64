package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Microbench: interpreted higher-order-function quantized dot vs the
  * native codegen [[org.apache.spark.sql.graft.QuantizedDot]], on the
  * same deterministic 64-dim float vectors. Interleaved min-of-k because
  * the host CPU is bursty. Run: `sbt "runMain graft.tools.DotProbe"`.
  */
object DotProbe {
  private def decVec(c: Column): Column =
    transform(c, (x: Column) => round(x.cast("double") * 1000).cast("long"))
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(decVec(a), decVec(b), (x: Column, y: Column) => x * y),
      lit(0L), (acc: Column, x: Column) => acc + x)

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("DotProbe").getOrCreate()

    // deterministic vectors: v_i[d] = fract(sin-free integer hash) scaled to [-1, 1)
    val base = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        (d: Column) => ((pmod(xxhash64(col("id"), d), lit(2000000)) - 1000000L)
          .cast("double") / 1000000.0).cast("float")).as("a"),
      transform(sequence(lit(0), lit(63)),
        (d: Column) => ((pmod(xxhash64(d, col("id")), lit(2000000)) - 1000000L)
          .cast("double") / 1000000.0).cast("float")).as("b"))
      .cache()
    base.count() // materialize once; both variants read the same cache

    def time(label: String, c: Column): Double = {
      val t0 = System.nanoTime()
      base.select(sum(c).as("s")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      sec
    }
    // warm both paths once
    time("warm-native", VectorExprs.qdot(col("a"), col("b")))
    time("warm-hof", hofDot(col("a"), col("b")))
    val natives = Array.fill(3)(0.0); val hofs = Array.fill(3)(0.0)
    for (k <- 0 until 3) { // interleave pairs — adjacent = same throttle state
      natives(k) = time("native", VectorExprs.qdot(col("a"), col("b")))
      hofs(k) = time("hof", hofDot(col("a"), col("b")))
    }
    val nMin = natives.min; val hMin = hofs.min
    println(f"""{"probe":"dot","rows":$n,"native_sec_min":$nMin%.3f,"hof_sec_min":$hMin%.3f,"speedup":${hMin / nMin}%.2f,"native_all":[${natives.map(x => f"$x%.3f").mkString(",")}],"hof_all":[${hofs.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
