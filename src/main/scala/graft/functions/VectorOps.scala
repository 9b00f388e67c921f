package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Vector math for the similarity operators.
  *
  * Spark's higher-order functions (zip_with/aggregate) do not participate
  * in whole-stage codegen — they evaluate interpreted, boxing every
  * element — so a 64-dim dot product per candidate pair costs ~100× a
  * primitive loop. A Scala UDF with a primitive while-loop is the faster
  * form here (one invocation per row, unboxed math inside); accumulation
  * stays left-to-right in double, bit-identical to the HOF fold and to
  * DuckDB's sequential list_sum, so oracle hashes are unchanged.
  */
object VectorOps {

  /** Left-fold double dot product. */
  val dotUdf: UserDefinedFunction = udf { (a: Seq[Double], b: Seq[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * 1-based dim i): first 4 hex chars of md5("p:i") scaled to [-1, 1) —
    * the same value the DuckDB oracle derives with
    * `CAST(('0x' || substr(md5(p || ':' || i), 1, 4)) AS BIGINT) / 32768.0 - 1.0`.
    * Precomputed driver-side so the executor hot path does zero hashing.
    */
  def planeMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i0) =>
      val i = i0 + 1
      val digest = MessageDigest.getInstance("MD5")
        .digest(s"$p:$i".getBytes(StandardCharsets.UTF_8))
      val hex4 = f"${digest(0) & 0xFF}%02x${digest(1) & 0xFF}%02x"
      java.lang.Long.parseLong(hex4, 16) / 32768.0 - 1.0
    }
}
