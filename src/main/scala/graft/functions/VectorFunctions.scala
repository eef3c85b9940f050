package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` embedding columns
  * as native higher-order-function expressions — no UDFs, no
  * serialization boundary (SURVEY §2.11 rule: native expression first).
  */
object VectorFunctions {

  /** Elementwise dot product via zip_with + aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity (null-safe on zero norms → null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(null)).otherwise(d / n)
  }

  /** L2-normalize a vector to unit length — precompute once per row so
    * downstream pair joins only pay the dot product (the 100 TB path:
    * normalize at ingest, store normalized). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, v => v / n))
  }

  /** Cast a float[] embedding to double[] for stable math. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Codegen'd k-means argmin: position of the nearest centroid by
    * squared L2 in the flattened matrix (fold-ordered, first-min tie
    * break — see [[Kernels.nearestCentroidL2]]). */
  def nearestCentroidL2Pos(vec: Column, flatCentroids: Array[Double],
      dim: Int): Column =
    VectorExpressions.nearestCentroidL2(vec, flatCentroids, dim)

  /** The companion minimum squared L2 itself. */
  def nearestCentroidL2Dist(vec: Column, flatCentroids: Array[Double],
      dim: Int): Column =
    VectorExpressions.nearestCentroidL2Dist(vec, flatCentroids, dim)
}
