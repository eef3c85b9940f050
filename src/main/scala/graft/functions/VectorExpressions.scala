package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for vector math where higher-order
  * functions are too slow: the HOF path (`zip_with`+`aggregate`)
  * interprets a closure per element (~µs/element); these run a
  * primitive loop per ROW via [[Kernels]] and stay inside whole-stage
  * codegen (static-call `doGenCode`). Measured 3–6× on the LSH sweep.
  */

/** All `tables` random-hyperplane LSH bucket keys of a vector in one
  * pass (Charikar 2002 sign-random-projection). Plane components are
  * deterministic splitmix64 pseudo-noise. */
case class LshBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    Kernels.lshBuckets(input.asInstanceOf[ArrayData], tables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.lshBuckets($c, $tables, $bits, $dim)")

  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}

/** Dot product of two double arrays — primitive loop, no closures. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(
      Kernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProduct = copy(left = l, right = r)
}

/** Map-side k-means cell assignment: argmax dot product against a
  * row-major flattened centroid matrix carried as a plan literal. Turns
  * IVF assignment from a corpus×nlist crossJoin+window shuffle into a
  * zero-exchange per-row loop. */
case class NearestCentroid(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any, cents: Any): Any =
    java.lang.Long.valueOf(Kernels.nearestCentroid(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.Kernels.nearestCentroid($v, $c, $dim)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : NearestCentroid = copy(left = l, right = r)
}

/** k-means L2 argmin — codegen'd position of the nearest centroid
  * (squared L2, fold-ordered; see [[Kernels.nearestCentroidL2]]).
  * The interpreted `aggregate(zip_with(...))` HOF form of the same
  * arithmetic measured ~7s/pass on 2000×64 at sf0.1 — HOF lambdas
  * have no codegen; this is the same reason [[NearestCentroid]]
  * exists for IVF. */
case class NearestCentroidL2(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_l2"

  override def nullSafeEval(v: Any, cents: Any): Any =
    java.lang.Long.valueOf(Kernels.nearestCentroidL2(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.Kernels.nearestCentroidL2($v, $c, $dim)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : NearestCentroidL2 = copy(left = l, right = r)
}

/** Companion min-distance of [[NearestCentroidL2]] — same fold, same
  * tie semantics, so the pair always describes one centroid. */
case class NearestCentroidL2Dist(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "nearest_centroid_l2_dist"

  override def nullSafeEval(v: Any, cents: Any): Any =
    java.lang.Double.valueOf(Kernels.nearestCentroidL2Dist(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.Kernels.nearestCentroidL2Dist($v, $c, $dim)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : NearestCentroidL2Dist = copy(left = l, right = r)
}

/** PQ ADC scoring: approximate dot of an encoded corpus row against a
  * query's per-subspace lookup table (built once per query, KBs).
  * `left` = the row's code array (m longs), `right` = the flattened
  * m×k table. Serve-time cost is m table adds per corpus row — the
  * memory/CPU trade that makes billion-vector ANN affordable. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codes: Any, tab: Any): Any =
    java.lang.Double.valueOf(Kernels.adcSum(
      codes.asInstanceOf[ArrayData], tab.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.functions.Kernels.adcSum($c, $t, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : PqAdc = copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def lshBuckets(vec: Column, tables: Int, bits: Int, dim: Int): Column =
    column(LshBuckets(expression(vec), tables, bits, dim))

  def dotFast(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def nearestCentroid(vec: Column, flatCentroids: Array[Double], dim: Int): Column =
    column(NearestCentroid(expression(vec),
      Literal.create(flatCentroids, ArrayType(DoubleType, containsNull = false)),
      dim))

  def pqAdc(codes: Column, tab: Column, k: Int): Column =
    column(PqAdc(expression(codes), expression(tab), k))

  def nearestCentroidL2(vec: Column, flatCentroids: Array[Double], dim: Int): Column =
    column(NearestCentroidL2(expression(vec),
      Literal.create(flatCentroids, ArrayType(DoubleType, containsNull = false)),
      dim))

  def nearestCentroidL2Dist(vec: Column, flatCentroids: Array[Double], dim: Int): Column =
    column(NearestCentroidL2Dist(expression(vec),
      Literal.create(flatCentroids, ArrayType(DoubleType, containsNull = false)),
      dim))
}
