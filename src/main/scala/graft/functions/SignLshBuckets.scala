package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `sign_lsh_buckets(qvec, rows, bands)` — banded random-hyperplane LSH
  * bucket ids for a quantized vector, as a native codegen'd expression.
  *
  * Emits `bands` bucket ids; band `b`'s id packs the sign bits of
  * `rows` deterministic ±1-hyperplane projections (planes
  * `b·rows … b·rows+rows−1`), with the band index baked into the id so
  * buckets never collide across bands. Two vectors at angle θ share a
  * given band with probability `(1 − θ/π)^rows`; the chance NO band
  * collides is `(1 − (1−θ/π)^rows)^bands` — `rows` trades selectivity
  * against recall, `bands` drives the miss probability down
  * geometrically. Hyperplane components are ±1 from a splitmix64 bit
  * of (plane, dim) — no RNG state, reproducible across executors and
  * runs, sign matrix cached per (planes, dim).
  *
  * The interpreted formulation (`aggregate(zip_with(...))` per plane,
  * since removed from `SimSearch`) cost a closure dispatch per element
  * per plane; this expression is one static call per row running
  * `bands·rows·dim` primitive multiply-adds inside WholeStageCodegen.
  */
case class SignLshBuckets(child: Expression, rows: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if rows >= 1 && rows <= 62 && bands >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets expects (array<bigint>, 1<=rows<=62, bands>=1), got $t rows=$rows bands=$bands")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    SignLshBuckets.compute(input.asInstanceOf[ArrayData], rows, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignLshBuckets.compute($c, $rows, $bands);")

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {

  /** splitmix64 finalizer — deterministic per-(plane, dim) bit source. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ±1 sign matrix for (nPlanes, dim), cached — planes are row-
    * independent, so the matrix is computed once per JVM per shape.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()

  private def signs(nPlanes: Int, dim: Int): Array[Array[Byte]] =
    signCache.computeIfAbsent((nPlanes, dim), { _ =>
      Array.tabulate(nPlanes, dim) { (p, d) =>
        if ((mix(p.toLong * 1000003L + d) & 1L) == 1L) 1.toByte else -1.toByte
      }
    })

  def compute(vec: ArrayData, rows: Int, bands: Int): ArrayData = {
    val dim = vec.numElements()
    val sm = signs(rows * bands, dim)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var r = 0
      while (r < rows) {
        val row = sm(b * rows + r)
        var proj = 0L
        var i = 0
        while (i < dim) { proj += vec.getLong(i) * row(i); i += 1 }
        if (proj > 0) bits |= (1L << r)
        r += 1
      }
      out(b) = (b.toLong << rows) | bits
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API — `qvec` must be a quantized `array<bigint>` vector. */
  def signLshBuckets(qvec: Column, rows: Int, bands: Int): Column =
    GraftSqlShim.column(
      SignLshBuckets(GraftSqlShim.expression(qvec), rows, bands))
}
