package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text)` — 64-bit SimHash over whitespace tokens as a native
  * codegen'd expression.
  *
  * Identical semantics to the composable formulation (per bit b, sum a
  * ±1 vote from bit b of each token's `xxhash64`; the fingerprint sets
  * bit b iff the vote sum is positive) — token hashes use the same
  * XXH64 with Spark's seed 42, so fingerprints match the HOF version
  * bit-for-bit. The HOF version evaluates 64 interpreted `aggregate`
  * lambdas per row (64 × tokens closure dispatches); this is one static
  * call per row running a vote-count loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val toks = Whitespace.split(text.toString)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val u = UTF8String.fromString(toks(t))
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Column API. */
  def simhash64(text: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(text)))
}
