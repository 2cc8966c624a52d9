package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `posweight_checksum(text)` — the order-sensitive document checksum
  * `sum(codepoint(c_i) · i) mod 1000000007` (1-based character
  * positions) as a native codegen'd expression.
  *
  * Replaces the interpreted HOF formulation
  * `aggregate(transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1)) * i), 0, +)`,
  * which allocates a position array and dispatches two lambda closures
  * PER CHARACTER; this is one static call per row running a codepoint
  * loop — the same interpreted-HOF-to-codegen move as WordShingles and
  * SimHash64. Semantics match the HOF version exactly (asserted in
  * CodegenExprSpec): positions count codepoints like `substr`, the
  * per-character value is the codepoint like `ascii`, the sum wraps in
  * long arithmetic and the remainder keeps Java sign semantics.
  */
case class PosWeightChecksum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"posweight_checksum expects string, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "posweight_checksum"

  override def nullSafeEval(input: Any): Any =
    PosWeightChecksum.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PosWeightChecksum.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PosWeightChecksum =
    copy(child = newChild)
}

object PosWeightChecksum {

  val Mod: Long = 1000000007L

  def compute(text: UTF8String): Long = {
    val s = text.toString
    var idx = 0
    var pos = 1L
    var sum = 0L
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      sum += cp.toLong * pos
      pos += 1
      idx += Character.charCount(cp)
    }
    sum % Mod
  }

  /** Column API. */
  def posweightChecksum(text: Column): Column =
    GraftSqlShim.column(PosWeightChecksum(GraftSqlShim.expression(text)))
}
