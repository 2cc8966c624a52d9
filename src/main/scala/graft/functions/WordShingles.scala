package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — distinct word n-grams (" "-joined, first-
  * occurrence order) as a native codegen'd Catalyst expression.
  *
  * Semantically identical to the composable HOF formulation
  * `array_distinct(transform(sequence(1, size(t)-2), i ->
  * concat_ws(' ', t[i], t[i+1], t[i+2])))` over whitespace tokens
  * (DuckDB: `list_distinct(list_transform(...))` — the oracle keeps
  * that formulation), but those higher-order functions are interpreted:
  * one closure dispatch per token per lambda layer, which made shingle
  * materialization the dominant cost of every shingle-based dedup
  * (10+ s of a 13.5 s query at sf0.1). This expression is ONE static
  * call per row inside WholeStageCodegen running a tight tokenize +
  * join + dedup loop. Same preference order as `QuantizedDot`:
  * built-ins first, codegen `Expression` for the hot loop, UDFs never.
  *
  * Null handling: standard null-propagation (null text → null array);
  * both downstream consumers (`explode` / `explode_outer`) treat null
  * and empty arrays identically, and the tokens-below-n case returns
  * an EMPTY array exactly like the `when(size >= n, …)` guard did.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, n >= 1), got ${child.dataType}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** One row's shingles: whitespace-tokenize (empties dropped — same as
    * `filter(split(text, "\\s+"), _ =!= "")`), join n-grams with a
    * single space, keep first occurrence of each distinct shingle.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    if (toks.length < n) return Empty
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def wordShingles(text: Column, n: Int = 3): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), n))
}
