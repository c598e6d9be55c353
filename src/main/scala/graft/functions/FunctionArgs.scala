package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Argument validation for the SQL-registered custom functions that
  * take a compile-time integer parameter (`char_ngrams`, `token_ngrams`,
  * `graft_misra_gries`). Before round 5 registration evaluated
  * `exprs(1).eval(null).asInstanceOf[Int]` unguarded, so a missing
  * argument, a non-literal, or a LONG literal surfaced as an opaque
  * `IndexOutOfBoundsException`/`ClassCastException` at analysis time;
  * these raise the standard Spark error classes instead.
  */
object FunctionArgs {

  /** Require exactly `n` arguments, else the standard WRONG_NUM_ARGS. */
  def requireArity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Extract a foldable integral literal as Int — any integral width is
    * accepted (`2L` works where `2` does), matching how built-in
    * parameterized functions read their static arguments. */
  def intLiteral(fn: String, param: String, e: Expression): Int = {
    def bad(): Nothing =
      throw new AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    val integral = e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    if (!e.foldable || !integral) bad()
    e.eval(null) match {
      // longValue first: intValue() silently truncates out-of-range
      // longs (char_ngrams(s, 4294967297L) would behave as n = 1)
      case n: Number if n.longValue() >= Int.MinValue &&
        n.longValue() <= Int.MaxValue => n.intValue()
      case _ => bad() // foldable NULL literal or out-of-Int-range value
    }
  }

  /** [[intLiteral]] plus a ≥ 1 bound — for size parameters (n-gram
    * width, sketch capacity, sample size) where 0 or a negative is
    * never meaningful and, worse, can surface as an executor-side
    * crash instead of an analysis error (AresSampleAgg with k = 0
    * falls through `buf.size < k` onto `buf.head` of an EMPTY heap —
    * NoSuchElementException deep in the aggregate). Fail at analysis
    * time with the value-oriented INVALID_PARAMETER_VALUE class (the
    * routine RESOLVES fine — the argument's value is what's wrong;
    * the free-form .PATTERN subclass renders "The value of
    * parameter(s) `p` in `f` is invalid: must be >= 1, got n."). */
  def positiveIntLiteral(fn: String, param: String, e: Expression): Int = {
    val n = intLiteral(fn, param, e)
    if (n < 1)
      throw new AnalysisException(
        "INVALID_PARAMETER_VALUE.PATTERN",
        Map(
          "parameter" -> s"`$param`",
          "functionName" -> s"`$fn`",
          "value" -> s"must be >= 1, got $n"))
    n
  }
}
