package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity-checked SQL function builders, shared by every registration
  * surface (GraftExtensions AND the per-object registerAll helpers): a
  * silently-dropped extra argument would hash the wrong thing and return a
  * plausible value (e.g. `simhash64(a, b)` quietly hashing only `a`) —
  * fail analysis instead, from whichever path registered the function.
  */
private[graft] object FnArity {

  private def wrongArgs(name: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> name,
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  def unary(name: String)(mk: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1) wrongArgs(name, 1, exprs.length)
    mk(exprs.head)
  }

  def binary(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) wrongArgs(name, 2, exprs.length)
    mk(exprs.head, exprs(1))
  }
}
