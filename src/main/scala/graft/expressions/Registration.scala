package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent per-session temp-function registration. The imperative
  * `register(spark)` calls sprinkled through the query builders are
  * belt-and-braces when [[graft.GraftExtensions]] is installed (which
  * already injects the graft_* functions): replacing an
  * already-registered function makes SimpleFunctionRegistry log a WARN
  * per call per pass — thousands of lines across a 476-query bench run
  * (r9 verdict, cosmetic #3). Registering only when absent keeps the
  * calls cheap and the logs quiet without changing resolution.
  */
private[expressions] object Registration {
  def tempFn(spark: SparkSession, name: String,
             builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
