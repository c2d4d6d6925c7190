package graft

import graft.functions.SqlFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions hook: inject the native kernels into every session
  * built with `--conf spark.sql.extensions=graft.GraftExtensions` (the
  * standard deployment path for out-of-tree Catalyst functions; no
  * per-session `registerAll` call needed). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    SqlFunctions.functions.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.NativeExprs", name),
        builder))
    }
}
