package graft.plans

import graft.functions.{FloatVecDot, SortedLongIntersectCard}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: the supported way to ship the graft
  * expression family to a cluster — add
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every session
  * (including Thrift/Connect ones the library never touches directly)
  * resolves `graft_dot` / `graft_sorted_intersect` in SQL and DSL.
  *
  * `GraftFunctions.register(spark)` remains as a runtime fallback for
  * sessions built without the config (used by the query builders so each
  * query is self-contained).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedLongIntersectCard].getName,
        "graft_sorted_intersect"),
      (es: Seq[Expression]) => SortedLongIntersectCard(es(0), es(1))))
  }
}
