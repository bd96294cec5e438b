package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injector: the supported way to ship the graft
  * expression family to a cluster — add
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every session
  * (including Thrift/Connect ones the library never touches directly)
  * resolves every graft_* function in SQL and DSL.
  *
  * `GraftFunctions.register(spark)` remains as a runtime fallback for
  * sessions built without the config (used by the query builders so each
  * query is self-contained); both paths share [[GraftFunctions.builders]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextExpressions", name),
        b))
    }
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => JwPrefilterRule)
  }
}
