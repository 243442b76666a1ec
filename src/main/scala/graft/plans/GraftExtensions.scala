package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.expressions.GraftFunctions

/** Session-extension entry point: injects graft's native expressions so
  * any session built with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `withExtensions`) can call them from SQL and the Column API.
  * No custom rules or strategies are injected — SURVEY §4 found none of
  * the reference's semantics need them; extensions carry expressions
  * only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
