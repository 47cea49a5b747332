package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: register the engine's custom SQL
  * functions at session build time —
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`). The
  * function list lives in [[graft.functions.GraftFunctions]]; this
  * class is only the injection shim Spark instantiates reflectively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
