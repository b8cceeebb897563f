package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor for `SparkSessionExtensions.registerFunctions`
  * (private[sql]): lets ExtensionsSpec drive the injected builders
  * through a real registry — the call `BaseSessionStateBuilder` makes
  * at session build — without tearing down the suite-shared session.
  */
object GraftExtensionsBridge {
  def registerInto(e: SparkSessionExtensions, reg: FunctionRegistry): Unit = {
    e.registerFunctions(reg)
    ()
  }
}
