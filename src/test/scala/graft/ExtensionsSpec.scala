package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The session-extensions installation path: the shared test session is
  * built with `spark.sql.extensions=graft.GraftExtensions`, so the native
  * functions must resolve in SQL with no explicit registration call.
  */
class ExtensionsSpec extends SparkSpec {

  test("dot_i64 is installed by GraftExtensions at session build time") {
    assert(spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("dot_i64")))
    val got = spark.sql(
      "SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(got == 1L * 4 + 2 * 5 + 3 * 6)
  }

  test("VectorFunctions.register is an idempotent no-op when installed") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.VectorFunctions.register(spark)
    assert(spark.sql("SELECT dot_i64(array(2L), array(21L)) AS d")
      .head().getLong(0) == 42L)
  }
}
