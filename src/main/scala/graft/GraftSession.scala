package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{CdcTable, Dml, MergeInto}

/** The library's user-facing façade: one object bound to a table root,
  * one `sql()` entry point for EVERY statement the engine speaks —
  * reads return rows, writes execute and return an empty frame (the
  * `spark.sql` convention for DDL/DML). Table layout always resolves
  * through the `_table_meta` sidecar ([[CdcTable.open]]), so a user
  * switching from the reference's `spark.sql("MERGE INTO ...")` +
  * Iceberg-catalog workflow drives the whole engine with statements and
  * never supplies keys or partition specs out of band:
  *
  * {{{
  *   val g = new GraftSession(spark, "/data/lake")
  *   g.sql("CREATE TABLE users KEYED BY (id) AS SELECT ...")
  *   g.sql("MERGE INTO users t USING s ON t.id = s.id WHEN ...", batch)
  *   g.sql("UPDATE users SET tier = 'gold' WHERE spend > 100")
  *   g.sql("SELECT COUNT(*) FROM users WHERE id >= 500").show()
  *   g.sql("DESCRIBE HISTORY users").show()
  *   g.table("users").createBranch("audit")
  * }}}
  */
final class GraftSession(val spark: SparkSession, val root: String) {

  private val path = (n: String) => s"$root/$n"

  /** Run any engine statement. Reads (DESCRIBE HISTORY/FILES, SHOW
    * PARTITIONS/BRANCHES/TABLES, TABLE ... AS OF, SELECT COUNT(*))
    * return their rows; writes (UPDATE/DELETE/INSERT/CTAS/DROP/
    * OPTIMIZE/VACUUM/RESTORE/branch DDL) execute against the versioned
    * tables and return an empty frame. `MERGE INTO` and the
    * batch-INSERT form need the micro-batch — use the two-argument
    * overload.
    */
  def sql(statement: String): DataFrame =
    if (isRead(statement)) Dml.query(spark, statement, path)
    else {
      Dml.execute(spark, statement, path): Unit
      spark.emptyDataFrame
    }

  /** Statement + source batch: `MERGE INTO` / the reference's
    * batch-INSERT fallback consume `source`; everything else routes as
    * [[sql]] (the batch is ignored, matching the reference's router).
    */
  def sql(statement: String, source: DataFrame, tsCol: String = "__ts_ms"): DataFrame = {
    val upper = statement.trim.toUpperCase
    if (upper.startsWith("MERGE") || Dml.isBatchInsert(statement)) {
      MergeInto.execute(spark, statement, source, path, tsCol): Unit
      spark.emptyDataFrame
    } else sql(statement)
  }

  /** Handle on a committed table (layout from its own sidecar). */
  def table(name: String): CdcTable = CdcTable.open(spark, path(name))

  /** Current rows of a committed table. */
  def read(name: String): DataFrame = table(name).read

  private def isRead(statement: String): Boolean = Dml.parse(statement) match {
    case _: Dml.DescribeHistory | _: Dml.TableAsOf | _: Dml.TableAsOfTs |
         _: Dml.ShowPartitions | _: Dml.ShowBranches | _: Dml.ShowTables |
         _: Dml.CountStar | _: Dml.DescribeFiles => true
    case _ => false
  }
}
