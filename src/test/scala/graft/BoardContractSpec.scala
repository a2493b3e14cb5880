package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver-board interface contract, pinned as failing tests (r13
  * lesson: both non-green board rows were interface bugs, not wrong
  * answers — an array-typed output column the driver's pandas hasher
  * cannot sort, and a query shipped without an oracle).
  *
  *  1. every `SparkEntry.queries` key has an `oracleSql` entry, or an
  *     explicit `oracleExempt` listing (currently empty by design);
  *  2. no orphan oracles / stale exemptions;
  *  3. every query's RESULT schema is scalar-only at top level — no
  *     ArrayType/MapType/StructType column ever reaches the board.
  */
class BoardContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query has a DuckDB oracle (or a documented exemption)") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- SparkEntry.oracleExempt
    assert(missing.isEmpty,
      s"queries without oracleSql: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no orphan oracles and no stale exemptions") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries with no query: ${orphans.toSeq.sorted.mkString(", ")}")
    val stale = SparkEntry.oracleExempt -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"oracleExempt names that are not queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every board result schema is scalar-only (driver row-hasher contract)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-scalar board output columns: ${offenders.mkString("; ")}")
  }
}
