package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{expr, lit}

/** Statement-level `UPDATE` / `DELETE`: the SQL face of
  * [[CdcTable.update]]/[[CdcTable.delete]], completing the DML statement
  * surface next to [[MergeInto]]. Plain Spark parses UPDATE/DELETE only
  * against v2 catalog tables; the engine's tables are parquet paths, so
  * this wrapper parses the statement shell (target, SET list, WHERE) and
  * hands every embedded expression to Spark's own `expr()` — full
  * expression power, no second expression grammar:
  *
  *   - `UPDATE t SET v = concat(v, '!'), amt = amt + 1 WHERE amt >= 20`
  *   - `DELETE FROM t WHERE v = 'x'`
  *
  * A missing WHERE applies to every row (standard SQL semantics). SET
  * items are split on top-level commas only, so function calls with
  * commas in the right-hand side parse correctly.
  */
object Dml {

  sealed trait Stmt { def target: String }
  final case class Update(target: String, set: Seq[(String, String)],
                          where: Option[String]) extends Stmt
  final case class Delete(target: String, where: Option[String]) extends Stmt

  private val UpdateRe =
    raw"(?is)^\s*UPDATE\s+(\S+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.+?))?\s*$$".r
  private val DeleteRe =
    raw"(?is)^\s*DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.+?))?\s*$$".r
  private val AssignRe = raw"(?s)^\s*(\w+)\s*=\s*(.+)$$".r

  /** Split on commas at paren depth 0 outside string literals. */
  private def splitTop(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    for (i <- s.indices) s(i) match {
      case '\'' => inStr = !inStr
      case '(' if !inStr => depth += 1
      case ')' if !inStr => depth -= 1
      case ',' if !inStr && depth == 0 =>
        out += s.substring(start, i); start = i + 1
      case _ => ()
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one statement; loud reject outside the grammar (same policy
    * as [[MergeInto.parse]]).
    */
  def parse(sql: String): Stmt = sql match {
    case UpdateRe(target, setList, where) =>
      val set = splitTop(setList).map {
        case AssignRe(c, e) => c -> e.trim
        case other => throw new IllegalArgumentException(s"unsupported SET item: $other")
      }
      require(set.nonEmpty, "UPDATE requires at least one assignment")
      val dup = set.groupBy(_._1).collect { case (c, as) if as.size > 1 => c }
      require(dup.isEmpty, s"column assigned twice: ${dup.mkString(", ")}")
      Update(target, set, Option(where).map(_.trim))
    case DeleteRe(target, where) =>
      Delete(target, Option(where).map(_.trim))
    case _ =>
      throw new IllegalArgumentException(
        "unsupported statement (expected UPDATE <t> SET ... [WHERE ...] or DELETE FROM <t> [WHERE ...])")
  }

  /** Execute `sql` against the [[CdcTable]] at `tablePath(targetName)`.
    * `keys`/`partitionSource` carry the table's layout metadata (a real
    * catalog would store them; the path contract mirrors
    * [[MergeInto.execute]]).
    */
  def execute(spark: SparkSession, sql: String, tablePath: String => String,
              keys: Seq[String], partitionSource: Option[String] = None): CdcTable = {
    val stmt = parse(sql)
    val table = new CdcTable(spark, tablePath(stmt.target), keys, partitionSource)
    stmt match {
      case Update(_, set, where) =>
        table.update(where.map(expr).getOrElse(lit(true)),
          set.map { case (c, e) => c -> expr(e) }.toMap)
      case Delete(_, where) =>
        table.delete(where.map(expr).getOrElse(lit(true)))
    }
    table
  }
}
