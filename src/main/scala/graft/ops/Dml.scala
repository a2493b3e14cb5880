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
    raw"(?is)^\s*UPDATE\s+(\S+)\s+SET\s+(.+?)\s*$$".r
  private val DeleteRe =
    raw"(?is)^\s*DELETE\s+FROM\s+(\S+)(\s.*?)?\s*$$".r
  private val WhereRe = raw"(?is)^WHERE\s+(.+)$$".r
  private val AssignRe = raw"(?s)^\s*(\w+)\s*=\s*(.+)$$".r

  /** Index of the first top-level `WHERE` keyword — outside string
    * literals (backslash escapes honored) and parentheses — or -1.
    * A `'use where needed'` literal inside a SET expression must not
    * terminate the SET list.
    */
  private def topLevelWhere(s: String): Int = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '\'') inStr = false
      } else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'w' | 'W'
            if depth == 0 && i + 5 <= s.length &&
              s.substring(i, i + 5).equalsIgnoreCase("where") &&
              (i == 0 || s.charAt(i - 1).isWhitespace) &&
              (i + 5 == s.length || s.charAt(i + 5).isWhitespace) =>
          return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Split on commas at paren depth 0 outside string literals
    * (backslash escapes honored; SQL `''` doubling toggles twice, which
    * also lands outside-the-literal correctly).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '\'') inStr = false
      } else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one statement; loud reject outside the grammar (same policy
    * as [[MergeInto.parse]]).
    */
  def parse(sql: String): Stmt = sql match {
    case UpdateRe(target, rest) =>
      val (setList, where) = topLevelWhere(rest) match {
        case -1 => (rest, None)
        case i =>
          val w = rest.substring(i) match {
            case WhereRe(cond) => cond.trim
            case other => throw new IllegalArgumentException(s"malformed WHERE clause: $other")
          }
          (rest.substring(0, i).trim, Some(w))
      }
      val set = splitTop(setList).map {
        case AssignRe(c, e) => c -> e.trim
        case other => throw new IllegalArgumentException(s"unsupported SET item: $other")
      }
      require(set.nonEmpty, "UPDATE requires at least one assignment")
      val dup = set.groupBy(_._1).collect { case (c, as) if as.size > 1 => c }
      require(dup.isEmpty, s"column assigned twice: ${dup.mkString(", ")}")
      Update(target, set, where)
    case DeleteRe(target, rest) =>
      Option(rest).map(_.trim).filter(_.nonEmpty) match {
        case None => Delete(target, None)
        case Some(WhereRe(cond)) => Delete(target, Some(cond.trim))
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported DELETE clause: $other")
      }
    case _ =>
      throw new IllegalArgumentException(
        "unsupported statement (expected UPDATE <t> SET ... [WHERE ...] or DELETE FROM <t> [WHERE ...])")
  }

  /** One entry point for the whole DML statement surface: UPDATE and
    * DELETE dispatch here, MERGE INTO and INSERT INTO dispatch to
    * [[MergeInto.execute]] (which needs the source batch). The caller's
    * statement router for a pipeline that receives arbitrary DML text.
    */
  def executeAny(spark: SparkSession, sql: String, tablePath: String => String,
                 keys: Seq[String], partitionSource: Option[String] = None,
                 source: Option[org.apache.spark.sql.DataFrame] = None,
                 tsCol: String = "__ts_ms"): CdcTable = {
    val trimmed = sql.trim
    if (trimmed.toUpperCase.startsWith("MERGE") || trimmed.toUpperCase.startsWith("INSERT")) {
      val batch = source.getOrElse(
        throw new IllegalArgumentException("MERGE/INSERT statements need a source batch"))
      MergeInto.execute(spark, sql, batch, tablePath, tsCol)
    } else execute(spark, sql, tablePath, keys, partitionSource)
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
