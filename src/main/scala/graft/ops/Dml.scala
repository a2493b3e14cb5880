package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, lit}

/** Statement-level `UPDATE` / `DELETE` / `INSERT`: the SQL face of
  * [[CdcTable.update]]/[[CdcTable.delete]]/[[CdcTable.append]],
  * completing the DML statement surface next to [[MergeInto]]. Plain
  * Spark parses these only against v2 catalog tables; the engine's
  * tables are parquet paths, so this wrapper parses the statement shell
  * (target, SET list, WHERE, column list) and hands every embedded
  * expression to Spark's own `expr()`/`sql()` — full expression power,
  * no second expression grammar:
  *
  *   - `UPDATE t SET v = concat(v, '!'), amt = amt + 1 WHERE amt >= 20`
  *   - `DELETE FROM t WHERE v = 'x'`
  *   - `INSERT INTO t (k, v) VALUES (1, 'a'), (2, upper('b'))`
  *   - `INSERT INTO t SELECT k, v FROM some_view`
  *
  * A missing WHERE applies to every row (standard SQL semantics). SET
  * items are split on top-level commas only, so function calls with
  * commas in the right-hand side parse correctly. INSERT appends through
  * the versioned commit path (a new immutable version per statement,
  * reference keyless path K3 / incremental_kafka_s3_cdc.py:275-276);
  * missing columns null-fill typed from the stored schema, unknown
  * columns reject loudly.
  */
object Dml {

  sealed trait Stmt { def target: String }
  final case class Update(target: String, set: Seq[(String, String)],
                          where: Option[String]) extends Stmt
  final case class Delete(target: String, where: Option[String]) extends Stmt
  /** Exactly one of `values` (the raw tuples text after VALUES) or
    * `select` (the full SELECT query) is set.
    */
  final case class Insert(target: String, columns: Seq[String],
                          values: Option[String], select: Option[String]) extends Stmt
  final case class DescribeHistory(target: String) extends Stmt
  /** `OPTIMIZE t [PARTITIONS ('m', ...)] [ZORDER BY (a, b)]` —
    * compaction, optionally scoped to the named months
    * ([[CdcTable.compactMonths]]) and optionally Morton-clustered; the
    * Delta maintenance statement shape.
    */
  final case class Optimize(target: String, zorderBy: Seq[String],
                            partitions: Seq[String] = Nil) extends Stmt
  /** `VACUUM t` — expire retained history and GC unreferenced data
    * ([[CdcTable.expire]]).
    */
  final case class Vacuum(target: String) extends Stmt
  /** `MAINTAIN t` — the one-call nightly pass ([[CdcTable.maintain]]):
    * materialize DV debt, bound file counts, expire+GC, refresh ANALYZE.
    */
  final case class Maintain(target: String) extends Stmt
  /** `SELECT COUNT(*) FROM t [WHERE ...]` — metadata-answered when the
    * condition is exactly skip-expressible
    * ([[FileSkipping.predsOfExact]]), scan fallback otherwise; always
    * the exact count.
    */
  final case class CountStar(target: String, where: Option[String]) extends Stmt
  /** `SHOW PARTITIONS t` — the manifest's month list with per-month data
    * dir and file counts; metadata-only.
    */
  final case class ShowPartitions(target: String) extends Stmt
  /** `TABLE t VERSION AS OF n` — time-travel read ([[CdcTable.readVersion]]). */
  final case class TableAsOf(target: String, version: Long) extends Stmt
  /** `TABLE t TIMESTAMP AS OF '<ts>'` — time-travel read resolved to the
    * latest commit at or before the UTC timestamp
    * ([[CdcTable.readAtTimestamp]]).
    */
  final case class TableAsOfTs(target: String, tsMillis: Long) extends Stmt
  /** `RESTORE t TO TIMESTAMP AS OF '<ts>'` — rollback-as-new-version to
    * the state live at the UTC timestamp.
    */
  final case class RestoreTs(target: String, tsMillis: Long) extends Stmt
  /** `DESCRIBE FILES t` — per-data-file inventory from commit sidecars
    * ([[CdcTable.filesInfo]]); metadata-only.
    */
  final case class DescribeFiles(target: String) extends Stmt
  /** `DESCRIBE TABLE t` — columns + layout from the schema/_table_meta
    * sidecars ([[CdcTable.describe]]); metadata-only.
    */
  final case class DescribeTable(target: String) extends Stmt
  /** `ANALYZE TABLE t` — column NDV + live row count from the register
    * sidecars ([[CdcTable.analyze]]); metadata-only in the steady state,
    * returns the stats rows.
    */
  final case class AnalyzeTable(target: String) extends Stmt
  /** `RESTORE t TO VERSION AS OF n` — rollback-as-new-version
    * ([[CdcTable.restore]]).
    */
  final case class Restore(target: String, version: Long) extends Stmt
  /** `ALTER TABLE t CREATE BRANCH b` — fork a write-audit-publish branch
    * ([[CdcTable.createBranch]]); Iceberg's branch DDL shape.
    */
  final case class CreateBranch(target: String, name: String) extends Stmt
  /** `ALTER TABLE t PUBLISH BRANCH b` — atomic fast-forward of the table
    * to the branch state ([[CdcTable.publish]]).
    */
  final case class PublishBranch(target: String, name: String) extends Stmt
  /** `ALTER TABLE t DROP BRANCH b` — discard staged work
    * ([[CdcTable.dropBranch]]).
    */
  final case class DropBranch(target: String, name: String) extends Stmt
  /** `SHOW BRANCHES t` — live branches with fork/head versions;
    * metadata-only.
    */
  final case class ShowBranches(target: String) extends Stmt
  /** `CREATE TABLE t [KEYED BY (k, ...)] [PARTITIONED BY (c)] AS SELECT ...`
    * — CTAS through the versioned commit path: the result of the SELECT
    * becomes version 1, KEYED BY declares the merge identity (omitted =
    * keyless/append-only), PARTITIONED BY the month-bucket source column.
    * The layout persists in `_table_meta`, so every later statement
    * routes keylessly.
    */
  final case class CreateTableAs(target: String, keys: Seq[String],
                                 partitionSource: Option[String],
                                 select: String,
                                 partitionGranularity: String = "month") extends Stmt
  /** `DROP TABLE t` — delete the table directory (all versions, branches,
    * sidecars). Deliberately NOT undoable — unlike RESTORE, there is no
    * pointer left to travel from.
    */
  final case class DropTable(target: String) extends Stmt
  /** `SHOW TABLES` — committed tables under the router's root;
    * metadata-only (one listing + pointer existence checks).
    */
  final case class ShowTables() extends Stmt { def target: String = "" }

  private val UpdateRe =
    raw"(?is)^\s*UPDATE\s+(\S+)\s+SET\s+(.+?)\s*$$".r
  private val DeleteRe =
    raw"(?is)^\s*DELETE\s+FROM\s+(\S+)(\s.*?)?\s*$$".r
  // the target must not swallow a no-space column list (`t(id)`), so '('
  // is excluded from it; VALUES needs no trailing whitespace ("VALUES(1)")
  private val InsertValuesRe =
    raw"(?is)^\s*INSERT\s+INTO\s+([^\s(]+)\s*(?:\(([^)]*)\)\s*)?VALUES\s*(\(.+?)\s*$$".r
  private val InsertSelectRe =
    raw"(?is)^\s*INSERT\s+INTO\s+([^\s(]+)\s*(?:\(([^)]*)\)\s*)?(SELECT\b.+?)\s*$$".r
  private val DescHistRe =
    raw"(?is)^\s*DESCRIBE\s+HISTORY\s+(\S+)\s*$$".r
  private val OptimizeRe =
    raw"(?is)^\s*OPTIMIZE\s+([^\s(]+)\s*(?:PARTITIONS\s*\(([^)]*)\)\s*)?(?:ZORDER\s+BY\s*\(([^)]+)\)\s*)?$$".r
  private val VacuumRe =
    raw"(?is)^\s*VACUUM\s+(\S+)\s*$$".r
  private val MaintainRe =
    raw"(?is)^\s*MAINTAIN\s+(\S+)\s*$$".r
  private val AsOfRe =
    raw"(?is)^\s*TABLE\s+(\S+)\s+VERSION\s+AS\s+OF\s+(\d+)\s*$$".r
  private val AsOfTsRe =
    raw"(?is)^\s*TABLE\s+(\S+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*$$".r
  private val RestoreTsRe =
    raw"(?is)^\s*RESTORE\s+(\S+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*$$".r
  private val DescFilesRe =
    raw"(?is)^\s*DESCRIBE\s+FILES\s+(\S+)\s*$$".r
  private val DescTableRe =
    raw"(?is)^\s*DESCRIBE\s+TABLE\s+(\S+)\s*$$".r
  private val AnalyzeRe =
    raw"(?is)^\s*ANALYZE\s+TABLE\s+(\S+)\s*$$".r

  /** UTC wall-clock string (`yyyy-MM-dd HH:mm:ss[.fff]` or ISO) →
    * epoch millis; the commit log records absolute millis, so the
    * statement timestamp must be zone-pinned, not JVM-default-zoned.
    */
  private def utcMillis(s: String): Long = {
    val t = s.trim.replace(' ', 'T')
    val ldt =
      if (t.contains('T')) java.time.LocalDateTime.parse(t)
      else java.time.LocalDate.parse(t).atStartOfDay() // date-only literal
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }
  private val CountRe =
    raw"(?is)^\s*SELECT\s+COUNT\s*\(\s*\*\s*\)\s+FROM\s+(\S+)(\s.*?)?\s*$$".r
  private val ShowPartsRe =
    raw"(?is)^\s*SHOW\s+PARTITIONS\s+(\S+)\s*$$".r
  private val RestoreRe =
    raw"(?is)^\s*RESTORE\s+(\S+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$$".r
  private val CreateBranchRe =
    raw"(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+CREATE\s+BRANCH\s+(\S+)\s*$$".r
  private val PublishBranchRe =
    raw"(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+PUBLISH\s+BRANCH\s+(\S+)\s*$$".r
  private val DropBranchRe =
    raw"(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+BRANCH\s+(\S+)\s*$$".r
  private val ShowBranchesRe =
    raw"(?is)^\s*SHOW\s+BRANCHES\s+(\S+)\s*$$".r
  // the PARTITIONED BY group admits one nesting level for the transform
  // forms months(col) / days(col)
  private val CreateTableAsRe =
    raw"(?is)^\s*CREATE\s+TABLE\s+([^\s(]+)\s*(?:KEYED\s+BY\s*\(([^)]+)\)\s*)?(?:PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))+)\)\s*)?AS\s+(SELECT\b.+?)\s*$$".r
  private val DropTableRe =
    raw"(?is)^\s*DROP\s+TABLE\s+(\S+)\s*$$".r
  private val ShowTablesRe =
    raw"(?is)^\s*SHOW\s+TABLES\s*$$".r
  private val WhereRe = raw"(?is)^WHERE\s+(.+)$$".r
  private val AssignRe = raw"(?s)^\s*(\w+)\s*=\s*(.+)$$".r
  private val IdentRe = raw"(?s)^\w+$$".r

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
    case InsertValuesRe(target, cols, tuples) =>
      Insert(target, parseColumnList(cols), Some(tuples.trim), None)
    case InsertSelectRe(target, cols, select) =>
      Insert(target, parseColumnList(cols), None, Some(select.trim))
    case DescHistRe(target) => DescribeHistory(target)
    case OptimizeRe(target, parts, zcols) =>
      val cols = parseColumnList(zcols)
      require(zcols == null || cols.nonEmpty, "ZORDER BY needs at least one column")
      val months = Option(parts).map(splitTop(_).map { m =>
        val t = m.trim
        require(t.length >= 2 && t.head == '\'' && t.last == '\'',
          s"PARTITIONS takes quoted month literals, got: $t")
        t.substring(1, t.length - 1)
      }).getOrElse(Nil)
      require(parts == null || months.nonEmpty, "PARTITIONS needs at least one month")
      Optimize(target, cols, months)
    case VacuumRe(target) => Vacuum(target)
    case MaintainRe(target) => Maintain(target)
    case AsOfRe(target, v) => TableAsOf(target, v.toLong)
    case AsOfTsRe(target, ts) => TableAsOfTs(target, utcMillis(ts))
    case RestoreTsRe(target, ts) => RestoreTs(target, utcMillis(ts))
    case DescFilesRe(target) => DescribeFiles(target)
    case DescTableRe(target) => DescribeTable(target)
    case AnalyzeRe(target) => AnalyzeTable(target)
    case CountRe(target, rest) =>
      Option(rest).map(_.trim).filter(_.nonEmpty) match {
        case None => CountStar(target, None)
        case Some(WhereRe(cond)) => CountStar(target, Some(cond.trim))
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported COUNT clause: $other")
      }
    case RestoreRe(target, v) => Restore(target, v.toLong)
    case ShowPartsRe(target) => ShowPartitions(target)
    case CreateBranchRe(target, name) => CreateBranch(target, name)
    case PublishBranchRe(target, name) => PublishBranch(target, name)
    case DropBranchRe(target, name) => DropBranch(target, name)
    case ShowBranchesRe(target) => ShowBranches(target)
    case CreateTableAsRe(target, ks, ps, select) =>
      // PARTITIONED BY accepts a bare column (month granularity, the
      // reference's hidden MONTHS transform) or the Iceberg transform
      // forms months(col) / days(col)
      val TransformRe = raw"(?is)^\s*(months|days|hours)\s*\(\s*(\w+)\s*\)\s*$$".r
      val (part, gran) = Option(ps).map(_.trim).filter(_.nonEmpty) match {
        case None => (None, "month")
        case Some(TransformRe(fn, c)) =>
          (Some(c), fn.toLowerCase.stripSuffix("s"))
        case Some(one) =>
          val cols = parseColumnList(one)
          require(cols.size == 1, "PARTITIONED BY takes exactly one source column")
          (cols.headOption, "month")
      }
      CreateTableAs(target, parseColumnList(ks), part, select.trim, gran)
    case DropTableRe(target) => DropTable(target)
    case ShowTablesRe() => ShowTables()
    case _ =>
      throw new IllegalArgumentException(
        "unsupported statement (expected UPDATE <t> SET ... [WHERE ...], " +
          "DELETE FROM <t> [WHERE ...], INSERT INTO <t> [(cols)] VALUES ... | SELECT ..., " +
          "DESCRIBE HISTORY <t>, OPTIMIZE <t> [ZORDER BY (cols)], VACUUM <t>, " +
          "TABLE <t> VERSION AS OF <n>, RESTORE <t> TO VERSION AS OF <n>, " +
          "ALTER TABLE <t> CREATE|PUBLISH|DROP BRANCH <b>, SHOW BRANCHES <t>, " +
          "CREATE TABLE <t> [KEYED BY (k)] [PARTITIONED BY (c)] AS SELECT ..., " +
          "DROP TABLE <t>, or SHOW TABLES)")
  }

  private def parseColumnList(cols: String): Seq[String] = {
    val out = Option(cols).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    out.foreach(c => require(IdentRe.matches(c), s"malformed column name: $c"))
    require(out.distinct.size == out.size, "column list has duplicates")
    out
  }

  /** One entry point for the whole DML statement surface: UPDATE, DELETE,
    * and standalone INSERT (VALUES / SELECT) dispatch here; MERGE INTO —
    * and the reference's batch-INSERT fallback `INSERT INTO t (...)
    * VALUES (s. ...)` — dispatch to [[MergeInto.execute]], which consumes
    * the caller's source batch. The caller's statement router for a
    * pipeline that receives arbitrary DML text.
    */
  // the reference's batch-INSERT fallback is recognized by SHAPE (its
  // VALUES reference the source alias: `VALUES (s.id, ...)`), not by the
  // side-channel presence of a batch — a router that always supplies its
  // micro-batch must still reach the literal/SELECT INSERT path
  private val BatchInsertRe =
    raw"(?is)^\s*INSERT\s+INTO\s+\S+\s*\([^)]*\)\s*VALUES\s*\(\s*s\s*\..*".r

  /** The reference's batch-INSERT fallback shape (its VALUES reference
    * the source alias) — routed to [[MergeInto.execute]] with the batch.
    */
  def isBatchInsert(sql: String): Boolean = BatchInsertRe.matches(sql.trim)

  def executeAny(spark: SparkSession, sql: String, tablePath: String => String,
                 keys: Seq[String], partitionSource: Option[String] = None,
                 source: Option[org.apache.spark.sql.DataFrame] = None,
                 tsCol: String = "__ts_ms"): CdcTable = {
    val trimmed = sql.trim
    val upper = trimmed.toUpperCase
    if (upper.startsWith("MERGE"))
      MergeInto.execute(spark, sql, source.getOrElse(
        throw new IllegalArgumentException("MERGE statements need a source batch")),
        tablePath, tsCol)
    else if (upper.startsWith("INSERT") && BatchInsertRe.matches(trimmed))
      MergeInto.execute(spark, sql, source.getOrElse(
        throw new IllegalArgumentException(
          "the batch-INSERT form (VALUES (s.col, ...)) needs a source batch")),
        tablePath, tsCol)
    else execute(spark, sql, tablePath, keys, partitionSource)
  }

  /** Execute `sql` against the [[CdcTable]] at `tablePath(targetName)`.
    * `keys`/`partitionSource` carry the table's layout metadata (a real
    * catalog would store them; the path contract mirrors
    * [[MergeInto.execute]]). `vectoredDeletes` is the table-property
    * analogue of Delta's `delta.enableDeletionVectors`: DELETE
    * statements route to the merge-on-read
    * [[CdcTable.deleteVectored]] instead of the copy-on-write rewrite —
    * identical visible semantics, kilobytes written instead of
    * rewritten files.
    */
  def execute(spark: SparkSession, sql: String, tablePath: String => String,
              keys: Seq[String], partitionSource: Option[String] = None,
              vectoredDeletes: Boolean = false): CdcTable = {
    val stmt = parse(sql)
    executeDdl(spark, stmt, tablePath).getOrElse(
      executeOn(spark, stmt,
        new CdcTable(spark, tablePath(stmt.target), keys, partitionSource), vectoredDeletes))
  }

  /** Statements that create or destroy the table itself — dispatched
    * BEFORE any handle resolves (a CTAS target does not exist yet; a
    * dropped one stops existing). CTAS layout comes from the statement
    * (`KEYED BY` merge identity, `PARTITIONED BY` month source) and
    * persists in `_table_meta` with the version-1 commit.
    */
  private def executeDdl(spark: SparkSession, stmt: Stmt,
                         tablePath: String => String,
                         io: TableIO = LocalTableIO): Option[CdcTable] = stmt match {
    case CreateTableAs(t, ks, ps, sel, gran) =>
      val table = new CdcTable(spark, tablePath(t), ks, ps, io = io,
        partitionGranularity = gran)
      require(table.currentVersion.isEmpty, s"table $t already exists — DROP it first " +
        "(CTAS will not silently overwrite a committed table)")
      table.init(spark.sql(sel))
      Some(table)
    case DropTable(t) =>
      // Guard the recursive delete: the parser's target token admits any
      // non-space string, so an un-validated name like '../..' would
      // resolve OUTSIDE the session root and a typo would delete an
      // arbitrary directory. Same name rule as branches/savepoints
      // (no '/'), and the target must be a COMMITTED table — its dir
      // holds a current-version pointer — before anything is removed.
      require(t.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
        s"table name '$t' — use [A-Za-z0-9._-], starting alphanumeric")
      val table = new CdcTable(spark, tablePath(t), Nil, io = io)
      require(table.currentVersion.isDefined,
        s"DROP TABLE $t: no committed table at ${table.path} — refusing to delete")
      table.io.deleteRecursively(table.path)
      Some(table)
    case _ => None
  }

  /** Self-describing route: the target resolves through [[CdcTable.open]],
    * so its merge keys / partition source / bloom columns come from the
    * table's own `_table_meta` sidecar — arbitrary DML text runs with NO
    * out-of-band layout knowledge (what a catalog would supply; the
    * sidecar IS the catalog entry). Targets must be committed tables —
    * creation still goes through the parameterized entry points.
    */
  def execute(spark: SparkSession, sql: String, tablePath: String => String): CdcTable =
    execute(spark, sql, tablePath, LocalTableIO: TableIO)

  def execute(spark: SparkSession, sql: String, tablePath: String => String,
              io: TableIO): CdcTable = {
    val stmt = parse(sql)
    executeDdl(spark, stmt, tablePath, io).getOrElse(
      executeOn(spark, stmt, CdcTable.open(spark, tablePath(stmt.target), io),
        vectoredDeletes = false))
  }

  private def executeOn(spark: SparkSession, stmt: Stmt, table: CdcTable,
                        vectoredDeletes: Boolean): CdcTable = {
    stmt match {
      case Update(_, set, where) =>
        table.update(where.map(expr).getOrElse(lit(true)),
          set.map { case (c, e) => c -> expr(e) }.toMap)
      case Delete(_, where) =>
        val cond = where.map(expr).getOrElse(lit(true))
        if (vectoredDeletes) table.deleteVectored(cond) else table.delete(cond)
      case Optimize(_, zcols, months) =>
        if (months.nonEmpty) table.compactMonths(months.toSet, zorderBy = zcols)
        else if (zcols.isEmpty) table.compact()
        else table.compact(zorderBy = zcols)
      case Vacuum(_) => table.expire()
      case Maintain(_) => table.maintain(): Unit
      case Restore(_, v) => table.restore(v)
      case RestoreTs(_, ms) => table.restore(table.versionAtTimestamp(ms))
      case CreateBranch(_, b) => table.createBranch(b): Unit
      case PublishBranch(_, b) => table.publish(b)
      case DropBranch(_, b) => table.dropBranch(b)
      case _: ShowBranches | _: ShowTables =>
        throw new IllegalArgumentException(
          "SHOW BRANCHES / SHOW TABLES are reads — run them through Dml.query")
      case _: CreateTableAs | _: DropTable =>
        throw new IllegalStateException("unreachable: dispatched by executeDdl")
      case _: TableAsOf | _: TableAsOfTs | _: DescribeFiles | _: DescribeTable |
           _: AnalyzeTable | _: CountStar | _: ShowPartitions =>
        throw new IllegalArgumentException(
          "TABLE ... VERSION|TIMESTAMP AS OF / DESCRIBE FILES|TABLE / ANALYZE TABLE / " +
            "COUNT(*) / SHOW PARTITIONS are reads — run them through Dml.query")
      case Insert(_, cols, values, select) =>
        val incoming = (values, select) match {
          case (Some(tuples), _) =>
            // VALUES tuples become a Spark inline table — Spark's own
            // parser evaluates the row expressions, same policy as expr()
            val named =
              if (cols.nonEmpty) cols
              else {
                require(table.currentVersion.isDefined,
                  "INSERT without a column list needs an existing table to name the columns")
                table.read.columns.toSeq
              }
            spark.sql(s"SELECT * FROM VALUES $tuples AS __ins(${named.mkString(", ")})")
          case (None, Some(q)) =>
            val df = spark.sql(q)
            if (cols.isEmpty) df
            else {
              require(df.columns.length == cols.length,
                s"INSERT column list has ${cols.length} names but SELECT emits ${df.columns.length} columns")
              df.toDF(cols: _*)
            }
          case _ => throw new IllegalStateException("unreachable: parse() sets exactly one source")
        }
        // SQL INSERT semantics against the stored schema: unknown columns
        // reject loudly, missing columns null-fill, present columns
        // coerce to the stored type (a literal 2 must land as the
        // table's BIGINT, not write an int32 parquet column beside it)
        val aligned = table.currentVersion match {
          case None => incoming
          case Some(_) =>
            val schema = table.read.schema
            val have = incoming.columns.toSet
            val unknown = have -- schema.map(_.name).toSet
            require(unknown.isEmpty, s"INSERT columns not in table: ${unknown.mkString(", ")}")
            incoming.select(schema.map(f =>
              (if (have(f.name)) col(f.name) else lit(null))
                .cast(f.dataType).as(f.name)).toIndexedSeq: _*)
        }
        table.append(aligned)
      case DescribeHistory(_) =>
        throw new IllegalArgumentException(
          "DESCRIBE HISTORY is a read statement — run it through Dml.query")
    }
    table
  }

  /** Read-side statement face: `DESCRIBE HISTORY <t>` returns the
    * table's commit log ([[CdcTable.history]] — one row per retained
    * version, newest first: version, operation, ts_millis, num_files).
    */
  def query(spark: SparkSession, sql: String, tablePath: String => String,
            keys: Seq[String], partitionSource: Option[String])
      : org.apache.spark.sql.DataFrame =
    queryOn(spark, parse(sql), tablePath,
      t => new CdcTable(spark, tablePath(t), keys, partitionSource))

  /** Keyed read route without a partition source. */
  def query(spark: SparkSession, sql: String, tablePath: String => String,
            keys: Seq[String]): org.apache.spark.sql.DataFrame =
    query(spark, sql, tablePath, keys, None)

  /** Self-describing read route — see the keyless [[execute]] overload. */
  def query(spark: SparkSession, sql: String, tablePath: String => String,
            io: TableIO = LocalTableIO)
      : org.apache.spark.sql.DataFrame =
    queryOn(spark, parse(sql), tablePath,
      t => CdcTable.open(spark, tablePath(t), io), io)

  private def queryOn(spark: SparkSession, stmt: Stmt, tablePath: String => String,
                      open: String => CdcTable, io: TableIO = LocalTableIO)
      : org.apache.spark.sql.DataFrame = stmt match {
    case ShowTables() =>
      // the router's root is the parent of the empty table name — one
      // listing, one pointer check per child; committed tables only.
      // Listing and pointer checks go through the caller's TableIO so a
      // non-local root (object store) enumerates correctly.
      val root = new java.io.File(tablePath("")).getPath
      val names = io.list(root)
        .filter(_.isDir)
        .map(_.name)
        .filter(n => io.exists(
          new java.io.File(new java.io.File(root, n), CdcTable.CurrentPointer).getPath))
        .sorted
      val sq = spark
      import sq.implicits._
      names.map { n =>
        (n, new CdcTable(spark, new java.io.File(root, n).getPath, Nil, io = io)
          .currentVersion.getOrElse(0L))
      }.toDF("table", "version")
    case DescribeHistory(target) => open(target).history
    case TableAsOf(target, v) => open(target).readVersion(v)
    case TableAsOfTs(target, ms) => open(target).readAtTimestamp(ms)
    case DescribeFiles(target) => open(target).filesInfo
    case DescribeTable(target) => open(target).describe
    case AnalyzeTable(target) => open(target).analyze()
    case ShowPartitions(target) => open(target).partitions
    case ShowBranches(target) =>
      val sq = spark
      import sq.implicits._
      open(target).branchInfo.toDF("branch", "forked_at", "head_version")
    case CountStar(target, where) =>
      val table = open(target)
      val n = where match {
        case None => table.countWhere(Nil) // pure metadata
        case Some(w) =>
          val cond = expr(w)
          FileSkipping.predsOfExact(cond) match {
            case Some(preds) => table.countWhere(preds) // metadata + boundary scans
            case None        => table.read.filter(cond).count() // not exactly skip-expressible
          }
      }
      spark.range(1).select(lit(n).as("count"))
    case other =>
      throw new IllegalArgumentException(
        s"${other.getClass.getSimpleName} mutates the table — run it through Dml.execute")
  }
}
