package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statement-level `MERGE INTO`: the SQL face of [[CdcMerge]]/[[CdcTable]].
  *
  * Plain Spark parses MERGE only against v2 catalog tables; the engine's
  * tables are parquet paths, so this wrapper accepts the exact statement
  * shape the reference generates (incremental_kafka_s3_cdc.py:243-292) and
  * dispatches it to the join-based merge plan, clause for clause:
  *
  *   - `WHEN MATCHED AND s.__op = 'd' THEN DELETE`
  *   - `WHEN MATCHED AND (s.__op = 'u' or s.__op = 'c' or s.__op = 'r')
  *     THEN UPDATE SET t.c=s.c, ...`
  *   - `WHEN NOT MATCHED AND NOT s.__op = 'd' THEN INSERT (...) VALUES (...)`
  *   - keyless fallback: `INSERT INTO t (...) VALUES (s. ...)` — a pure
  *     append, duplicates kept (incremental_kafka_s3_cdc.py:275-276, K3)
  *
  * The ON condition contributes the merge key: every `t.x = s.x` equality
  * conjunct (the reference always includes `__rds_id`/`__tenant_id`
  * alongside the table PK — a composite key here). A
  * `months(t.pc) = months(s.pc)` conjunct maps to the partitioned
  * [[CdcTable]] layout; its pruning intent is honored by the table's
  * touched-partition merge, which additionally covers the moved-row case
  * the raw conjunct would miss.
  *
  * Like the reference's `merge_to_table(df, ...)`, the caller passes the
  * source batch as a DataFrame; the statement's `USING (select * from X) s`
  * names the temp view the reference would have registered for it.
  */
object MergeInto {

  /** Parsed statement. `keys` empty means the keyless INSERT fallback. */
  final case class Stmt(
      target: String,
      keys: Seq[String],
      partitionColumn: Option[String],
      columns: Seq[String],
      /** `WHEN NOT MATCHED BY SOURCE THEN DELETE` present: target keys
        * absent from the source delete — the SQL:2023 snapshot-sync
        * clause ([[CdcTable.syncFrom]] semantics with the batch's own
        * `__op` rows kept).
        */
      bySourceDelete: Boolean = false)

  private val MergeRe =
    raw"(?is)^\s*MERGE\s+INTO\s+(\S+)\s+t\s+USING\s*\(\s*select\s+\*\s+from\s+(\S+)\s*\)\s+s\s+on\s+(.*?)\s*WHEN\s+MATCHED\s+AND\s+s\.__op\s*=\s*'d'\s+THEN\s+DELETE\s+WHEN\s+MATCHED\s+AND\s*\(\s*s\.__op\s*=\s*'u'\s+or\s+s\.__op\s*=\s*'c'\s+or\s+s\.__op\s*=\s*'r'\s*\)\s+THEN\s+UPDATE\s+SET\s+(.*?)\s+WHEN\s+NOT\s+MATCHED\s+AND\s+NOT\s+s\.__op\s*=\s*'d'\s+THEN\s+INSERT\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)(\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE)?\s*$$".r
  private val InsertRe =
    raw"(?is)^\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)\s*$$".r
  private val EqRe = raw"(?i)t\.(\w+)\s*=\s*s\.(\w+)".r
  private val FnEqRe = raw"(?i)(\w+)\(\s*t\.(\w+)\s*\)\s*=\s*(\w+)\(\s*s\.(\w+)\s*\)".r

  /** Parse one supported statement; throws `IllegalArgumentException` on
    * anything outside the reference's clause grammar (better a loud reject
    * than silently merging with different semantics).
    */
  def parse(sql: String): Stmt = sql match {
    case MergeRe(target, _, on, setList, insCols, insVals, bySource) =>
      var keys = Vector.empty[String]
      var part: Option[String] = None
      on.split("(?i)\\s+and\\s+").map(_.trim).filter(_.nonEmpty).foreach {
        case FnEqRe(f1, c1, f2, c2) =>
          require(f1.equalsIgnoreCase(f2) && c1.equalsIgnoreCase(c2),
            s"asymmetric partition conjunct: $f1($c1) = $f2($c2)")
          require(f1.equalsIgnoreCase("months"),
            s"unsupported partition transform: $f1 (only months)")
          part = Some(c1)
        case EqRe(c1, c2) =>
          require(c1.equalsIgnoreCase(c2), s"asymmetric key conjunct: t.$c1 = s.$c2")
          keys :+= c1
        case other =>
          throw new IllegalArgumentException(s"unsupported ON conjunct: $other")
      }
      require(keys.nonEmpty, "MERGE requires at least one t.x = s.x key conjunct")
      val updated = setList.split(",").map(_.trim).map {
        case EqRe(c1, c2) if c1.equalsIgnoreCase(c2) => c1
        case other => throw new IllegalArgumentException(s"unsupported SET item: $other")
      }.toSeq
      val inserted = insCols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val insertVals = insVals.split(",").map(_.trim.stripPrefix("s.")).toSeq
      require(inserted == insertVals,
        s"INSERT columns $inserted do not match VALUES $insertVals")
      require(updated.sorted == inserted.sorted,
        s"UPDATE SET columns $updated do not match INSERT columns $inserted")
      Stmt(target, keys, part, inserted, bySourceDelete = bySource != null)
    case InsertRe(target, cols, vals) =>
      val columns = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val values = vals.split(",").map(_.trim.stripPrefix("s.")).toSeq
      require(columns == values, s"INSERT columns $columns do not match VALUES $values")
      Stmt(target, Nil, None, columns)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported statement (expected the reference MERGE INTO / INSERT INTO shape)")
  }

  /** Execute `sql` applying `source` to the parquet table at
    * `tablePath(targetName)`. `tsCol` orders the latest-wins dedup the
    * merge applies first (the reference dedupes on `__ts_ms` upstream;
    * re-deduping an already-unique batch is a no-op).
    */
  def execute(spark: SparkSession, sql: String, source: DataFrame,
              tablePath: String => String, tsCol: String = "__ts_ms"): CdcTable = {
    val stmt = parse(sql)
    val batch = source.select(
      (stmt.columns.map(org.apache.spark.sql.functions.col) ++
        (if (stmt.keys.nonEmpty && !stmt.columns.contains(CdcMerge.OpColumn))
           Seq(org.apache.spark.sql.functions.col(CdcMerge.OpColumn))
         else Nil)): _*)
    val table = new CdcTable(spark, tablePath(stmt.target), stmt.keys, stmt.partitionColumn)
    if (stmt.keys.isEmpty) table.append(batch)
    else if (stmt.bySourceDelete && table.currentVersion.isDefined) {
      // BY SOURCE deletes: target keys the batch lacks ride along as
      // delete rows (their CURRENT rows, so pre-images are real) — one
      // anti-join, then the ordinary merge plan
      import org.apache.spark.sql.functions.{col, lit}
      val gone = table.read
        .join(batch.select(stmt.keys.map(col): _*).distinct(), stmt.keys, "left_anti")
        .withColumn(CdcMerge.OpColumn, lit("d"))
      table.merge(batch.unionByName(gone, allowMissingColumns = true), tsCol)
    } else table.merge(batch, tsCol)
    table
  }
}
