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
final class GraftSession(val spark: SparkSession, val root: String,
                         val io: graft.ops.TableIO = graft.ops.LocalTableIO) {

  private val path = (n: String) => s"$root/$n"

  /** Run any engine statement. Reads (DESCRIBE HISTORY/FILES, SHOW
    * PARTITIONS/BRANCHES/TABLES, TABLE ... AS OF, SELECT COUNT(*))
    * return their rows; writes (UPDATE/DELETE/INSERT/CTAS/DROP/
    * OPTIMIZE/VACUUM/RESTORE/branch DDL) execute against the versioned
    * tables and return an empty frame. `MERGE INTO` and the
    * batch-INSERT form need the micro-batch — use the two-argument
    * overload.
    */
  def sql(statement: String): DataFrame = statement match {
    // session-level statements (savepoints pin EVERY table, transaction
    // recovery spans tables) resolve here; table statements route to Dml
    case CreateSpRe(n)  => savepoint(n); spark.emptyDataFrame
    case DropSpRe(n)    => dropSavepoint(n); spark.emptyDataFrame
    case RestoreSpRe(n) => restoreAll(n); spark.emptyDataFrame
    case ShowSpRe() =>
      import spark.implicits._
      savepoints.map(n => (n, savepointEntries(n).size.toLong))
        .toDF("savepoint", "n_tables")
    case ShowTxRe() =>
      import spark.implicits._
      pendingTransactions.map(id =>
        (id, io.readLines(txFile(id).getPath).count(_.nonEmpty).toLong))
        .toDF("transaction", "n_tables")
    case RecoverTxRe() =>
      import spark.implicits._
      recoverTransactions().toDF("recovered")
    case _ if isRead(statement) => Dml.query(spark, statement, path, io)
    case _ =>
      Dml.execute(spark, statement, path, io): Unit
      spark.emptyDataFrame
  }

  private val CreateSpRe = "(?is)^\\s*CREATE\\s+SAVEPOINT\\s+(\\S+)\\s*$".r
  private val DropSpRe = "(?is)^\\s*DROP\\s+SAVEPOINT\\s+(\\S+)\\s*$".r
  private val RestoreSpRe = "(?is)^\\s*RESTORE\\s+SAVEPOINT\\s+(\\S+)\\s*$".r
  private val ShowSpRe = "(?is)^\\s*SHOW\\s+SAVEPOINTS\\s*$".r
  private val ShowTxRe = "(?is)^\\s*SHOW\\s+TRANSACTIONS\\s*$".r
  private val RecoverTxRe = "(?is)^\\s*RECOVER\\s+TRANSACTIONS\\s*$".r

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
  def table(name: String): CdcTable = CdcTable.open(spark, path(name), io)

  /** Current rows of a committed table. */
  def read(name: String): DataFrame = table(name).read

  // ------------------------------------------------- cross-table savepoints

  private def savepointsDir = new java.io.File(root, "_savepoints")
  private def savepointFile(name: String) = new java.io.File(savepointsDir, name)

  /** Names of committed tables under the root (SHOW TABLES) — listed
    * through this session's [[graft.ops.TableIO]], so a non-local root
    * (object store) enumerates correctly.
    */
  def tableNames: Seq[String] =
    io.list(root).filter(_.isDir).map(_.name)
      .filter(n => io.exists(
        new java.io.File(new java.io.File(root, n), CdcTable.CurrentPointer).getPath))
      .sorted

  /** Record every committed table's CURRENT version under one name — the
    * dataset-pinning primitive for reproducible runs ("train run 417
    * used exactly THIS state of docs + embeddings + stats"). Each table
    * stays independently versioned; the savepoint is one tiny manifest
    * of (table, version) pairs, readable via [[readAt]] and rewindable
    * via [[restoreAll]]. Taken between write batches it is a consistent
    * cross-table cut; taken mid-write it pins whatever each pointer
    * showed (document your write schedule, not this call).
    *
    * Retention caveat (deliberate): a savepoint pins versions
    * LOGICALLY; each table's `retainVersions` must cover it or reads
    * degrade to a loud [[CdcTable.ExpiredVersionException]] — never a
    * silently different dataset.
    */
  def savepoint(name: String): Unit = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"), s"savepoint name: $name")
    require(!io.exists(savepointFile(name).getPath),
      s"savepoint $name already exists (savepoints are immutable — pick a new name)")
    val entries = tableNames.map { n =>
      s"$n\t${table(n).currentVersion.get}"
    }
    require(entries.nonEmpty, s"no committed tables under $root to pin")
    io.mkdirs(savepointsDir.getPath)
    io.writeAtomic(savepointFile(name).getPath, entries.mkString("\n"))
  }

  /** Existing savepoint names, sorted. */
  def savepoints: Seq[String] =
    if (!io.exists(savepointsDir.getPath)) Nil
    else io.list(savepointsDir.getPath).filterNot(_.isDir).map(_.name).sorted

  private def savepointEntries(name: String): Seq[(String, Long)] = {
    require(io.exists(savepointFile(name).getPath),
      s"no savepoint $name (have: ${savepoints.mkString(", ")})")
    io.readLines(savepointFile(name).getPath).map { l =>
      val i = l.indexOf('\t')
      (l.substring(0, i), l.substring(i + 1).toLong)
    }
  }

  /** A table's rows exactly as pinned by the savepoint. */
  def readAt(savepointName: String, tableName: String): DataFrame = {
    val v = savepointEntries(savepointName).toMap.getOrElse(tableName,
      throw new IllegalArgumentException(
        s"savepoint $savepointName does not pin table $tableName"))
    table(tableName).readVersion(v)
  }

  /** Rewind EVERY pinned table to its savepoint version (one RESTORE
    * commit per table — history moves forward, the bad states stay
    * inspectable). Tables created after the savepoint are untouched.
    */
  def restoreAll(savepointName: String): Unit =
    savepointEntries(savepointName).foreach { case (n, v) =>
      if (table(n).currentVersion.contains(v)) () // already there: no version burned
      else table(n).restore(v)
    }

  /** Delete a savepoint manifest (the pinned versions expire on their
    * tables' own retention schedule).
    */
  def dropSavepoint(name: String): Unit =
    io.deleteRecursively(savepointFile(name).getPath)

  // ------------------------------------------- cross-table transactions

  private def txDir = new java.io.File(root, "_transactions")
  private def txFile(id: String) = new java.io.File(txDir, id)
  private val txCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** All-or-nothing writes across MULTIPLE tables — "orders and lineitem
    * land together or not at all", the cross-table guarantee single-table
    * branches can't give. `body` receives a staged [[CdcTable]] handle
    * per name (a private write-audit-publish branch: every operator
    * works, nothing is visible to readers), and the commit protocol is
    * the classic coordinator-log two-phase shape on this layout's
    * primitives:
    *
    *  1. STAGE — `body` writes to per-table branches (metadata-cheap
    *     forks; any exception drops them all, no table changes).
    *  2. PREPARE — a coordinator manifest (`_transactions/<id>`) records
    *     the participant tables BEFORE any pointer moves; from here a
    *     crash rolls FORWARD, not back.
    *  3. VALIDATE — every table's fast-forward precondition (parent
    *     still at the fork version) checks before ANY publish: a
    *     concurrent writer on any participant aborts the whole
    *     transaction with nothing published.
    *  4. COMMIT — branches publish in argument order (each an atomic
    *     pointer flip); the manifest deletes last. A crash or conflict
    *     mid-commit leaves the manifest, and [[recoverTransactions]]
    *     completes the remaining publishes — the transaction is then
    *     atomic-in-outcome, though a reader racing the commit window can
    *     observe table i published while table j isn't yet (this layout
    *     has per-table pointers, not a global one; the manifest is what
    *     makes the window recoverable rather than lost).
    *
    * At 100 TB the whole protocol is metadata: branches hard-link data
    * files, validation reads pointers, publish flips them.
    */
  def transaction[T](names: Seq[String])(body: Map[String, CdcTable] => T): T = {
    require(names.nonEmpty, "transaction needs at least one table")
    require(names.distinct == names, s"duplicate tables in ${names.mkString(", ")}")
    val id = s"tx-${System.currentTimeMillis}-${txCounter.incrementAndGet()}"
    val tables = names.map(n => n -> table(n))
    def abortAll(): Unit = tables.foreach { case (_, t) =>
      try t.dropBranch(id) catch { case _: Exception => () }
    }
    val staged = tables.map { case (n, t) => n -> t.createBranch(id) }.toMap
    // STAGE
    val result =
      try body(staged)
      catch { case e: Throwable => abortAll(); throw e }
    // PREPARE — record each participant's PRE-transaction version beside
    // its name, so [[abortTransaction]] can later restore exactly the
    // states this transaction displaced and nothing else
    io.mkdirs(txDir.getPath)
    io.writeAtomic(txFile(id).getPath, tables.map { case (n, t) =>
      val forkV = t.branchInfo.collectFirst { case (`id`, f, _) => f }.getOrElse(-1L)
      s"$n\t$forkV"
    }.mkString("\n"))
    // VALIDATE (before any pointer moves: an abort here publishes nothing)
    try tables.foreach { case (n, t) =>
      val forkedAt = t.branchInfo.collectFirst { case (`id`, f, _) => f }
        .getOrElse(throw new IllegalStateException(s"staged branch $id vanished on $n"))
      val cur = t.currentVersion.getOrElse(-1L)
      if (cur != forkedAt)
        throw new CdcTable.PublishConflictException(
          s"transaction $id: $n moved v$forkedAt -> v$cur since staging — " +
            "nothing published; re-run the transaction against the new state")
    } catch { case e: Throwable =>
      abortAll()
      io.deleteRecursively(txFile(id).getPath)
      throw e
    }
    // COMMIT — failures past this point roll FORWARD via the manifest
    try {
      tables.foreach { case (_, t) => t.publish(id) }
      io.deleteRecursively(txFile(id).getPath)
    } catch {
      case e: Throwable =>
        throw new IllegalStateException(
          s"transaction $id interrupted mid-commit — the coordinator manifest " +
            s"remains; run recoverTransactions() to complete it (with rebaseTsCol " +
            s"if a concurrent commit landed), or abortTransaction(\"$id\") to roll back", e)
    }
    result
  }

  /** Transactions whose coordinator manifest survived a crash or
    * mid-commit failure — each needs [[recoverTransactions]].
    */
  def pendingTransactions: Seq[String] =
    if (!io.exists(txDir.getPath)) Nil
    else io.list(txDir.getPath).filterNot(_.isDir).map(_.name).sorted

  /** Participant `(name, pre-transaction version)` rows of a pending
    * transaction's coordinator manifest (version -1 when the manifest
    * predates fork-version recording).
    */
  private def txParticipants(id: String): Seq[(String, Long)] =
    io.readLines(txFile(id).getPath).filter(_.nonEmpty).map(_.split('\t') match {
      case Array(n, v) => (n, v.toLong)
      case Array(n)    => (n, -1L)
    })

  /** Roll every pending transaction FORWARD: publish the participant
    * branches that haven't published yet (already-published ones are
    * gone — skipped), then clear the manifest. Returns the completed
    * ids.
    *
    * A participant whose parent moved since the crash (a concurrent
    * commit landed between VALIDATE and the crashed COMMIT) no longer
    * fast-forwards. With `rebaseTsCol` set, its staged DELTA replays
    * onto the moved parent through [[CdcTable.publishRebased]] — the
    * concurrent commit survives, the staged keys land, and the
    * transaction still completes (the only resolution that loses
    * neither writer). Without it, the conflict surfaces as
    * [[CdcTable.PublishConflictException]] — the manifest and remaining
    * branches stay for inspection (nothing silently dropped); resolve
    * by re-running with `rebaseTsCol`, or roll the whole transaction
    * back with [[abortTransaction]].
    */
  def recoverTransactions(rebaseTsCol: Option[String] = None): Seq[String] =
    pendingTransactions.map { id =>
      txParticipants(id).foreach { case (n, _) =>
        val t = table(n)
        if (t.branches.contains(id)) rebaseTsCol match {
          case Some(ts) =>
            try t.publish(id)
            catch { case _: CdcTable.PublishConflictException =>
              t.publishRebased(id, ts) }
          case None => t.publish(id)
        }
      }
      io.deleteRecursively(txFile(id).getPath)
      id
    }

  /** Roll a pending transaction BACK: drop the participants' staged
    * branches and RESTORE every already-published participant to its
    * recorded pre-transaction version — the explicit abort for a
    * half-published crash window when replaying forward is not wanted.
    *
    * Refuses (nothing touched on that table) when a participant's head
    * is not THIS transaction's own publish commit — i.e. a concurrent
    * writer committed after the publish; restoring would wipe their
    * commit. The attribution check is exact: a fast-forward publish
    * tags its commit with the branch id ([[CdcTable.PublishedBranchTag]]).
    * Such a participant needs [[recoverTransactions]] with `rebaseTsCol`
    * instead.
    */
  def abortTransaction(id: String): Unit = {
    require(pendingTransactions.contains(id),
      s"no pending transaction $id (have: ${pendingTransactions.mkString(", ")})")
    val parts = txParticipants(id)
    // validate EVERY restore target before touching ANY table: an abort
    // must not itself half-apply. Record the head version each check
    // validated — the restore below is CAS-fenced on it, so a commit
    // landing BETWEEN this loop and the restore throws instead of being
    // silently replaced (the validate-then-restore race).
    val validatedHead = parts.flatMap { case (n, forkV) =>
      val t = table(n)
      // branch still staged: nothing to validate, but record the head
      // anyway — if a CONCURRENT abort of this same tx drops the branch
      // between this loop and the apply loop, the fall-through restore
      // below must still be CAS-fenced on a head we actually observed
      // (an unfenced restore reopens the validate-then-restore race)
      if (t.branches.contains(id)) Some(n -> t.currentVersion.getOrElse(-1L))
      else {
        val cur = t.currentVersion.getOrElse(-1L)
        require(forkV >= 0L,
          s"abort $id: manifest records no pre-transaction version for $n")
        if (cur != forkV)
          require(t.commitTags(cur).get(CdcTable.PublishedBranchTag).contains(id),
            s"abort $id: $n's head v$cur is not this transaction's publish — " +
              "a later commit would be lost; recover forward with rebaseTsCol instead")
        Some(n -> cur)
      }
    }.toMap
    parts.foreach { case (n, forkV) =>
      val t = table(n)
      if (t.branches.contains(id)) t.dropBranch(id)
      else if (!t.currentVersion.contains(forkV))
        t.restore(forkV, ifHeadIs = validatedHead.get(n))
    }
    io.deleteRecursively(txFile(id).getPath)
  }

  private def isRead(statement: String): Boolean = Dml.parse(statement) match {
    case _: Dml.DescribeHistory | _: Dml.TableAsOf | _: Dml.TableAsOfTs |
         _: Dml.ShowPartitions | _: Dml.ShowBranches | _: Dml.ShowTables |
         _: Dml.CountStar | _: Dml.DescribeFiles | _: Dml.DescribeTable |
         _: Dml.AnalyzeTable => true
    case _ => false
  }
}
