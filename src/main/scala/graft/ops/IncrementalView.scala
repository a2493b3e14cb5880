package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view refresh from a change data feed: keep a
  * grouped aggregate of a [[CdcTable]] current by applying the CDF delta
  * between two versions ([[CdcTable.changesBetween]]) instead of
  * recomputing from the full table.
  *
  * Maintained aggregates, per group:
  *
  *   - '''count''' (`n_rows`) and '''sum''' (one column per `sumCols`
  *     entry): algebraic with signed contributions — an insert or
  *     update-postimage adds a row's values, a delete or update-preimage
  *     subtracts them — so the refresh is EXACTLY the recompute.
  *   - '''avg''' (`avg_<c>` per sumCol): derived from the maintained sum
  *     and a maintained NON-NULL count (`__nn_<c>`) — SQL avg divides by
  *     the non-null count, not the row count, so the non-null count is
  *     maintained by the same signed-delta rule and avg is recomputed
  *     from the two maintained values after every refresh.
  *   - '''min/max''' (`min_<e>`/`max_<e>` per `extCols` entry): NOT
  *     algebraic under deletes — inserts tighten an extremum with
  *     `least`/`greatest`, but deleting the current extremum leaves its
  *     new value unknowable from the delta alone. The refresh detects
  *     exactly those groups from the feed (a removed value at or beyond
  *     the group's current extremum) and recomputes ONLY them from the
  *     target-version table, a semi-join bounded by the dirty-group
  *     count. At 100 TB the common case (no extremum deleted) stays
  *     delta-sized; the worst case (every group's extremum deleted)
  *     degrades to the recompute it must equal anyway.
  */
object IncrementalView {

  val CountCol = "n_rows"

  /** Largest dirty-group key set pushed down as file-skipping predicates
    * on the target-version recompute scan; past the cap the scan falls
    * back to unpruned (an IN that large prunes little and costs per-file
    * x per-value driver work — same rationale as [[JoinView.MaxPruneKeys]]).
    */
  val MaxPruneKeys = 4096

  /** NULL-SAFE per-column pruning predicates from collected group-key
    * rows: unlike an equi-join key set ([[JoinView]]), a null group key
    * names a LEGITIMATE group (groupBy folds all nulls into one), so a
    * column whose collected values include null must keep the files
    * holding its null rows — `InSet OR IS NULL`, expressed through the
    * existing [[FileSkipping.AnyOf]] algebra. Columns stay conjunctive:
    * a row of any dirty group matches every column's own value-or-null
    * set.
    */
  private[ops] def groupKeyPreds(cols: Seq[String],
                            rows: Array[org.apache.spark.sql.Row]): Seq[FileSkipping.Pred] =
    cols.zipWithIndex.map { case (c, i) =>
      val (nulls, vs) = rows.map(_.get(i)).partition(_ == null)
      (vs.distinct.toSeq, nulls.nonEmpty) match {
        case (v, false)          => FileSkipping.InSet(c, v)
        case (Nil, true)         => FileSkipping.IsNull(c)
        case (v, true)           =>
          FileSkipping.AnyOf(Seq(Seq(FileSkipping.InSet(c, v)), Seq(FileSkipping.IsNull(c))))
      }
    }

  private def nn(c: String) = s"__nn_$c"
  private def avgc(c: String) = s"avg_$c"

  // avg from the two maintained columns; null when no non-null values
  // remain (SQL avg-over-empty), identical expression in compute and
  // refresh so the equality proof is by construction
  private def avgExpr(c: String) =
    when(col(nn(c)) > 0, col(c).cast("double") / col(nn(c))).as(avgc(c))

  /** The full (bootstrap) computation: per-`groupCols` row count, sums
    * and avgs of `sumCols`, min/max of `extCols`. The refreshed
    * aggregate always equals this run over the corresponding version.
    * Sum convention: null values contribute nothing and an all-null
    * group sums to 0 (not null) — the convention that makes signed
    * delta application exact; avg instead follows SQL (null for an
    * all-null group) via the non-null count.
    */
  def compute(table: DataFrame, groupCols: Seq[String], sumCols: Seq[String],
              extCols: Seq[String] = Nil): DataFrame = {
    val aggs =
      sumCols.map(c => coalesce(sum(col(c)), lit(0)).as(c)) ++
        sumCols.map(c => count(col(c)).as(nn(c))) ++
        extCols.flatMap(e => Seq(min(col(e)).as(s"min_$e"), max(col(e)).as(s"max_$e")))
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(CountCol), aggs: _*)
      .select(col("*") +: sumCols.map(avgExpr): _*)
  }

  /** Apply the change feed `changes` (the [[CdcTable.changesBetween]]
    * output covering exactly the versions between the aggregate's
    * snapshot and the target) to `agg`. Groups whose row count reaches
    * zero vanish, like a recompute would drop them. `tableAt` — the
    * table AT THE TARGET VERSION — is required when `extCols` is
    * non-empty: it serves the group-local recomputes for extrema
    * invalidated by deletes. (Unpruned face: the plain DataFrame cannot
    * skip files; the scan is still semi-join-restricted to the dirty
    * groups and skipped entirely when none are dirty.)
    */
  def refresh(agg: DataFrame, changes: DataFrame,
              groupCols: Seq[String], sumCols: Seq[String],
              extCols: Seq[String] = Nil, tableAt: DataFrame = null): DataFrame =
    refresh(agg, changes, groupCols, sumCols, extCols,
      if (tableAt == null) null
      else (_: Seq[FileSkipping.Pred]) => tableAt)

  /** [[refresh]] with a PRUNED target-version scan: `tableFor` produces
    * the target-version table restricted by file-skipping predicates
    * (typically `t.readWhereAt(target, preds)`). The preds pushed are
    * the dirty groups' own key values (capped at [[MaxPruneKeys]], null
    * group keys handled null-safely), so on a table clustered on the
    * group columns the delete-invalidated-extremum recompute opens only
    * the files the dirty groups can live in — and when NO group is
    * dirty, `tableFor` is never called and the refresh touches no table
    * file at all. At 100 TB these are THE recurring maintenance scans:
    * a refresh whose deletes touch 2 groups must not open all 84 months.
    */
  def refresh(agg: DataFrame, changes: DataFrame,
              groupCols: Seq[String], sumCols: Seq[String],
              extCols: Seq[String],
              tableFor: Seq[FileSkipping.Pred] => DataFrame): DataFrame = {
    require(extCols.isEmpty || tableFor != null,
      "min/max maintenance needs the target-version table for delete-invalidated groups")
    val sign = when(
      col(CdcTable.ChangeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val added = col("__sign") === 1L
    val deltaAggs =
      sumCols.map(c => sum(col(c) * col("__sign")).as(s"__d_$c")) ++
        sumCols.map(c => sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L))).as(s"__dnn_$c")) ++
        extCols.flatMap(e => Seq(
          min(when(added, col(e))).as(s"__insmin_$e"),
          max(when(added, col(e))).as(s"__insmax_$e"),
          min(when(!added, col(e))).as(s"__delmin_$e"),
          max(when(!added, col(e))).as(s"__delmax_$e")))
    val delta = changes.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"), deltaAggs: _*)

    // null-safe join: a null group KEY is a legitimate group (compute's
    // groupBy treats all nulls as one group), so the join must match on
    // <=>, not =, or null-keyed groups double up instead of merging
    val a = agg.alias("a")
    val d = delta.alias("d")
    val joinCond = groupCols.map(k => col(s"a.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = a.join(d, joinCond, "full_outer")

    // a delete at or beyond the stored extremum means the new extremum is
    // not derivable from the delta — that group recomputes from the table.
    // Null-valued deletes never invalidate (min/max ignore nulls), and a
    // group absent from one side yields a null comparison = not dirty.
    val dirty = extCols
      .flatMap(e => Seq(
        col(s"d.__delmin_$e") <= col(s"a.min_$e"),
        col(s"d.__delmax_$e") >= col(s"a.max_$e")))
      .reduceOption(_ || _).map(c => coalesce(c, lit(false))).getOrElse(lit(false))

    val refreshed = joined.select(
      (groupCols.map(k => coalesce(col(s"a.$k"), col(s"d.$k")).as(k)) :+
        (coalesce(col(s"a.$CountCol"), lit(0L)) + coalesce(col("d.__dn"), lit(0L))).as(CountCol)) ++
        sumCols.flatMap { c =>
          // a side absent for this group contributes 0, matching the
          // null-sums-to-0 convention of compute()
          Seq((coalesce(col(s"a.$c"), lit(0)) + coalesce(col(s"d.__d_$c"), lit(0))).as(c),
            (coalesce(col(s"a.${nn(c)}"), lit(0L)) + coalesce(col(s"d.__dnn_$c"), lit(0L))).as(nn(c)))
        } ++
        extCols.flatMap(e => Seq(
          least(col(s"a.min_$e"), col(s"d.__insmin_$e")).as(s"min_$e"),
          greatest(col(s"a.max_$e"), col(s"d.__insmax_$e")).as(s"max_$e"))) :+
        dirty.as("__dirty"): _*)
      .filter(col(CountCol) > 0)
      .select(col("*") +: sumCols.map(avgExpr): _*)

    if (extCols.isEmpty) refreshed.drop("__dirty")
    else {
      // the clean/dirty split consumes `refreshed` twice (clean rows and
      // dirty keys) in the one downstream action — materialize the joined
      // aggregate once (it is group-cardinality-sized, not table-sized)
      // instead of re-running the join + dirty evaluation per branch
      val split = refreshed.localCheckpoint()
      val clean = split.filter(!col("__dirty")).drop("__dirty")
      val dirtyKeys = split.filter(col("__dirty")).select(groupCols.map(col): _*)
      // the dirty keys drive the pruning predicates — delta-bounded by
      // group cardinality, collected with the cap (past it, the scan
      // stays semi-join-restricted but unpruned)
      val keyRows = dirtyKeys.limit(MaxPruneKeys + 1).collect()
      if (keyRows.isEmpty) clean // no invalidated extrema: ZERO table scan
      else {
        val preds =
          if (keyRows.length <= MaxPruneKeys) groupKeyPreds(groupCols, keyRows)
          else Nil
        val semiCond = groupCols.map(k => col(s"t.$k") <=> col(s"k.$k")).reduce(_ && _)
        val recomputed = compute(
          tableFor(preds).alias("t").join(dirtyKeys.alias("k"), semiCond, "left_semi"),
          groupCols, sumCols, extCols)
        clean.unionByName(recomputed)
      }
    }
  }
}
