package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an equi-JOIN materialized view — the
  * missing piece between [[IncrementalView]] (aggregates of ONE table)
  * and what a real pipeline materializes: an enriched fact stream,
  * `fact JOIN dim`, kept current as BOTH sides merge. The reference
  * materializes such enrichments by full recompute per batch
  * (sanpshot_script.py rebuilds its joined exports end-to-end); here
  * each refresh recomputes ONLY the view rows the change feeds could
  * have touched:
  *
  *  1. affected fact keys = keys in the fact feed, plus facts whose
  *     foreign key hits a changed dimension key;
  *  2. their true end-state rows = the plain join of those facts (at
  *     the window end) against the dimension window-end snapshot;
  *  3. affected keys with no end-state row net to deletes.
  *
  * Because step 2 IS the recompute restricted to the affected keys, the
  * refreshed view provably equals the full recompute: a key outside the
  * affected set has an unchanged fact row whose partner's payload is
  * also unchanged. No signed-delta netting is involved, so cancelling
  * change pairs (a fact deleted in the same window its formerly-dangling
  * partner is inserted) cannot resurrect rows.
  *
  * Refresh cost, honestly stated: the change feeds are delta-sized
  * ([[CdcTable.changesBetween]] prunes to changed months), and each
  * table snapshot is scanned AT MOST ONCE per refresh, map-side — the
  * fact scan is a broadcast semi-join against the changed dimension
  * keys (collapsed entirely by AQE's empty-relation propagation when
  * the dimension window is empty), and the dimension scan is the step-2
  * join against the broadcast delta-bounded fact set. Nothing shuffles
  * at table size. At 100 TB that is one streaming pass over each
  * table's files per refresh window — the price of not keeping a
  * foreign-key index — against recompute's scan PLUS table-sized
  * shuffle and full view rewrite.
  *
  * Scope (the canonical fact-enrichment shape, and what makes the view
  * keyable): the join maps fact-side columns onto the DIMENSION TABLE'S
  * MERGE KEYS (`on` pairs `(factCol, dimKey)`), so every fact row has
  * at most one partner and the view is uniquely keyed by the fact
  * table's own merge keys (assumed non-null, as merge keys are). Fact
  * and dimension payload columns must not collide; the dimension's
  * join-key columns are dropped from the view (they duplicate the
  * fact's foreign key).
  *
  * The maintained view itself is a [[CdcTable]] keyed by the fact keys:
  * the refresh batch carries, per affected fact key, an upsert with the
  * current payload or a delete — applied through the same MERGE path
  * as any CDC batch, with all its pruning, versioning and time travel.
  */
object JoinView {

  /** Synthetic CDC-batch columns emitted by [[deltaBatch]]. */
  val OpCol = "__op"
  val TsCol = "__ts"

  /** Largest key set a snapshot pass turns into IN-list file-skipping
    * predicates ([[FileSkipping.InSet]]); a delta touching more keys
    * falls back to the plain full-version scan (an IN that large prunes
    * little and costs per-file x per-value work driver-side).
    */
  val MaxPruneKeys = 4096

  /** Per-column IN-list predicates from collected key rows: column `i`
    * of every row against `cols(i)`. Nulls drop — a null key can never
    * equi-join, so rows carrying one are unreachable by the lookup the
    * predicates bound. Columns whose values ALL dropped contribute
    * nothing (`InSet` requires members).
    */
  private def inSetPreds(cols: Seq[String],
                         rows: Array[org.apache.spark.sql.Row]): Seq[FileSkipping.Pred] =
    cols.zipWithIndex.flatMap { case (c, i) =>
      val vs = rows.map(_.get(i)).filter(_ != null).distinct.toSeq
      if (vs.isEmpty) None else Some(FileSkipping.InSet(c, vs))
    }

  private def cond(a: DataFrame, b: DataFrame, on: Seq[(String, String)]): Column =
    on.map { case (ac, bc) => a(ac) === b(bc) }.reduce(_ && _)

  /** The full (bootstrap) computation: inner equi-join, fact columns
    * plus the dimension's non-join columns. The refreshed view always
    * equals this run over the two tables at the refreshed-to versions.
    */
  def compute(fact: DataFrame, dim: DataFrame, on: Seq[(String, String)]): DataFrame = {
    val dimJoinCols = on.map(_._2).toSet
    val payload = dim.columns.filterNot(dimJoinCols.contains).toSeq
    val collide = payload.filter(fact.columns.contains)
    require(collide.isEmpty,
      s"fact and dimension payload columns must not collide: ${collide.mkString(", ")}")
    fact.join(dim, cond(fact, dim, on), "inner")
      .select(fact.columns.toSeq.map(fact(_)) ++ payload.map(dim(_)): _*)
  }

  /** The view delta for one refresh window, one CDC row per affected
    * fact key: `__op` = `u` (upsert carrying the current payload) or
    * `d` (delete), ready for the view table's `merge(batch, TsCol)`.
    *
    *  - `aChanges` / `bChanges`: `changesBetween` feeds of fact and
    *    dimension covering exactly the refresh window (either may be
    *    empty).
    *  - `aNew` / `bNew`: the FACT and DIMENSION tables at the window
    *    END.
    *
    * Affected keys are (fact-feed keys) ∪ (end-state facts whose
    * foreign key matches a changed dimension key); their end-state view
    * rows come from [[compute]] over exactly those facts, so the batch
    * is the restricted recompute — upserting an unchanged payload for a
    * key both feeds touched is possible and harmless (idempotent under
    * the view's keyed merge).
    */
  def deltaBatch(aChanges: DataFrame, aNew: DataFrame,
                 bChanges: DataFrame, bNew: DataFrame,
                 on: Seq[(String, String)], aKeys: Seq[String]): DataFrame =
    deltaBatch(aChanges, _ => aNew, bChanges, _ => bNew, on, aKeys)

  /** [[deltaBatch]] with PRUNED snapshot passes: `aNewFor`/`bNewFor`
    * produce the window-end fact/dimension snapshots restricted by
    * file-skipping predicates (typically `t.readWhereAt(toV, preds)`) —
    * the preds passed are derived from the delta itself, so on a table
    * clustered (or bloom-filtered) on the probed key columns each
    * "snapshot pass" opens only the files the delta's keys can live in.
    * The functions MUST return all rows matching the predicates (any
    * superset restriction of the full snapshot is what a pruned read
    * gives); called with Nil they must return the full snapshot. This is
    * what turns the two at-most-one-pass-per-snapshot scans into
    * few-files scans for the common small-delta refresh — at 100 TB the
    * difference between streaming the table per refresh window and
    * opening the handful of files the window touched.
    */
  def deltaBatch(aChanges: DataFrame, aNewFor: Seq[FileSkipping.Pred] => DataFrame,
                 bChanges: DataFrame, bNewFor: Seq[FileSkipping.Pred] => DataFrame,
                 on: Seq[(String, String)], aKeys: Seq[String]): DataFrame = {
    // the fact feed is used twice (post-images + touched keys) and is a
    // changed-months diff join to recompute — materialize it once
    val aCh = aChanges.localCheckpoint()
    // end-state images of facts the fact feed touched (insert/update);
    // deleted facts contribute their key to `touched` only
    val aPost = aCh.filter(col(CdcTable.ChangeTypeCol)
        .isin("insert", "update_postimage"))
      .drop(CdcTable.ChangeTypeCol)
    val aTouched = aCh.select(aKeys.map(col): _*).distinct()
    // the changed dimension keys drive BOTH the fk-hit probe and the
    // fact-snapshot pruning predicates — materialize once, collect with
    // a cap (delta-bounded; past the cap pruning stops paying anyway)
    val bKeyDf = bChanges.select(on.map(p => col(p._2)): _*).distinct().localCheckpoint()
    val bKeyRows = bKeyDf.limit(MaxPruneKeys + 1).collect()
    // facts (unchanged by the fact feed) whose fk hits a changed dim key:
    // AT MOST one map-side pass over the fact snapshot — file-skipped to
    // the changed keys' files when the key set is small, skipped entirely
    // when it is empty; the changed-key and touched-key sets broadcast.
    // Renamed probe columns keep the semi-join correlation-safe if fact
    // and dim share column names.
    val aNew =
      if (bKeyRows.isEmpty) aNewFor(Nil).filter(lit(false))
      else if (bKeyRows.length <= MaxPruneKeys)
        aNewFor(inSetPreds(on.map(_._1), bKeyRows))
      else aNewFor(Nil)
    val bKeyed = on.zipWithIndex.foldLeft(bKeyDf) {
      case (d, ((_, bc), i)) => d.withColumnRenamed(bc, s"__bk$i")
    }
    val hit = on.zipWithIndex.map { case ((ac, _), i) =>
      aNew(ac) === bKeyed(s"__bk$i")
    }.reduce(_ && _)
    val aDimHit = aNew.join(bKeyed, hit, "left_semi")
      .join(aTouched, aKeys, "left_anti")
      .localCheckpoint() // reused below; recomputing = a second fact scan
    // end-state fact rows for every affected key that still exists;
    // aPost carries the feed's (union) schema, aDimHit the end-version
    // schema — null-pad to their union like any evolved read would
    val factEnd = aPost.unionByName(aDimHit, allowMissingColumns = true)
    // the dimension snapshot pass reads only files that can hold a
    // partner of an affected fact: the affected fks are delta-bounded,
    // so collect them (same cap) and push them down as IN-list skipping
    // predicates on the dimension's key columns
    val fkRows = factEnd.select(on.map(p => col(p._1)): _*).distinct()
      .limit(MaxPruneKeys + 1).collect()
    val bNew =
      if (fkRows.isEmpty) bNewFor(Nil).filter(lit(false))
      else if (fkRows.length <= MaxPruneKeys)
        bNewFor(inSetPreds(on.map(_._2), fkRows))
      else bNewFor(Nil)
    // the restricted recompute: exactly the view rows that should exist
    val current = compute(factEnd, bNew, on).localCheckpoint()
    val affected = aTouched
      .unionByName(aDimHit.select(aKeys.map(col): _*))
      .distinct()
    // an affected key with no recomputed row has lost its fact row or
    // its partner — delete (a no-op if the view never had it)
    val deletes = affected.join(current.select(aKeys.map(col): _*), aKeys, "left_anti")
    current.withColumn(OpCol, lit("u"))
      .unionByName(deletes.withColumn(OpCol, lit("d")), allowMissingColumns = true)
  }

  /** Refresh `view` (a [[CdcTable]] keyed by `fact.keys`) from version
    * window `[fromA, toA]` of the fact table and `[fromB, toB]` of the
    * dimension — one [[deltaBatch]] merged under a caller-supplied
    * refresh timestamp (any monotone value; the batch carries one row
    * per key). `fromA`/`fromB` must still be retained (the change feeds
    * are endpoint diffs). The snapshot passes go through the tables'
    * stats-pruned version-pinned scans ([[CdcTable.readWhereAt]]), so a
    * small delta against a key-clustered or bloom-filtered table opens
    * only the files its keys can live in.
    */
  def refresh(view: CdcTable, fact: CdcTable, fromA: Long, toA: Long,
              dim: CdcTable, fromB: Long, toB: Long,
              on: Seq[(String, String)], refreshTs: java.sql.Timestamp): Unit = {
    val batch = deltaBatch(
      fact.changesBetween(fromA, toA), preds => fact.readWhereAt(toA, preds),
      dim.changesBetween(fromB, toB), preds => dim.readWhereAt(toB, preds),
      on, fact.keys)
      .withColumn(TsCol, lit(refreshTs))
    view.merge(batch, TsCol)
  }
}
