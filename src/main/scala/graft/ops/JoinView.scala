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
    // facts (unchanged by the fact feed) whose fk hits a changed dim key:
    // ONE map-side pass over the fact snapshot — the changed-key set and
    // the touched-key set both broadcast; AQE folds the whole branch to
    // empty when the dimension feed is empty. Renamed probe columns keep
    // the semi-join correlation-safe if fact and dim share column names.
    val bKeyed = on.zipWithIndex.foldLeft(
        bChanges.select(on.map(p => col(p._2)): _*).distinct()) {
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
    * are endpoint diffs).
    */
  def refresh(view: CdcTable, fact: CdcTable, fromA: Long, toA: Long,
              dim: CdcTable, fromB: Long, toB: Long,
              on: Seq[(String, String)], refreshTs: java.sql.Timestamp): Unit = {
    val batch = deltaBatch(
      fact.changesBetween(fromA, toA), fact.readVersion(toA),
      dim.changesBetween(fromB, toB), dim.readVersion(toB),
      on, fact.keys)
      .withColumn(TsCol, lit(refreshTs))
    view.merge(batch, TsCol)
  }
}
