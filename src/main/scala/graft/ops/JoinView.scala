package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an equi-JOIN materialized view — the
  * missing piece between [[IncrementalView]] (aggregates of ONE table)
  * and what a real pipeline materializes: an enriched fact stream,
  * `fact JOIN dim`, kept current as BOTH sides merge. The reference
  * materializes such enrichments by full recompute per batch
  * (sanpshot_script.py rebuilds its joined exports end-to-end); here the
  * refresh applies the classic signed-delta view-maintenance algebra so
  * per-batch cost scales with the CHANGE FEEDS, not the table sizes:
  *
  * {{{
  *   (A + dA) JOIN (B + dB)  =  A JOIN B  +  dA JOIN B_new  +  A_old JOIN dB
  * }}}
  *
  * (`dA JOIN B_new` absorbs the `dA JOIN dB` cross term — the standard
  * trick that makes the two delta joins exact without a third term.)
  * Both delta terms join a CDC-feed-sized side against one table
  * snapshot: Catalyst broadcasts the small feed, the big side is a
  * [[CdcTable]] time-travel read whose months/files prune like any
  * other scan — at 100 TB the refresh reads the deltas plus the join
  * partners they touch, never the full view.
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
  * the signed delta nets out, per fact key, to an upsert carrying the
  * freshest payload or a delete — applied through the same MERGE path
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

  /** The signed view delta between two refresh points, netted to one
    * CDC row per fact key: `__op` = `u` (upsert, freshest payload) or
    * `d` (delete), ready for the view table's `merge(batch, TsCol)`.
    *
    *  - `aChanges` / `bChanges`: `changesBetween` feeds of fact and
    *    dimension covering exactly the refresh window (either may be
    *    empty).
    *  - `aOld`: the FACT table at the window START (time travel) — the
    *    `A_old JOIN dB` term pairs dimension images with the facts that
    *    did NOT change; facts that did arrive current via `dA JOIN
    *    B_new`, whose images are strictly fresher and win the netting.
    *  - `bNew`: the DIMENSION table at the window END.
    *
    * Netting, per fact key: signs sum negative → delete; otherwise the
    * highest-priority positive row (term 1 over term 2 — its fact image
    * is the post-image and its partner is current) is the upsert
    * payload. A zero net with contributions is a payload refresh
    * (re-upserting an identical payload is harmless and idempotent).
    */
  def deltaBatch(aChanges: DataFrame, aOld: DataFrame,
                 bChanges: DataFrame, bNew: DataFrame,
                 on: Seq[(String, String)], aKeys: Seq[String]): DataFrame = {
    val sign = when(col(CdcTable.ChangeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val dimJoinCols = on.map(_._2).toSet
    // same contract as compute, checked up front for a readable error
    // (both tables carrying a same-named bookkeeping column — e.g. the
    // merge ts — is the common way to trip this; project it away or
    // rename per table)
    val factCols = aChanges.columns.filterNot(_ == CdcTable.ChangeTypeCol).toSet
    val collide = bNew.columns.filterNot(dimJoinCols.contains).filter(factCols.contains)
    require(collide.isEmpty,
      s"fact and dimension payload columns must not collide: ${collide.mkString(", ")}")

    // term 1: signed fact images JOIN the current dimension
    val a1 = aChanges.withColumn("__sign", sign).drop(CdcTable.ChangeTypeCol)
    val t1 = {
      val payload = bNew.columns.filterNot(dimJoinCols.contains).toSeq
      a1.join(bNew, cond(a1, bNew, on), "inner")
        .select(a1.columns.toSeq.map(a1(_)) ++ payload.map(bNew(_)): _*)
        .withColumn("__prio", lit(2L))
    }
    // term 2: window-start facts JOIN signed dimension images
    val b2 = bChanges.withColumn("__sign", sign).drop(CdcTable.ChangeTypeCol)
    val t2 = {
      val payload = b2.columns.filterNot(c => dimJoinCols.contains(c) || c == "__sign").toSeq
      aOld.join(b2, cond(aOld, b2, on), "inner")
        .select(aOld.columns.toSeq.map(aOld(_)) ++ payload.map(b2(_)) :+ b2("__sign"): _*)
        .withColumn("__prio", lit(1L))
    }
    // the signed union feeds BOTH the netting and the freshest-payload
    // pass; it is delta-sized by construction, so materialize it once
    // (same discipline as the merge path's deduped batch).
    // allowMissingColumns: aOld has the WINDOW-START schema — a fact
    // column that evolved in-window is absent there and null-pads, which
    // is exactly the value unchanged rows carry for it at window end
    val all = t1.unionByName(t2, allowMissingColumns = true).localCheckpoint()

    val net = all.groupBy(aKeys.map(col): _*).agg(sum(col("__sign")).as("__net"))
    val freshest = Dedup.latestWins(all.filter(col("__sign") === 1L), aKeys, "__prio")
      .drop("__sign", "__prio")
    // left join: a net-negative key has no positive payload — its
    // non-key columns ride as nulls, which a merge DELETE never reads
    net.join(freshest, aKeys, "left")
      .withColumn(OpCol, when(col("__net") < 0, lit("d")).otherwise(lit("u")))
      .drop("__net")
  }

  /** Refresh `view` (a [[CdcTable]] keyed by `fact.keys`) from version
    * window `[fromA, toA]` of the fact table and `[fromB, toB]` of the
    * dimension — one [[deltaBatch]] merged under a caller-supplied
    * refresh timestamp (any monotone value; the batch is already netted
    * to one row per key). `fromA`/`fromB` must still be retained (they
    * are time-travel reads).
    */
  def refresh(view: CdcTable, fact: CdcTable, fromA: Long, toA: Long,
              dim: CdcTable, fromB: Long, toB: Long,
              on: Seq[(String, String)], refreshTs: java.sql.Timestamp): Unit = {
    val batch = deltaBatch(
      fact.changesBetween(fromA, toA), fact.readVersion(fromA),
      dim.changesBetween(fromB, toB), dim.readVersion(toB),
      on, fact.keys)
      .withColumn(TsCol, lit(refreshTs))
    view.merge(batch, TsCol)
  }
}
