package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a DERIVED table — `transform(source)`
  * materialized as its own [[CdcTable]] and kept current from the
  * source's change data feed. The training-data shapes this serves are
  * the per-document INDEX tables a pipeline otherwise rebuilds per
  * ingest at corpus scale: chunk tables (doc -> N overlapping windows),
  * MinHash/SimHash signature tables (doc -> N band rows), fingerprint
  * and feature tables. At 100 TB the rebuild is a full corpus pass per
  * ingest window; this refresh costs one `transform` over the
  * delta's rows.
  *
  * Contract: `transform` must be ROW-LOCAL — every output row is a
  * function of exactly ONE input row (select/filter/explode shapes;
  * no joins, aggregates or windows across source rows) — and the view
  * is keyed by `viewKeys`, which must uniquely identify an output row
  * GLOBALLY (the usual shape: the source's key columns pass through,
  * plus a within-row ordinal such as a chunk index or band id). Under
  * that contract the refreshed view provably equals `transform` of the
  * source's end state: rows of untouched source keys are untouched by
  * construction, and the delta's rows are replaced exactly.
  *
  * The refresh batch, per change-feed window:
  *
  *   - upserts = `transform`(insert + update_postimage rows) — the
  *     current derived rows of every touched source row;
  *   - deletes = keys of `transform`(delete + update_preimage rows)
  *     minus the upserted keys — the derived rows that EXISTED for a
  *     touched source row but no longer do. This is what makes shrink
  *     correct: an update that drops a document from 5 chunks to 3
  *     deletes chunks 3-4, because the pre-image's transform still
  *     emits their keys while the post-image's no longer does.
  *
  * Both sides are transform-of-delta-sized; nothing reads the source
  * snapshot or the existing view outside the view's own keyed merge.
  */
object DerivedView {

  /** Synthetic CDC-batch columns emitted by [[deltaBatch]]. */
  val OpCol = "__op"
  val TsCol = "__ts"

  /** The full (bootstrap) computation — `transform` over the source
    * table; the refreshed view always equals this over the source's end
    * state.
    */
  def compute(source: DataFrame, transform: DataFrame => DataFrame): DataFrame =
    transform(source)

  /** The view delta for one refresh window: one CDC row per derived key
    * the window could have touched (`u` upserts carrying the current
    * derived row, `d` deletes), ready for `view.merge(batch, TsCol)`.
    */
  def deltaBatch(changes: DataFrame, transform: DataFrame => DataFrame,
                 viewKeys: Seq[String]): DataFrame = {
    val ct = col(CdcTable.ChangeTypeCol)
    // the feed is consumed twice (pre and post images) and is typically
    // a changed-months diff join — materialize it once
    val ch = changes.localCheckpoint()
    val post = ch.filter(ct.isin("insert", "update_postimage")).drop(CdcTable.ChangeTypeCol)
    val pre = ch.filter(ct.isin("delete", "update_preimage")).drop(CdcTable.ChangeTypeCol)
    // transform of the delta — delta-sized by the row-local contract;
    // reused by the upserts and the delete anti-join
    val newRows = transform(post).localCheckpoint()
    val oldKeys = transform(pre).select(viewKeys.map(col): _*)
    // derived keys the pre-images emitted that the post-images no longer
    // do: stale rows (shrunk explodes, deleted source rows) -> delete
    val deletes = oldKeys
      .join(newRows.select(viewKeys.map(col): _*), viewKeys, "left_anti")
      .distinct()
    newRows.withColumn(OpCol, lit("u"))
      .unionByName(deletes.withColumn(OpCol, lit("d")), allowMissingColumns = true)
  }

  /** Refresh `view` (a [[CdcTable]] keyed by `viewKeys`) from version
    * window `[fromV, toV]` of `source` — one [[deltaBatch]] merged under
    * a caller-supplied refresh timestamp. `fromV` must still be
    * retained. Idempotent per window.
    */
  def refresh(view: CdcTable, source: CdcTable, fromV: Long, toV: Long,
              transform: DataFrame => DataFrame,
              refreshTs: java.sql.Timestamp): Unit = {
    val batch = deltaBatch(source.changesBetween(fromV, toV), transform, view.keys)
      .withColumn(TsCol, lit(refreshTs))
    // deltaBatch emits one row per derived key (post-image transforms are
    // key-unique by the view-key contract; deletes are the anti-joined
    // complement), so the merge's latest-wins shuffle is the identity
    view.mergePreDeduped(batch)
  }
}
