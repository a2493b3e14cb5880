package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Join-based MERGE: the one operator the reference needs that plain Spark
  * lacks (SQL `MERGE INTO`, incremental_kafka_s3_cdc.py:243-292). Semantics:
  *
  *   - WHEN MATCHED AND __op='d'        THEN DELETE
  *   - WHEN MATCHED AND __op IN (u,c,r) THEN UPDATE SET *
  *   - WHEN NOT MATCHED AND __op!='d'   THEN INSERT *
  *
  * Implemented as a full-outer join on the key columns with per-column
  * choose-side, which is exactly the copy-on-write physical plan the
  * reference's Iceberg config requests (`write.delete.mode=copy-on-write`,
  * incremental_kafka_s3_cdc.py:133-135). Schema evolution is additive in
  * both directions: batch columns absent from the target appear (backfilled
  * null for pre-existing rows); target columns absent from the batch are
  * null-filled on updated rows only if the batch never carried them
  * (incremental_kafka_s3_cdc.py:96-102,304-309).
  *
  * Scale notes: Catalyst picks broadcast-hash when the deduped batch is
  * small (the common CDC case — a micro-batch against a huge table),
  * sort-merge otherwise; with a partitioned [[CdcTable]] only the touched
  * partitions join and rewrite (the reference's months(t.pc)=months(s.pc)
  * pruning conjunct, incremental_kafka_s3_cdc.py:262-264).
  */
object CdcMerge {

  val OpColumn = "__op"

  /** Merge a deduped update batch into `existing`. `updates` must carry
    * `__op` and at most one row per key (use [[Dedup.latestWins]] first).
    * Returns the post-merge table content.
    *
    * Fast path: when the batch carries every existing column (the normal
    * CDC case — row images are full), matched updates never need values
    * from the existing side, so the full-outer join collapses to
    *   (existing LEFT ANTI updates) UNION ALL (updates where op != 'd')
    * The anti join broadcasts the micro-batch side: the big table is
    * never shuffled, which is the difference between O(|batch|) and
    * O(|table|) network per merge at 100 TB. The general (schema-soft-
    * drop) path keeps the full-outer form.
    */
  def merge(existing0: DataFrame, updates0: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keyless tables append instead of merging (reference K3)")
    // type-widening evolution: a column present on both sides at widenable
    // types merges at the union type; incompatible pairs reject loudly
    val (existing, updates) = SchemaEvolution.reconcileTypes(existing0, updates0)
    val eCols = existing.columns.filterNot(keys.contains).toSeq
    val uCols = updates.columns.filterNot(c => keys.contains(c) || c == OpColumn).toSeq
    if (eCols.forall(uCols.contains)) {
      val outCols = keys ++ eCols ++ uCols.filterNot(eCols.contains)
      val eAligned = (uCols.filterNot(eCols.contains))
        .foldLeft(existing) { (d, c) =>
          d.withColumn(c, lit(null).cast(updates.schema(c).dataType))
        }
      val untouched = eAligned.join(updates.select(keys.map(col): _*), keys, "left_anti")
      val applied = updates.filter(col(OpColumn) =!= "d").drop(OpColumn)
      return untouched.select(outCols.map(col): _*)
        .unionAll(applied.select(outCols.map(col): _*))
    }
    val outCols = (eCols ++ uCols.filterNot(eCols.contains)).toSeq
    val eTypes = existing.schema.map(f => f.name -> f.dataType).toMap
    val uTypes = updates.schema.map(f => f.name -> f.dataType).toMap

    val e = existing.select(
      (keys.map(col) :+ struct(eCols.map(col): _*).as("__e")): _*)
    val u = updates.select(
      (keys.map(col) ++ Seq(struct(uCols.map(col): _*).as("__u"), col(OpColumn))): _*)

    val joined = e.join(u, keys, "full_outer")
    // matched delete -> drop; not-matched delete -> never insert
    val kept = joined.filter(col(OpColumn).isNull || col(OpColumn) =!= "d")

    def sideField(side: String, c: String, types: Map[String, DataType]): Column =
      if (types.contains(c)) col(side).getField(c) else lit(null).cast(resolveType(c, eTypes, uTypes))

    val out = kept.select(
      (keys.map(col) ++ outCols.map { c =>
        when(col(OpColumn).isNotNull, sideField("__u", c, uTypes))
          .otherwise(sideField("__e", c, eTypes))
          .as(c)
      }): _*)
    out
  }

  private def resolveType(c: String, e: Map[String, DataType], u: Map[String, DataType]): DataType =
    u.getOrElse(c, e.getOrElse(c, org.apache.spark.sql.types.NullType))

  /** [[merge]] with the cross-batch late-data guard SURVEY §2.9 calls
    * out (`WHEN MATCHED AND s.__ts_ms >= t.__ts_ms`): within one batch
    * latest-wins dedup already orders events, but across batches the
    * plain merge lets a LATE batch (replayed, delayed, or out-of-order
    * delivery) overwrite newer state with older row images. Here a
    * matched update or delete applies only when the incoming event time
    * is at or after the stored one; older events are ignored row-wise.
    * Null precedence, in check order: a null STORED timestamp always
    * yields to the update (a stored row without an event time cannot
    * claim recency — this includes the case where the incoming
    * timestamp is also null); only when the stored timestamp is present
    * does a null INCOMING timestamp yield to the stored row. Same
    * full-outer copy-on-write shape — the guard is one more per-row
    * predicate, no extra shuffle.
    */
  def mergeGuarded(existing0: DataFrame, updates0: DataFrame, keys: Seq[String],
                   tsCol: String): DataFrame = {
    require(keys.nonEmpty, "keyless tables append instead of merging (reference K3)")
    require(existing0.columns.contains(tsCol) && updates0.columns.contains(tsCol),
      s"both sides must carry the guard timestamp column $tsCol")
    val (existing, updates) = SchemaEvolution.reconcileTypes(existing0, updates0)
    val eCols = existing.columns.filterNot(keys.contains).toSeq
    val uCols = updates.columns.filterNot(c => keys.contains(c) || c == OpColumn).toSeq
    val outCols = (eCols ++ uCols.filterNot(eCols.contains)).toSeq
    val eTypes = existing.schema.map(f => f.name -> f.dataType).toMap
    val uTypes = updates.schema.map(f => f.name -> f.dataType).toMap

    val e = existing.select(
      (keys.map(col) :+ struct(eCols.map(col): _*).as("__e")): _*)
    val u = updates.select(
      (keys.map(col) ++ Seq(struct(uCols.map(col): _*).as("__u"), col(OpColumn))): _*)
    val joined = e.join(u, keys, "full_outer")

    val uTs = col("__u").getField(tsCol)
    val eTs = col("__e").getField(tsCol)
    val uWins = col("__e").isNull || eTs.isNull || (uTs.isNotNull && uTs >= eTs)

    // rows with no batch event (op null) are kept unconditionally — the
    // filter must short-circuit on that BEFORE touching uWins, or SQL
    // three-valued logic turns `!(null AND ...)` into null and silently
    // drops untouched rows whose stored timestamp is null
    val kept = joined.filter(
      col(OpColumn).isNull ||
        // a WINNING matched delete drops the row (a losing one is
        // ignored); an unmatched delete never inserts
        !(col(OpColumn) === "d" && (col("__e").isNull || uWins)))

    def sideField(side: String, c: String, types: Map[String, DataType]): Column =
      if (types.contains(c)) col(side).getField(c) else lit(null).cast(resolveType(c, eTypes, uTypes))

    kept.select(
      (keys.map(col) ++ outCols.map { c =>
        when(col(OpColumn).isNotNull && uWins, sideField("__u", c, uTypes))
          .otherwise(sideField("__e", c, eTypes))
          .as(c)
      }): _*)
  }

  /** One-shot "apply a CDC event stream to a base table": dedup the raw
    * events latest-wins per key, then merge. This is the reference's whole
    * per-table batch flow (process_for_table -> merge_to_table) as a single
    * declarative plan.
    */
  def applyCdcBatch(base: DataFrame, rawEvents: DataFrame, keys: Seq[String],
                    tsCol: String, tieBreakers: Seq[String] = Nil): DataFrame = {
    val deduped = Dedup.latestWins(rawEvents, keys, tsCol, tieBreakers)
    merge(base, deduped, keys)
  }
}
