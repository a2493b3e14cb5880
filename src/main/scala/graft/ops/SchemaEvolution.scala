package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Additive schema evolution, the reference's reconciliation rules
  * (SURVEY.md §1.3): source column absent in sink -> ADD COLUMN; sink
  * column absent in batch -> null backfill; column-name sanitization
  * (trim, spaces->underscores, lowercase — sanpshot_script.py:172,217-218).
  */
object SchemaEvolution {

  /** Columns in `batch` that the sink schema lacks (would become
    * ALTER TABLE ADD COLUMN against a catalog table).
    */
  def newColumns(sink: StructType, batch: StructType): Seq[org.apache.spark.sql.types.StructField] =
    batch.fields.toSeq.filterNot(f => sink.fieldNames.contains(f.name))

  /** Align `df` to the union schema: add missing columns as typed nulls,
    * order columns as (sink columns, then new batch columns). Mirrors
    * incremental_kafka_s3_cdc.py:96-102 + 304-309 in one pure function.
    */
  def alignToUnion(df: DataFrame, sink: StructType, batch: StructType): DataFrame = {
    val unionFields = sink.fields.toSeq ++ newColumns(sink, batch)
    val cols = unionFields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  /** The reference's column-name sanitization: trim, spaces to
    * underscores, lowercase.
    */
  def sanitizeName(c: String): String =
    c.trim.replace(" ", "_").toLowerCase

  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)
}
