package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Additive schema evolution, the reference's reconciliation rules
  * (SURVEY.md §1.3): source column absent in sink -> ADD COLUMN; sink
  * column absent in batch -> null backfill; column-name sanitization
  * (trim, spaces->underscores, lowercase — sanpshot_script.py:172,217-218).
  *
  * TYPE-widening evolution (r11): a source column whose type WIDENS
  * (int -> long, float -> double, decimal precision raise — routine MySQL
  * ALTERs) merges by widening the sink column to the union type; an
  * incompatible change (string for an int column, double -> long,
  * timestamp -> int, a decimal that would overflow 38 digits) REJECTS
  * LOUDLY. This is a deliberate divergence from the reference, whose
  * snapshot loader evolves sink columns to whatever the source currently
  * says (sanpshot_script.py:56 — source-wins, catalogued in SURVEY §4 as
  * a bug not to replicate: it silently narrows and corrupts on redefine).
  */
object SchemaEvolution {

  /** The union type both `a` and `b` widen to without value loss, if the
    * pair is widenable: equal types; integral ladder byte < short < int
    * < long; float -> double; decimals by component-wise max of integer
    * digits and scale (None past 38 digits). Unrelated pairs -> None.
    */
  def widenedType(a: DataType, b: DataType): Option[DataType] = {
    val ladder = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    (a, b) match {
      case _ if a == b => Some(a)
      case _ if ladder.contains(a) && ladder.contains(b) =>
        Some(if (ladder.indexOf(a) >= ladder.indexOf(b)) a else b)
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case (x: DecimalType, y: DecimalType) =>
        val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
        val scale = math.max(x.scale, y.scale)
        if (intDigits + scale <= DecimalType.MAX_PRECISION)
          Some(DecimalType(intDigits + scale, scale))
        else None
      // containers widen element-wise; containsNull/valueContainsNull
      // widen by OR (false -> true is lossless — in-memory frames carry
      // containsNull=false where the same data read back from parquet
      // carries true, and that pair must not reject)
      case (ArrayType(ea, na), ArrayType(eb, nb)) =>
        widenedType(ea, eb).map(e => ArrayType(e, na || nb))
      case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
        for { k <- widenedType(ka, kb); v <- widenedType(va, vb) }
          yield MapType(k, v, na || nb)
      case _ => None
    }
  }

  /** Reconcile the types of columns PRESENT ON BOTH sides to their
    * widened union type, casting whichever side is narrower (absent
    * columns are the ADDITIVE rules' business, untouched here). Throws
    * IllegalArgumentException naming every incompatible column — never
    * silently narrows, drops, or coerces a value-losing pair.
    */
  def reconcileTypes(existing: DataFrame, batch: DataFrame): (DataFrame, DataFrame) = {
    val eT = existing.schema.map(f => f.name -> f.dataType).toMap
    val bT = batch.schema.map(f => f.name -> f.dataType).toMap
    val differing = existing.columns.filter(c => bT.get(c).exists(_ != eT(c))).toSeq
    if (differing.isEmpty) return (existing, batch)
    val verdicts = differing.map(c => (c, widenedType(eT(c), bT(c))))
    val bad = verdicts.collect { case (c, None) => s"$c: ${eT(c).simpleString} vs ${bT(c).simpleString}" }
    require(bad.isEmpty,
      s"incompatible type evolution for column(s) ${bad.mkString("[", "; ", "]")} — " +
        "only lossless widening (int->long, float->double, decimal precision raise) " +
        "evolves automatically; cast the batch explicitly or migrate the table " +
        "(the reference's source-wins evolution, sanpshot_script.py:56, is a " +
        "documented bug this engine refuses to replicate)")
    def apply(df: DataFrame, types: Map[String, DataType]): DataFrame =
      verdicts.foldLeft(df) { case (d, (c, Some(t))) =>
        if (types(c) == t) d else d.withColumn(c, col(c).cast(t))
      }
    (apply(existing, eT), apply(batch, bT))
  }

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
