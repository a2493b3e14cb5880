package graft.ops

import java.io.File
import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.expressions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** File-level column statistics and data skipping for [[CdcTable]] — the
  * metadata layer the reference delegates to Iceberg's "full" column
  * metrics (`write.metadata.metrics.default`,
  * incremental_kafka_s3_cdc.py:134-136): per-data-file min/max/null
  * counts that let a predicate scan open only the files whose value
  * ranges can match. Manifest-level month pruning bounds WHICH
  * DIRECTORIES are listed; this bounds WHICH FILES inside them are
  * scanned — at 100 TB the difference between touching a partition and
  * touching the 2 of its 200 files a point lookup needs.
  *
  * The stats come from the parquet FOOTERS the writer already produced
  * (no second pass over data; reading a footer is a metadata-scale
  * operation, exactly what Iceberg does when it builds manifests) and
  * are cached in a `_filestats.tsv` sidecar per data directory. Data
  * directories are immutable once committed, so a sidecar never goes
  * stale; a directory without one (pre-stats table, interrupted write)
  * just keeps all its files — skipping is a pure optimization, never a
  * correctness dependency, and the residual filter always re-applies the
  * predicate.
  *
  * Supported stat types: integral (as Long), floating (as Double),
  * string, and DATE (normalized to ISO `yyyy-MM-dd` strings, which order
  * lexically — so date range predicates work as string ranges).
  * Timestamps, decimals and nested columns carry no stats here and are
  * simply never pruned on.
  */
object FileSkipping {

  /** A skippable predicate: inclusive range (either bound optional) on
    * one column. Equality is the degenerate range. Values may be Int,
    * Long, Double, String, java.sql.Date or java.time.LocalDate.
    */
  final case class Range(column: String, lower: Option[Any], upper: Option[Any]) {
    require(lower.nonEmpty || upper.nonEmpty, "at least one bound")
  }
  object Eq { def apply(c: String, v: Any): Range = Range(c, Some(v), Some(v)) }

  /** Per-column file statistic. `min`/`max` are None when the column is
    * all-null in the file (a range predicate can then never match) —
    * absence of the COLUMN from the map means "no stats, cannot prune".
    */
  final case class ColStat(min: Option[Any], max: Option[Any], nulls: Long)

  val SidecarName = "_filestats.tsv"

  // ------------------------------------------------------------- gathering

  /** Stats for every data file in `dir` (non-recursive), computed from
    * footers on first use and cached in `dir/_filestats.tsv`. Returns
    * file name -> column -> stat.
    */
  def statsForDir(conf: Configuration, dir: File): Map[String, Map[String, ColStat]] = {
    val sidecar = new File(dir, SidecarName)
    if (sidecar.exists()) parseSidecar(sidecar)
    else {
      val stats = dataFiles(dir).map(f => f.getName -> footerStats(conf, f)).toMap
      // best-effort cache: stats serve this read even if the write fails
      try writeSidecar(sidecar, stats)
      catch { case scala.util.control.NonFatal(_) => () }
      stats
    }
  }

  private def dataFiles(dir: File): Seq[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .toSeq.sortBy(_.getName)

  /** One footer read: block-level stats merged per column. */
  private def footerStats(conf: Configuration, file: File): Map[String, ColStat] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file.getPath), conf))
    try {
      val perBlock = for {
        block <- reader.getFooter.getBlocks.asScala.toSeq
        col <- block.getColumns.asScala
        st = col.getStatistics
        if st != null && !st.isEmpty
        conv <- converter(col.getPrimitiveType.getPrimitiveTypeName,
          col.getPrimitiveType.getLogicalTypeAnnotation)
      } yield {
        val (mn, mx): (Option[Any], Option[Any]) =
          if (st.hasNonNullValue)
            (Some(conv(st.genericGetMin.asInstanceOf[AnyRef])),
              Some(conv(st.genericGetMax.asInstanceOf[AnyRef])))
          else (None, None)
        col.getPath.toDotString -> ColStat(mn, mx, if (st.isNumNullsSet) st.getNumNulls else 0L)
      }
      perBlock.groupMapReduce(_._1)(_._2) { (a, b) =>
        ColStat(
          (a.min ++ b.min).reduceOption((x, y) => if (lt(x, y)) x else y),
          (a.max ++ b.max).reduceOption((x, y) => if (lt(x, y)) y else x),
          a.nulls + b.nulls)
      }
    } finally reader.close()
  }

  /** Physical+logical parquet type -> in-memory stat value; None = type
    * not supported for skipping (timestamps, decimals, int96, …).
    */
  private def converter(prim: PrimitiveTypeName,
                        logical: LogicalTypeAnnotation): Option[AnyRef => Any] =
    (prim, logical) match {
      case (PrimitiveTypeName.INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        Some(v => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue).toString)
      case (PrimitiveTypeName.INT32, null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) =>
        Some(v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT64, null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) =>
        Some(v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT64, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        // normalize to epoch MICROS whatever unit the writer used;
        // floorDiv keeps nanos conservative for pre-epoch instants
        val toMicros: Long => Long = t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => Math.multiplyExact(_, 1000L)
          case LogicalTypeAnnotation.TimeUnit.MICROS => identity
          case LogicalTypeAnnotation.TimeUnit.NANOS  => Math.floorDiv(_, 1000L)
        }
        Some(v => toMicros(v.asInstanceOf[Number].longValue))
      case (PrimitiveTypeName.DOUBLE, _) => Some(v => v.asInstanceOf[Number].doubleValue)
      case (PrimitiveTypeName.FLOAT, _)  => Some(v => v.asInstanceOf[Number].doubleValue)
      case (PrimitiveTypeName.BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        Some(v => v.asInstanceOf[Binary].toStringUsingUTF8)
      case _ => None
    }

  // -------------------------------------------------------------- pruning

  /** The data files in `dir` a scan constrained by `preds` must read —
    * everything minus the files whose stats PROVE no row matches. A file
    * or column without stats is always kept.
    */
  def prunedFiles(conf: Configuration, dir: File, preds: Seq[Range]): Seq[File] = {
    val stats = statsForDir(conf, dir)
    dataFiles(dir).filter { f =>
      val cols = stats.getOrElse(f.getName, Map.empty)
      preds.forall(p => cols.get(p.column).forall(mayMatch(_, p)))
    }
  }

  /** Can a row of a file with stats `s` satisfy `p`? Conservative: any
    * uncertainty keeps the file. An all-null column (min/max None) can
    * never satisfy a range predicate (SQL comparisons with null are not
    * true), so those files ARE skipped.
    */
  def mayMatch(s: ColStat, p: Range): Boolean =
    (s.min, s.max) match {
      case (Some(mn), Some(mx)) =>
        p.lower.map(norm).forall(lo => !lt(mx, lo)) &&
          p.upper.map(norm).forall(hi => !lt(hi, mn))
      case _ => false // all-null column: no comparison predicate matches
    }

  /** Normalize user-facing predicate values to the stat domain. */
  def norm(v: Any): Any = v match {
    case i: Int                 => i.toLong
    case s: Short               => s.toLong
    case b: Byte                => b.toLong
    case f: Float               => f.toDouble
    case d: java.sql.Date       => d.toLocalDate.toString
    case d: java.time.LocalDate => d.toString
    // timestamps compare as epoch micros — instant-exact, timezone-free
    case t: java.sql.Timestamp =>
      Math.addExact(Math.multiplyExact(t.getTime, 1000L), (t.getNanos % 1000000L) / 1000L)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    case other                  => other
  }

  /** Total order across the stat value domain; numerics compare
    * numerically (Long vs Double widens), strings lexically. A type
    * mismatch (e.g. string bound against numeric stats) keeps files by
    * failing the caller loudly — a silent wrong-type prune would be a
    * correctness bug.
    */
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long)     => x < y
    case (x: Double, y: Double) => x < y
    case (x: Long, y: Double)   => x.toDouble < y
    case (x: Double, y: Long)   => x < y.toDouble
    case (x: String, y: String) => x < y
    case _ => throw new IllegalArgumentException(
      s"unorderable stat/predicate pair: ${a.getClass.getSimpleName} vs ${b.getClass.getSimpleName}")
  }

  // ----------------------------------------------- predicate extraction

  /** Best-effort extraction of skippable [[Range]]s from a Catalyst
    * predicate: top-level conjuncts of `=`, `>=`, `>`, `<=`, `<` (and
    * therefore BETWEEN) over one attribute and one foldable literal
    * contribute a range; everything else (OR, NOT, functions, …)
    * contributes NOTHING — the caller re-applies the full predicate, so
    * extraction only ever adds pruning power, never changes the answer.
    * Strict bounds relax to inclusive ones: a superset of files is a
    * correct prune set.
    */
  def rangesOf(pred: org.apache.spark.sql.Column): Seq[Range] =
    rangesOf(org.apache.spark.sql.graft.ColumnExpr.expression(pred))

  private def rangesOf(e: expressions.Expression): Seq[Range] = {
    import expressions._
    def attr(x: Expression): Option[String] = x match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // literal values arrive in Catalyst INTERNAL form — map them onto the
    // stat domain (UTF8String -> String, date days -> ISO, timestamp
    // already epoch micros)
    def litVal(x: Expression): Option[Any] = x match {
      case Literal(v, dt) if v != null =>
        dt match {
          case org.apache.spark.sql.types.StringType => Some(v.toString)
          case org.apache.spark.sql.types.DateType =>
            Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
          case org.apache.spark.sql.types.TimestampType => Some(v.asInstanceOf[Long])
          case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType =>
            Some(v.asInstanceOf[Number].longValue)
          case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
            Some(v.asInstanceOf[Number].doubleValue)
          case _ => None
        }
      case _ => None
    }
    def one(c: Option[String], v: Option[Any], lower: Boolean, upper: Boolean): Seq[Range] =
      (c, v) match {
        case (Some(cc), Some(vv)) =>
          Seq(Range(cc, if (lower) Some(vv) else None, if (upper) Some(vv) else None))
        case _ => Nil
      }
    // a DSL-built Column arrives UNRESOLVED: `col("a") >= lit(1)` is
    // UnresolvedFunction(">=", ...), not GreaterThanOrEqual — normalize
    // both shapes to (op, left, right) before matching
    def shape(x: Expression): Option[(String, Expression, Expression)] = x match {
      case And(l, r)                => Some(("and", l, r))
      case EqualTo(a, b)            => Some(("=", a, b))
      case GreaterThanOrEqual(a, b) => Some((">=", a, b))
      case GreaterThan(a, b)        => Some((">", a, b))
      case LessThanOrEqual(a, b)    => Some(("<=", a, b))
      case LessThan(a, b)           => Some(("<", a, b))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.arguments.length == 2 =>
        Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
          f.arguments(0), f.arguments(1)))
      case _ => None
    }
    shape(e) match {
      case Some(("and", l, r)) => rangesOf(l) ++ rangesOf(r)
      case Some(("=" | "==", a, l)) => one(attr(a), litVal(l), lower = true, upper = true) ++
        one(attr(l), litVal(a), lower = true, upper = true)
      case Some((">=" | ">", a, l)) => one(attr(a), litVal(l), lower = true, upper = false) ++
        one(attr(l), litVal(a), lower = false, upper = true)
      case Some(("<=" | "<", a, l)) => one(attr(a), litVal(l), lower = false, upper = true) ++
        one(attr(l), litVal(a), lower = true, upper = false)
      case Some(("between", _, _)) | _ => Nil
    }
  }

  // ------------------------------------------------------------- sidecar

  private def enc(v: Any): String = v match {
    case l: Long   => s"l:$l"
    case d: Double => s"d:$d"
    case s: String => "s:" + URLEncoder.encode(s, UTF_8)
  }

  private def dec(s: String): Any = (s.charAt(0): @unchecked) match {
    case 'l' => s.drop(2).toLong
    case 'd' => s.drop(2).toDouble
    case 's' => URLDecoder.decode(s.drop(2), UTF_8)
  }

  private def writeSidecar(f: File, stats: Map[String, Map[String, ColStat]]): Unit = {
    val lines = for {
      (file, cols) <- stats.toSeq.sortBy(_._1)
      (c, st) <- cols.toSeq.sortBy(_._1)
    } yield Seq(URLEncoder.encode(file, UTF_8), URLEncoder.encode(c, UTF_8),
      st.min.map(enc).getOrElse("-"), st.max.map(enc).getOrElse("-"),
      st.nulls.toString).mkString("\t")
    Files.writeString(f.toPath, lines.mkString("\n")): Unit
  }

  private def parseSidecar(f: File): Map[String, Map[String, ColStat]] =
    Files.readAllLines(f.toPath).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(file, c, mn, mx, nulls) = l.split("\t", -1)
      (URLDecoder.decode(file, UTF_8), URLDecoder.decode(c, UTF_8),
        ColStat(Option(mn).filter(_ != "-").map(dec),
          Option(mx).filter(_ != "-").map(dec), nulls.toLong))
    }.groupMap(_._1)(t => t._2 -> t._3).view.mapValues(_.toMap).toMap
}
