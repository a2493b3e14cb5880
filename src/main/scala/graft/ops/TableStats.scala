package graft.ops

import java.io.File
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Incremental per-directory COLUMN NDV statistics for [[CdcTable]] —
  * the `ANALYZE TABLE` machinery, built so that analyzing a 100 TB
  * table is a METADATA operation, not a scan.
  *
  * The trick is the table's own copy-on-write discipline: every data
  * directory is immutable once committed, so a 256-register HyperLogLog
  * sketch of each declared column's values, written BESIDE the
  * directory at commit time (an `_ndv.tsv` sidecar, exactly the
  * `_filestats.tsv` pattern), describes that directory forever. HLL
  * registers form a max-monoid — the union of two sketches IS the
  * sketch of the union — and the live table is precisely the union of
  * its live directories, so table-level NDV = a byte-wise max over the
  * live dirs' sidecars: O(live dirs × columns × 256 bytes), zero data
  * I/O, at any table size. Deletes stay exact because they REWRITE
  * their directories (copy-on-write), which re-derives those sidecars
  * from the surviving rows; HLL never needs to subtract.
  *
  * Register rule is IDENTICAL to [[graft.functions.HllAggregator]] /
  * [[SketchView]] (and their DuckDB oracles): hash = the engine's
  * shared 60-bit md5 `h64` over the value CAST to string (nulls
  * skipped), bucket = hash & 255, rho = 53 − bitlength(hash >> 8). A
  * cross-engine oracle recomputes the same registers from the same
  * rows with plain SQL, so `ANALYZE` output hash-compares exactly —
  * the incremental metadata-only path is gated against a full-scan
  * truth, not eyeballed.
  *
  * Two paths fall back to a scan, both bounded by the anomaly, never
  * the table: (1) a directory with no sidecar (pre-stats table, torn
  * write, a maintenance path that skips emission) is scanned once and
  * the sidecar BACKFILLED — the dir is immutable, so late stats are
  * still true stats; (2) a directory carrying deletion-vector entries
  * has masked rows the raw sidecar cannot see (merge-on-read debt), so
  * `analyze()` recomputes exactly those dirs through the vector-applied
  * read — cost proportional to the debt-carrying dirs, and
  * materializing the vector resets it. A missing or unreadable sidecar
  * can cost a scan, never an answer.
  */
object TableStats {

  /** Per-data-directory NDV sidecar (beside `_filestats.tsv`). */
  val SidecarName = "_ndv.tsv"
  private val Header = "ndv-v1"

  /** Register count / zero-remainder rank — must match
    * [[graft.functions.HllAggregator]] and [[SketchView]].
    */
  val M = 256
  val MaxRho = 53

  /** Spark-side 60-bit md5 hash of column `c` cast to string — the
    * engine's shared h64 ([[graft.TextQueries.h64]]) over the value's
    * canonical string form, so a DuckDB oracle hashes the identical
    * bytes for string/integral/date columns.
    */
  private def h64OfCol(c: String): String =
    s"CAST(conv(substring(md5(CAST(`$c` AS STRING)),1,15),16,10) AS BIGINT)"

  // ------------------------------------------------------------ sidecar IO

  def encode(regs: Array[Byte]): String = Base64.getEncoder.encodeToString(regs)

  def decode(s: String): Option[Array[Byte]] =
    try {
      val b = Base64.getDecoder.decode(s)
      if (b.length == M) Some(b) else None
    } catch { case _: IllegalArgumentException => None }

  /** Byte-wise max of `b` into a copy of `a` (register union). */
  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = a.clone()
    var i = 0
    while (i < M) { if (b(i) > out(i)) out(i) = b(i); i += 1 }
    out
  }

  def zero: Array[Byte] = new Array[Byte](M)

  /** The directory's recorded registers per column, or None when the
    * sidecar is missing/torn/old-format — callers fall back to a scan
    * (and backfill), never to a wrong answer.
    */
  def readSidecar(io: TableIO, dir: File): Option[Map[String, Array[Byte]]] = {
    val f = new File(dir, SidecarName).getPath
    if (!io.exists(f)) return None
    val lines = try io.readLines(f) catch { case _: Exception => return None }
    if (lines.isEmpty || lines.head != Header) return None
    val entries = lines.tail.flatMap { l =>
      l.split('\t') match {
        case Array(c, r) => decode(r).map(c -> _)
        case _           => None
      }
    }
    // a torn tail (fewer parsed entries than lines) is treated as absent
    if (entries.length != lines.tail.count(_.nonEmpty)) None
    else Some(entries.toMap)
  }

  def writeSidecar(io: TableIO, dir: File, regs: Map[String, Array[Byte]]): Unit =
    io.writeAtomic(new File(dir, SidecarName).getPath,
      (Header +: regs.toSeq.sortBy(_._1).map { case (c, r) => s"$c\t${encode(r)}" })
        .mkString("\n"))

  // ------------------------------------------------------- register compute

  /** HLL registers of each of `cols` per `groupCols` group, in ONE job:
    * the columns unpivot to (column, h64) pairs map-side (an explode of
    * a k-struct array — no per-column pass over the data), nulls drop,
    * and [[SketchView.regsOf]] folds the 256-register arrays with two
    * combine-friendly groupBys. Returns rows
    * `(groupCols…, __col, hll_regs: ARRAY<INT>)`.
    */
  def regsByGroup(df: DataFrame, groupCols: Seq[String], cols: Seq[String]): DataFrame = {
    val pairs = df
      .select(groupCols.map(col) :+ explode(array(cols.map(c =>
        struct(lit(c).as("__col"), expr(h64OfCol(c)).as("__h"))): _*)).as("__p"): _*)
      .select(groupCols.map(col) :+ col("__p.__col").as("__col") :+ col("__p.__h").as("__h"): _*)
      .filter(col("__h").isNotNull)
    SketchView.regsOf(pairs, groupCols :+ "__col", "__h")
  }

  /** Collect [[regsByGroup]] output to driver-side maps: group key
    * (the groupCols' string values) -> column -> registers. Bounded by
    * groups × columns × 256 bytes — commit-scale metadata, never rows.
    */
  def collectRegs(df: DataFrame, groupCols: Seq[String]): Map[Seq[String], Map[String, Array[Byte]]] =
    df.collect().groupBy(r => groupCols.map(c => String.valueOf(r.getAs[Any](c))).toSeq)
      .map { case (k, rows) =>
        k -> rows.map { r =>
          val regs = r.getAs[scala.collection.Seq[Int]]("hll_regs")
          val b = new Array[Byte](M)
          var i = 0
          while (i < M) { b(i) = regs(i).toByte; i += 1 }
          r.getAs[String]("__col") -> b
        }.toMap
      }

  /** Exact-integer summary of finished registers — the same
    * (hll_sum, hll_zeros) face as [[graft.functions.HllSummary]]; the
    * estimate stays one SQL division away
    * ([[graft.functions.HllAggregator.estimateSql]]) so both engines
    * compute it from identical text on identical integers.
    */
  /** Planner-facing cardinality estimate: the raw HLL with the standard
    * small-range LINEAR-COUNTING correction (`m·ln(m/zeros)` when the
    * raw estimate falls in the n ≲ 2.5·m biased regime). Driver-side
    * Scala math — the SQL-exposed `ndv` column stays the raw
    * cross-engine formula ([[graft.functions.HllAggregator.estimateSql]],
    * deliberately libm-free); THIS is the number a join-size or
    * broadcast decision should consume.
    */
  def estimateCorrected(hllSum: Long, hllZeros: Int): Long = {
    val m = M.toDouble
    val raw = 0.7213 / (1 + 1.079 / m) * m * m * 9007199254740992.0 / hllSum.toDouble
    val est =
      if (raw <= 2.5 * m && hllZeros > 0) m * math.log(m / hllZeros.toDouble)
      else raw
    math.round(est)
  }

  def summarize(regs: Array[Byte]): (Long, Int) = {
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      s += 1L << (MaxRho - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    (s, zeros)
  }
}
