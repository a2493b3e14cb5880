package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained EXACT Gram/scatter matrix over a vector
  * column — the PCA/whitening front half kept current from the change
  * feed instead of recomputed corpus-wide per refresh. Embeddings
  * quantize to micro-units once (the x_gram_matrix rule, identical to
  * the cross-engine oracle), so the matrix is a SUM of per-row integer
  * outer products — and sums, unlike HLL registers, subtract exactly:
  *
  *   - inserts/post-images ADD their outer products,
  *   - deletes/pre-images SUBTRACT theirs,
  *
  * so EVERY refresh is delta-bounded — there is no dirty-group
  * recompute path at all, the one structural advantage an additive
  * statistic has over the sketch views. An update contributes its
  * pre-image at -1 and its post-image at +1 in the same window; a
  * row deleted and re-inserted cancels exactly.
  *
  * The view table is d(d+1)/2 rows (the upper triangle) whatever the
  * corpus size and commits one version of its own [[CdcTable]] per
  * refresh (atomic pointer, time travel). Because the delta is a SIGNED
  * SUM — additive, not idempotent like [[SketchView]]'s register
  * max-merge — the reflected source version must move atomically WITH
  * the matrix: it rides the refresh commit as a [[CdcTable]] commit tag
  * (visible exactly iff the commit is), never a post-commit sidecar,
  * so a crash replay can only re-run a window whose delta was never
  * published. The `_gram_reflected` sidecar survives ONLY as the
  * empty-window fast-forward (nothing to apply → nothing a replay
  * could double-apply → no view version burned).
  *
  * At 100 TB: the delta pass is one scan of the CDF window (never the
  * table), each task pre-aggregates to ≤ d(d+1)/2 cells, and the merge
  * joins two d²-bounded tables.
  */
final class GramView(
    spark: SparkSession,
    source: CdcTable,
    val path: String,
    vecCol: String,
    io: TableIO = LocalTableIO) {

  import GramView._

  /** The persisted view: `(i, j, s)` for i ≤ j, s exact int64. */
  val table = new CdcTable(spark, path, Seq("i", "j"), io = io)

  private def marker = new File(path, ReflectedMarker).getPath

  /** Source version the persisted matrix reflects, if any: the commit
    * tag of the view's CURRENT version (atomic with the matrix it
    * describes), fast-forwarded by the empty-window sidecar when that
    * is ahead — the sidecar only ever skips windows verified empty, so
    * trusting the later of the two can never replay a published delta
    * nor skip an unpublished one.
    */
  def reflectedVersion: Option[Long] = {
    val committed = table.currentVersion
      .flatMap(v => table.commitTags(v).get(ReflectedTag)).map(_.toLong)
    val fastForward =
      if (!io.exists(marker)) None else Some(io.readString(marker).trim.toLong)
    (committed.toSeq ++ fastForward.toSeq).maxOption
  }

  /** Bring the matrix current with the source's head: bootstrap on
    * first call, CDF-windowed signed delta afterwards; a no-op when
    * already current.
    */
  def refresh(): Unit = source.currentVersion.foreach { cur =>
    reflectedVersion match {
      case Some(v) if v >= cur => ()
      case Some(v) =>
        applyWindow(v, cur)
      case None =>
        table.withCommitTags(Map(ReflectedTag -> cur.toString)) {
          table.init(gramOf(source.readVersion(cur), vecCol))
        }
        clearSidecarUpTo(cur)
    }
  }

  /** Drop the empty-window fast-forward sidecar once a TAGGED refresh
    * commit reaches (or passes) its value: the sidecar's information is
    * now carried by the commit tag, and leaving it behind is a trap —
    * RESTORE commits carry no tags, so after a restore of the view's
    * backing table `reflectedVersion` would promote the stale sidecar
    * and skip windows against a rolled-back matrix. (restore() on a
    * maintained view's table is still only supported in lockstep with
    * restoring its SOURCE — the signed deltas are relative — but with
    * the sidecar cleared the view re-syncs instead of silently
    * skipping.)
    */
  private def clearSidecarUpTo(committedTo: Long): Unit =
    if (io.exists(marker) && io.readString(marker).trim.toLong <= committedTo)
      io.deleteRecursively(marker)

  private def applyWindow(from: Long, to: Long): Unit = {
    val feed = source.changesBetween(from, to)
      .select(col(vecCol).as("__vec"),
        when(col(CdcTable.ChangeTypeCol).isin("insert", "update_postimage"), 1L)
          .otherwise(-1L).as("__sign"))
    if (feed.isEmpty) {
      // Empty window: nothing to apply, so a replay cannot double-apply
      // — fast-forward via the sidecar instead of burning a view version.
      io.writeAtomic(marker, to.toString)
      return
    }
    val delta = signedGramOf(feed, "__vec", "__sign")
    val merged = table.read.select("i", "j", "s").alias("a")
      .join(delta.alias("d"), Seq("i", "j"), "full_outer")
      .select(col("i"), col("j"),
        (coalesce(col("a.s"), lit(0L)) + coalesce(col("d.s"), lit(0L))).as("s"))
    // The reflected version rides THIS commit: a crash before the
    // pointer flip leaves both the matrix and the reflected version at
    // `from` (replay re-derives the same delta); after it, both at `to`.
    table.withCommitTags(Map(ReflectedTag -> to.toString)) {
      table.init(merged)
    }
    clearSidecarUpTo(to)
  }
}

object GramView {

  /** Commit-tag key carrying the reflected source version INSIDE each
    * refresh commit (atomic with the matrix — the signed delta is not
    * replay-idempotent, so a post-commit marker would double-apply).
    */
  val ReflectedTag = "gram.reflected_source_version"

  /** Empty-window fast-forward sidecar beside the view: advances the
    * reflected version WITHOUT burning a view version when a CDF window
    * carries no rows (safe — an empty window has nothing to replay).
    */
  val ReflectedMarker = "_gram_reflected"

  /** Upper-triangle Gram matrix of `df`'s vectors — the one-shot form,
    * identical cell-for-cell to the `x_gram_matrix` oracle rule.
    */
  def gramOf(df: DataFrame, vecCol: String): DataFrame =
    signedGramOf(df.select(col(vecCol).as("__vec")).withColumn("__sign", lit(1L)),
      "__vec", "__sign")

  /** Signed upper-triangle outer-product sum: each row contributes
    * `sign · q_i · q_j` (micro-quantized). Two generators, one hash
    * aggregate — every task emits ≤ d(d+1)/2 partials.
    */
  def signedGramOf(df: DataFrame, vecCol: String, signCol: String): DataFrame =
    df.select(col(signCol).as("__sign"), expr(
        s"transform($vecCol, e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
        .as("__qv"))
      .select(col("__sign"), col("__qv"),
        posexplode(col("__qv")).as(Seq("i", "qi")))
      .select(col("__sign"), col("i"), col("qi"),
        posexplode(col("__qv")).as(Seq("j", "qj")))
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("__sign") * col("qi") * col("qj")).as("s"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("s").cast("long").as("s"))
}
