package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an equi-JOIN materialized view — the
  * missing piece between [[IncrementalView]] (aggregates of ONE table)
  * and what a real pipeline materializes: an enriched fact stream,
  * `fact JOIN dim` (one dimension or a star of several), kept current as
  * ALL sides merge. The reference materializes such enrichments by full
  * recompute per batch (sanpshot_script.py rebuilds its joined exports
  * end-to-end); here each refresh recomputes ONLY the view rows the
  * change feeds could have touched:
  *
  *  1. affected fact keys = keys in the fact feed, plus facts whose
  *     foreign key hits a changed key of ANY dimension;
  *  2. their true end-state rows = the plain join of those facts (at
  *     the window end) against every dimension's window-end snapshot;
  *  3. affected keys with no end-state row net to deletes.
  *
  * Because step 2 IS the recompute restricted to the affected keys, the
  * refreshed view provably equals the full recompute: a key outside the
  * affected set has an unchanged fact row whose partners' payloads are
  * also unchanged. No signed-delta netting is involved, so cancelling
  * change pairs (a fact deleted in the same window its formerly-dangling
  * partner is inserted) cannot resurrect rows.
  *
  * Refresh cost, honestly stated: the change feeds are delta-sized
  * ([[CdcTable.changesBetween]] prunes to changed months), and the fact
  * snapshot's fk-hit probe is a map-side broadcast semi-join per
  * dimension with a changed delta — over the file-skipped candidate set
  * when the changed-key sets are small (one [[FileSkipping.AnyOf]]
  * disjunction covers all dimensions' keys in one pruned scan), skipped
  * entirely for dimensions whose window is empty. Each dimension's
  * snapshot pass is the step-2 join against the broadcast delta-bounded
  * fact set, pruned by the affected foreign keys. Nothing shuffles at
  * table size. At 100 TB that is a few-files scan per side for the
  * common small-delta refresh — against recompute's full scans PLUS
  * table-sized shuffle and full view rewrite.
  *
  * Scope (the canonical fact-enrichment shape, and what makes the view
  * keyable): each join maps fact-side columns onto that DIMENSION
  * TABLE'S MERGE KEYS (`on` pairs `(factCol, dimKey)`), so every fact
  * row has at most one partner per dimension and the view is uniquely
  * keyed by the fact table's own merge keys (assumed non-null, as merge
  * keys are). Fact and dimension payload columns must not collide (nor
  * two dimensions' payloads with each other); each dimension's join-key
  * columns are dropped from the view (they duplicate the fact's foreign
  * key).
  *
  * Join flavor: INNER (facts without a full set of partners are absent)
  * or LEFT OUTER (`outer = true` — every fact row lands in the view,
  * missing partners null-padded; the reference's snapshot exports are
  * effectively left joins, every source row reaches the sink,
  * sanpshot_script.py:229-233). Under outer semantics dangling-fk churn
  * nets to an upsert-with-nulls, not a delete — only a deleted fact row
  * deletes a view row.
  *
  * The maintained view itself is a [[CdcTable]] keyed by the fact keys:
  * the refresh batch carries, per affected fact key, an upsert with the
  * current payload or a delete — applied through the same MERGE path
  * as any CDC batch, with all its pruning, versioning and time travel.
  */
object JoinView {

  /** Synthetic CDC-batch columns emitted by [[starBatch]]. */
  val OpCol = "__op"
  val TsCol = "__ts"

  /** Largest key set a snapshot pass turns into IN-list file-skipping
    * predicates ([[FileSkipping.InSet]]); a delta touching more keys
    * falls back to the plain full-version scan (an IN that large prunes
    * little and costs per-file x per-value work driver-side).
    */
  val MaxPruneKeys = 4096

  /** One dimension of a (star) join view refresh window: its change feed
    * over the window, a pruned-snapshot reader at the window end, and
    * the `(factCol, dimKey)` equi-join mapping.
    */
  final case class Dim(changes: DataFrame,
                       newFor: Seq[FileSkipping.Pred] => DataFrame,
                       on: Seq[(String, String)])

  /** A dimension [[CdcTable]] with its refresh window — the persisted
    * face [[refreshStar]] consumes. `payload`, when set, restricts the
    * dimension columns carried into the view (the join keys are always
    * kept); None carries every column. The projection is what lets a
    * dimension with audit/meta columns colliding with the fact's (e.g.
    * both sides of a CDC pipeline carry `__ts_ms`) still enrich it.
    */
  final case class StarDim(table: CdcTable, fromV: Long, toV: Long,
                           on: Seq[(String, String)],
                           payload: Option[Seq[String]] = None)

  /** Key rows that can actually equi-join: a row carrying a null in ANY
    * key column matches nothing (equi-joins are null-rejecting), so it
    * is unreachable by the lookup the predicates bound — dropped BEFORE
    * building the per-column IN lists, which both tightens the lists and
    * lets an all-null key set short-circuit to "nothing can match".
    */
  private def joinableRows(rows: Array[org.apache.spark.sql.Row]): Array[org.apache.spark.sql.Row] =
    rows.filter(r => (0 until r.length).forall(i => !r.isNullAt(i)))

  /** Per-column IN-list predicates from collected (already
    * null-row-filtered, nonempty) key rows: column `i` of every row
    * against `cols(i)`.
    */
  private def inSetPreds(cols: Seq[String],
                         rows: Array[org.apache.spark.sql.Row]): Seq[FileSkipping.Pred] =
    cols.zipWithIndex.map { case (c, i) =>
      FileSkipping.InSet(c, rows.map(_.get(i)).distinct.toSeq)
    }

  private def cond(a: DataFrame, b: DataFrame, on: Seq[(String, String)]): Column =
    on.map { case (ac, bc) => a(ac) === b(bc) }.reduce(_ && _)

  /** The full (bootstrap) computation against ONE dimension: equi-join
    * (inner, or left-outer when `outer`), fact columns plus the
    * dimension's non-join columns. The refreshed view always equals
    * this run over the tables at the refreshed-to versions.
    */
  def compute(fact: DataFrame, dim: DataFrame, on: Seq[(String, String)],
              outer: Boolean = false): DataFrame = {
    val dimJoinCols = on.map(_._2).toSet
    val payload = dim.columns.filterNot(dimJoinCols.contains).toSeq
    val collide = payload.filter(fact.columns.contains)
    require(collide.isEmpty,
      s"fact and dimension payload columns must not collide: ${collide.mkString(", ")}")
    fact.join(dim, cond(fact, dim, on), if (outer) "left_outer" else "inner")
      .select(fact.columns.toSeq.map(fact(_)) ++ payload.map(dim(_)): _*)
  }

  /** [[compute]] folded across a star of dimensions, left to right. */
  def computeStar(fact: DataFrame, dims: Seq[(DataFrame, Seq[(String, String)])],
                  outer: Boolean = false): DataFrame =
    dims.foldLeft(fact) { case (f, (d, on)) => compute(f, d, on, outer) }

  /** The view delta for one refresh window, one CDC row per affected
    * fact key: `__op` = `u` (upsert carrying the current payload) or
    * `d` (delete), ready for the view table's `merge(batch, TsCol)`.
    *
    *  - `aChanges` / `bChanges`: `changesBetween` feeds of fact and
    *    dimension covering exactly the refresh window (either may be
    *    empty).
    *  - `aNew` / `bNew`: the FACT and DIMENSION tables at the window
    *    END.
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
    * what turns the per-snapshot scans into few-files scans for the
    * common small-delta refresh — at 100 TB the difference between
    * streaming the table per refresh window and opening the handful of
    * files the window touched.
    */
  def deltaBatch(aChanges: DataFrame, aNewFor: Seq[FileSkipping.Pred] => DataFrame,
                 bChanges: DataFrame, bNewFor: Seq[FileSkipping.Pred] => DataFrame,
                 on: Seq[(String, String)], aKeys: Seq[String]): DataFrame =
    starBatch(aChanges, aNewFor, Seq(Dim(bChanges, bNewFor, on)), aKeys)

  /** The general (star) view delta: one fact, any number of dimensions,
    * inner or left-outer semantics. Cost shape: ONE pruned fact-snapshot
    * pass per dimension with a non-empty changed-key window (each a
    * map-side broadcast semi-join over the SAME [[FileSkipping.AnyOf]]-
    * pruned candidate file set), one pruned pass per dimension for the
    * step-2 join, and delta-bounded everything else. Dimensions whose
    * window is empty cost nothing at all.
    */
  def starBatch(aChanges: DataFrame, aNewFor: Seq[FileSkipping.Pred] => DataFrame,
                dims: Seq[Dim], aKeys: Seq[String],
                outer: Boolean = false): DataFrame = {
    require(dims.nonEmpty, "a join view needs at least one dimension")
    // the fact feed is used twice (post-images + touched keys) and is a
    // changed-months diff join to recompute — materialize it once
    val aCh = aChanges.localCheckpoint()
    // end-state images of facts the fact feed touched (insert/update);
    // deleted facts contribute their key to `touched` only
    val aPost = aCh.filter(col(CdcTable.ChangeTypeCol)
        .isin("insert", "update_postimage"))
      .drop(CdcTable.ChangeTypeCol)
    val aTouched = aCh.select(aKeys.map(col): _*).distinct()
    // per dimension: the changed keys drive BOTH the fk-hit probe and
    // the fact-snapshot pruning predicates — materialize once, collect
    // with a cap (delta-bounded; past the cap pruning stops paying
    // anyway). Null-keyed changed rows can never equi-join a fact, so
    // they are dropped up front; a dimension whose usable key set is
    // empty (and not over the cap) costs NO fact pass at all.
    case class DimKeys(dim: Dim, keyDf: DataFrame,
                       usable: Array[org.apache.spark.sql.Row], overCap: Boolean)
    val spark = aChanges.sparkSession
    val dimKeys = dims.map { d =>
      val keyPlan = d.changes.select(d.on.map(p => col(p._2)): _*).distinct()
      // collect FIRST (one capped job per dimension): under the cap the
      // collected rows ARE the key set, so the marker-join side below is
      // a LocalRelation — no localCheckpoint job, no shuffle read, and a
      // build side Catalyst broadcasts for free. Only an over-cap
      // dimension (pruning stops paying anyway) still checkpoints the
      // full distinct-key frame. Previously every dimension paid
      // checkpoint + collect = two driver jobs over the change feed.
      val rows = keyPlan.limit(MaxPruneKeys + 1).collect()
      val overCap = rows.length > MaxPruneKeys
      val keyDf =
        if (overCap) keyPlan.localCheckpoint()
        else spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), keyPlan.schema)
      DimKeys(d, keyDf, joinableRows(rows), overCap)
    }
    val active = dimKeys.filter(k => k.overCap || k.usable.nonEmpty)
    // facts (unchanged by the fact feed) whose fk hits a changed dim key:
    // map-side passes over the fact snapshot — file-skipped to the union
    // of the changed keys' candidate files when every active key set is
    // small (one AnyOf disjunction covers all dimensions), skipped
    // entirely when no dimension changed; the changed-key and
    // touched-key sets broadcast. Renamed probe columns keep the
    // semi-joins correlation-safe if fact and dims share column names.
    val aNew =
      if (active.isEmpty) aNewFor(Nil).filter(lit(false))
      else if (active.exists(_.overCap)) aNewFor(Nil)
      else {
        val branches = active.map(k => inSetPreds(k.dim.on.map(_._1), k.usable))
        aNewFor(if (branches.length == 1) branches.head
                else Seq(FileSkipping.AnyOf(branches)))
      }
    // ONE chained pass instead of a semi-join per dimension: each
    // dimension's (distinct-keyed) change-key set left-outer joins onto
    // the fact snapshot carrying a `__hit_i` marker, and a fact row is
    // affected when ANY marker landed. The previous shape ran a separate
    // semi-join per dimension — re-executing the fact snapshot scan N
    // times — then a dropDuplicates SHUFFLE to un-double facts hit by two
    // dimensions; here the snapshot scans once, the key sets broadcast
    // (delta-bounded) or shuffle per join exactly as the semi-joins did,
    // and no dedup is needed because each fact row flows through the
    // chain exactly once (key sets are distinct tuples, so an outer join
    // can never fan out).
    val hitMarks = active.indices.map(i => s"__hit$i")
    val marked = active.zipWithIndex.foldLeft(aNew) { case (acc, (k, i)) =>
      val bKeyed = k.dim.on.zipWithIndex.foldLeft(k.keyDf) {
        case (d, ((_, bc), j)) => d.withColumnRenamed(bc, s"__bk${i}_$j")
      }.withColumn(s"__hit$i", lit(1))
      val hit = k.dim.on.zipWithIndex.map { case ((ac, _), j) =>
        acc(ac) === bKeyed(s"__bk${i}_$j")
      }.reduce(_ && _)
      acc.join(bKeyed, hit, "left_outer")
        .drop(k.dim.on.indices.map(j => s"__bk${i}_$j"): _*)
    }
    val aDimHit = (if (active.isEmpty) aNew // already the empty-filtered snapshot
      else marked.filter(hitMarks.map(c => col(c).isNotNull).reduce(_ || _))
        .drop(hitMarks: _*))
      .join(aTouched, aKeys, "left_anti")
    // end-state fact rows for every affected key that still exists;
    // aPost carries the feed's (union) schema, aDimHit the end-version
    // schema — null-pad to their union like any evolved read would.
    // ONE checkpoint materializes the whole fact-snapshot subtree (the
    // per-dimension fk collects below, the final compute and the
    // affected-key set all read it); the previous separate aDimHit
    // checkpoint paid an extra materialization job for a frame factEnd
    // fully contains.
    val factEnd = aPost.unionByName(aDimHit, allowMissingColumns = true).localCheckpoint()
    // each dimension's snapshot pass reads only files that can hold a
    // partner of an affected fact: the affected fks are delta-bounded,
    // so collect them (same cap) and push them down as IN-list skipping
    // predicates on that dimension's key columns. An all-null (or empty)
    // fk set can join nothing — the pass is skipped outright.
    val bNews = dims.map { d =>
      val fkRows = factEnd.select(d.on.map(p => col(p._1)): _*).distinct()
        .limit(MaxPruneKeys + 1).collect()
      val usable = joinableRows(fkRows)
      val bNew =
        if (fkRows.length > MaxPruneKeys) d.newFor(Nil)
        else if (usable.isEmpty) d.newFor(Nil).filter(lit(false))
        else d.newFor(inSetPreds(d.on.map(_._2), usable))
      (bNew, d.on)
    }
    // the restricted recompute: exactly the view rows that should exist
    val current = computeStar(factEnd, bNews, outer).localCheckpoint()
    // affected = aTouched ∪ aDimHit-keys, and since the feed's post-image
    // keys are a subset of aTouched, factEnd's keys (aPost ∪ aDimHit)
    // union aTouched to the same set — read from the checkpoint instead
    // of re-deriving aDimHit
    val affected = aTouched
      .unionByName(factEnd.select(aKeys.map(col): _*))
      .distinct()
    // an affected key with no recomputed row has lost its fact row (or,
    // inner flavor, a partner) — delete (a no-op if the view never had it)
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
              on: Seq[(String, String)], refreshTs: java.sql.Timestamp): Unit =
    refresh(view, fact, fromA, toA, dim, fromB, toB, on, refreshTs, outer = false)

  /** [[refresh]] with an explicit join flavor (`outer = true` keeps
    * partner-less facts, null-padded).
    */
  def refresh(view: CdcTable, fact: CdcTable, fromA: Long, toA: Long,
              dim: CdcTable, fromB: Long, toB: Long,
              on: Seq[(String, String)], refreshTs: java.sql.Timestamp,
              outer: Boolean): Unit =
    refreshStar(view, fact, fromA, toA, Seq(StarDim(dim, fromB, toB, on)),
      refreshTs, outer)

  /** Star refresh: one fact window against any number of dimension
    * windows in ONE batch — fact + N dims churn together, the persisted
    * view lands equal to the full N-way recompute at the window-end
    * versions. Every snapshot pass goes through the tables' stats-pruned
    * version-pinned scans.
    */
  def refreshStar(view: CdcTable, fact: CdcTable, fromA: Long, toA: Long,
                  dims: Seq[StarDim], refreshTs: java.sql.Timestamp,
                  outer: Boolean = false): Unit = {
    val batch = starBatch(
      fact.changesBetween(fromA, toA), preds => fact.readWhereAt(toA, preds),
      dims.map { d =>
        // payload projection: applied to BOTH the change feed (changed
        // keys only need the key columns anyway) and the snapshot pass,
        // so dropped dimension columns never reach the view. A feed
        // entry whose diff lies entirely in dropped columns yields a
        // same-payload upsert — harmless under the keyed merge.
        val feed = d.table.changesBetween(d.fromV, d.toV)
        // a configured payload column must exist SOMEWHERE in the window
        // (the feed carries the union schema of both versions, so a
        // column mid-evolution still passes); a name in no version is a
        // typo that would otherwise be silently dropped from the view
        d.payload.foreach { cs =>
          val missing = cs.filterNot(feed.columns.contains)
          require(missing.isEmpty,
            s"star dimension payload columns ${missing.mkString("[", ",", "]")} " +
              s"do not exist in the dimension's schema over window " +
              s"v${d.fromV}->v${d.toV} (${feed.columns.mkString(", ")}) — a " +
              "misspelled payload column would silently vanish from the view")
        }
        val proj: DataFrame => DataFrame = d.payload match {
          case Some(cs) =>
            val keep = (d.on.map(_._2) ++ cs).distinct
            // per-DataFrame filter stays: the toV snapshot may not carry a
            // column that only the window's FROM side held (evolution) —
            // validated above, so anything filtered here is that case
            df => df.select(keep.filter(df.columns.contains)
              .++(Seq(CdcTable.ChangeTypeCol).filter(df.columns.contains))
              .map(col): _*)
          case None => identity
        }
        Dim(proj(feed),
          preds => proj(d.table.readWhereAt(d.toV, preds)), d.on)
      },
      fact.keys, outer)
      .withColumn(TsCol, lit(refreshTs))
    // starBatch emits exactly one CDC row per affected fact key (the
    // restricted recompute is uniquely keyed; deletes are the anti-joined
    // complement), so the merge's latest-wins dedup pass — a full
    // shuffle + aggregation of the batch — is provably the identity
    view.mergePreDeduped(batch)
  }
}
