package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided testdata directories
  * (TESTDATA.md). At cluster scale these would be catalog tables; the
  * engine takes plain paths so the same query code runs against any
  * scale-factor directory.
  */
object Tables {

  // Memoized per (session, sfDir, name): `spark.read.parquet` pays file
  // listing + footer schema inference every call (~100ms/table), and the
  // query packs register their views on every invocation — without this
  // cache a bench rep spends more time re-reading footers than running
  // the query. The testdata dirs are immutable, so reuse is safe; entries
  // for stopped sessions are pruned to keep the map from pinning dead
  // session state across ScalaTest suites. Pruning happens on the next
  // apply() call, so the LAST session's handful of entries stay pinned
  // once calls cease — acceptable for a bench/test harness (a few plan
  // objects); a long-lived server would prune from a session-end
  // listener instead.
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Top-level columns of one parquet file whose physical type is INT64
    * TIMESTAMP(NANOS) — the columns `nanosAsLong` surfaces as raw Long.
    * Read from the file's own footer annotation, so a genuine BIGINT
    * column is never misread as nanos and a nanos column in ANY table
    * (not just events.ts) gets the repair. One footer read per table
    * load, amortized by the table cache.
    */
  private def nanosLongCols(spark: SparkSession, file: String): Set[String] = try {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    // a vintage may ship a DIRECTORY-shaped dataset (valid for
    // spark.read.parquet): all its part files share one writer schema,
    // so any one data file's footer answers the nanos question
    val f0 = new java.io.File(file)
    val target =
      if (!f0.isDirectory) file
      else Option(f0.listFiles()).getOrElse(Array.empty)
        .find(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getPath)
        .getOrElse(file) // empty dir: let the open throw into the catch-all
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(target), conf))
    try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
        case f if f.isPrimitive &&
          (f.asPrimitiveType.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          }) => f.getName
      }.toSet
    } finally reader.close()
  } catch {
    case scala.util.control.NonFatal(e) =>
      // degrade to "no nanos repair" rather than failing the whole table
      // load: a vintage that needs the repair is single-file today, and a
      // wrong outcome here surfaces immediately as an oracle type mismatch
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"nanos-column sniff of $file failed; assuming no NANOS columns: $e")
      Set.empty
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tableCache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    tableCache.getOrElseUpdate((spark, sfDir, name), {
      // Timestamp vintages vary across testdata generations: events.ts has
      // been TIMESTAMP(NANOS) (which the vectorized reader rejects — read
      // as long via nanosAsLong and floor to micros, the same truncation
      // DuckDB applies reading nanos into its micros timestamps) and
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ).
      // Normalize BY OBSERVED TYPE to session-zoned TimestampType, the
      // type every query/oracle pair was built against — under the UTC
      // session Verify/specs pin, NTZ -> LTZ relabels the same micros.
      // Which Long columns are really nanos comes from the parquet
      // footer's own logical-type annotation, never from column names.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val file = s"$sfDir/$name.parquet"
      val df = spark.read.parquet(file)
      lazy val nanos = nanosLongCols(spark, file)
      df.schema.fields.foldLeft(df) { (d, f) =>
        f.dataType match {
          case org.apache.spark.sql.types.LongType if nanos(f.name) =>
            d.withColumn(f.name, org.apache.spark.sql.functions.expr(
              s"timestamp_micros(`${f.name}` div 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name).cast("timestamp"))
          case t if hasNestedNtz(t) =>
            // the normalization above walks TOP-LEVEL fields only; a
            // nested NTZ would silently skew every timestamp comparison,
            // so fail loudly instead (no current vintage nests timestamps)
            throw new IllegalArgumentException(
              s"$name.${f.name} nests TIMESTAMP_NTZ inside $t — top-level " +
                "normalization cannot reach it; flatten the vintage or extend Tables")
          case _ => d
        }
      }
    })
  }

  private def hasNestedNtz(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case TimestampNTZType => true
      case s: StructType    => s.fields.exists(f => hasNestedNtz(f.dataType))
      case a: ArrayType     => hasNestedNtz(a.elementType)
      case m: MapType       => hasNestedNtz(m.keyType) || hasNestedNtz(m.valueType)
      case _ => false
    }
  }

  // Corpus-size lookups drive the adaptive operating points (band widths
  // in SimilarityQueries); the testdata dirs are immutable, so the count
  // is computed once per (session, sfDir, name) instead of re-scanning on
  // every query invocation.
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Long]

  def rowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    countCache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    countCache.getOrElseUpdate((spark, sfDir, name), apply(spark, sfDir, name).count())
  }

  // (original-plan df for the reuse check, materialized df served as the view)
  private val cachedViews =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]

  // per-name locks making cacheView's get -> remove -> update sequence
  // atomic per view name: the registry invariant "no fixture-backed
  // query path touches cacheView" is what keeps the bench's concurrent
  // fixture pre-build pool safe today, but it was enforced only by
  // convention — a future cacheView call from inside a fixture builder
  // would have raced the non-atomic replace into silent lost-block
  // reads. Distinct names now serialize only against themselves (the
  // TrieMap is already safe for distinct keys); the documented
  // single-consumer contract for SAME-name re-binding while a caller
  // still holds the previous frame is unchanged.
  private val viewLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def perName(name: String): Object =
    viewLocks.getOrElseUpdate(name, new Object)

  /** Session conf key selecting how shared views materialize:
    *
    *   - `local` (default): `localCheckpoint()` — fastest, but blocks
    *     live on the executors that computed them and are NOT
    *     recomputable; on a multi-executor cluster one lost executor
    *     kills every consumer of the view. The right choice for
    *     single-node/bench runs.
    *   - `reliable`: `checkpoint()` to the SparkContext checkpoint
    *     directory — survives executor loss (re-read from storage), at
    *     the cost of a write to the checkpoint dir. The right choice on
    *     a real cluster; point `sparkContext.setCheckpointDir` at
    *     durable shared storage (HDFS/object store). If no checkpoint
    *     dir is set, one is created under java.io.tmpdir (fine locally;
    *     a cluster deployment should set its own).
    */
  val ViewCheckpointModeKey = "spark.graft.view.checkpoint"

  /** Materialize a shared view's frame per [[ViewCheckpointModeKey]]. */
  private[graft] def materializeView(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ViewCheckpointModeKey, "local") match {
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** Materialize `df` ONCE (eager localCheckpoint) and register the
    * result as temp view `name`, reusing the live materialization when
    * the SAME computation is re-requested (cross-query sharing within
    * one scale factor; the comparison runs on the ORIGINAL plan, which
    * the checkpoint would otherwise erase).
    *
    * Why a checkpoint and not `df.cache()` (the r14 fix — this function
    * used lazy cache before): Spark's CacheManager substitutes a cached
    * plan into consumers via canonicalized `sameResult`, and that lookup
    * MISSES for several of this engine's view shapes (measured: the
    * lateral-explode + higher-order-function shapes of the bigram /
    * shingle / edge views) — so consumers silently recomputed the whole
    * subtree per reference (x_pagerank re-derived its distinct-edge join
    * up to 20× per run) while the never-scanned cache entry wasted the
    * bookkeeping. A checkpointed view needs NO substitution machinery:
    * the view IS an ExistingRDD leaf, every reference reads the
    * materialized blocks by construction, and the plan-audit suite can
    * assert the leaf directly. Stale entries drop on replacement; their
    * blocks free with the RDD (context cleaner), same as every other
    * localCheckpoint in the engine.
    *
    * CONCURRENCY CONTRACT: replacement release is EAGER, and a
    * checkpoint RDD is not recomputable — a caller still holding a
    * previously returned frame (or running a query over it) when the
    * same view name is re-materialized with a different plan would read
    * lost blocks. Verify/Bench drive queries strictly sequentially, and
    * per-name plans change only across sfDirs, which also run
    * sequentially; callers embedding the engine in a concurrent driver
    * must key view names per context (e.g. suffix the sfDir) instead of
    * re-binding a live name.
    */
  def cacheView(name: String, df: DataFrame): DataFrame = perName(name).synchronized {
    val reuse = cachedViews.get(name)
      .filter(_._1.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
    reuse match {
      case Some((_, served)) =>
        served.createOrReplaceTempView(name)
        served
      case None =>
        // release the replaced entry's checkpoint blocks EAGERLY: the
        // ContextCleaner frees them only when the RDD is GC'd, so a
        // long session re-materializing views (e.g. Verify across
        // sfDirs) would otherwise accumulate executor storage memory
        cachedViews.remove(name).foreach { case (_, stale) =>
          stale.queryExecution.analyzed.foreach {
            case l: org.apache.spark.sql.execution.LogicalRDD =>
              l.rdd.unpersist(blocking = false)
              // 'reliable' mode leaves checkpoint FILES behind: the
              // ContextCleaner only tracks them when
              // spark.cleaner.referenceTracking.cleanCheckpoints is set
              // (defaults false, static conf), so a long session
              // re-materializing views would leak disk in the
              // checkpoint dir. Delete the stale RDD's directory here —
              // same single-threaded contract as the block release.
              l.rdd.getCheckpointFile.foreach { p =>
                try {
                  val path = new org.apache.hadoop.fs.Path(p)
                  path.getFileSystem(l.rdd.context.hadoopConfiguration)
                    .delete(path, true)
                } catch { case _: java.io.IOException => () }
              }
            case _ => ()
          }
        }
        val served = materializeView(df)
        served.createOrReplaceTempView(name)
        cachedViews.update(name, (df, served))
        served
    }
  }
}

/** A named pack of oracle-checked queries: each entry in `queries` has
  * either a DuckDB-equivalent SQL in `oracle` (strong hash-compare) or a
  * documented reason it is rows-only (non-SQL-expressible).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
