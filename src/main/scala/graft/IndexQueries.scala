package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Index-accelerated scale operators: a k-means-trained IVF coarse
  * quantizer for ANN (replacing the data's given `label` column with
  * learned lists + multi-list probing), corpus-level line/segment
  * deduplication (the CCNet/Gopher-style boilerplate pass), and a
  * Bloom-filter semi-join pruning harness.
  *
  * Scale design:
  *  - k-means runs as unrolled Lloyd rounds — each round is one
  *    vectors-x-centroids broadcast join (k rows broadcast, never a
  *    shuffle of the corpus) plus one per-dimension aggregation that
  *    combines map-side. At 100 TB the centroid table stays tiny (k x
  *    dims), so training cost is O(rounds) corpus scans and search cost
  *    is bounded by the probed lists, never the corpus.
  *  - line dedup is one hash groupBy on an 8-byte segment hash (map-side
  *    combinable) plus one equi-join back — the standard corpus
  *    boilerplate pass shape.
  *  - the Bloom harness builds a fixed 65536-bit filter (2048 x 32-bit
  *    words) from the small side and probes the big side through it; at
  *    100 TB the filter broadcasts and the probe is map-side, replacing
  *    a full shuffle semi-join with a scan-local filter. The query
  *    value-checks the filter's soundness (zero false negatives) and
  *    reports the measured false-positive rate.
  *
  * Determinism across engines (see graft-determinism conventions):
  * integer-quantized embeddings, integer dot products, centroid means
  * re-quantized to BIGINT through a single IEEE division + floor, 60-bit
  * md5 hashes for segments and Bloom positions, total-ordered windows.
  */
object IndexQueries extends QueryPack {
  import TextQueries.{h64, duckH64}
  import SimilarityQueries.{sparkQsel, duckQsel}

  private def docs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  private def embs(s: SparkSession, dir: String, sql: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    s.sql(sql)
  }

  /** [[embs]] plus the trained-model views the query serves from (the
    * setup lines repeat because training itself needs the embeddings
    * view registered before [[embs]] runs the final statement).
    */
  private def embsTrained(s: SparkSession, dir: String, km: Boolean, pq: Boolean)
                         (sql: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    if (km) kmeansViews(s, dir)
    if (pq) pqViews(s, dir)
    embs(s, dir, sql)
  }

  private def ordersLineitem(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(sql)
  }

  // ---------------------------------------------------------------------
  // k-means IVF: quantized vectors -> 16 deterministic seeds -> two
  // unrolled Lloyd rounds -> final assignment `af` + trained centroids
  // `c2`. Seeds are the 16 vectors with the smallest salted hash
  // (`sd` CTE; see sparkKmeans), so the same pseudo-random 16 rows seed
  // both engines at any scale factor. Assignment
  // minimizes ||x-c||^2 = x.x - 2 x.c + c.c (x.x constant per x, so the
  // argmin needs only the last two integer terms); ties break on cid.
  // Updated centroids re-quantize to integers via one IEEE division and
  // floor(+0.5), keeping every later dot product exact.
  // ---------------------------------------------------------------------
  private val sparkQuantV =
    """q AS (SELECT vec_id, label, transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qe FROM embeddings),
      |v AS (SELECT vec_id, label, qe, dot_i64(qe, qe) AS nrm FROM q)""".stripMargin

  private val duckQuantV =
    """q AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qe FROM embeddings),
      |v AS (SELECT vec_id, label, qe, CAST(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) AS BIGINT) AS nrm FROM q)""".stripMargin

  /** One Spark Lloyd assignment CTE: nearest centroid in `cent` for every
    * row of `vtab` (broadcastable k-row side; integer distance terms).
    */
  private def sparkAssign(name: String, cent: String, vtab: String = "v"): String =
    s"""$name AS (
       |  SELECT vec_id, qe, cid FROM (
       |    SELECT v.vec_id, v.qe, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY dot_i64(c.ce, c.ce) - 2 * dot_i64(v.qe, c.ce), c.cid) AS rnk
       |    FROM $vtab v CROSS JOIN $cent c) WHERE rnk = 1)""".stripMargin

  // the distance projects to a SCALAR before the argmin window: carrying
  // the 64-element lists through an n x k window materialized ~45 GB at
  // sf1 (20k vectors x 313 adaptive cells) and non-spillably OOM'd
  // DuckDB; with scalar window input the same chain runs in megabytes.
  // The per-vector qe re-joins after the pick.
  private def duckAssign(name: String, cent: String, vtab: String = "v"): String =
    s"""${name}_d AS (
       |  SELECT v.vec_id, c.cid,
       |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT)
       |      - 2 * CAST(list_dot_product(v.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS dist
       |  FROM $vtab v CROSS JOIN $cent c),
       |${name}_pick AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rnk
       |    FROM ${name}_d) q WHERE rnk = 1),
       |$name AS (
       |  SELECT p.vec_id, v2.qe, p.cid
       |  FROM ${name}_pick p JOIN $vtab v2 ON v2.vec_id = p.vec_id)""".stripMargin

  /** One Spark centroid-update CTE pair: per-dimension integer means of
    * the members assigned in `asg`, folded back into a k-row array table.
    */
  private def sparkUpdate(exp: String, mean: String, out: String, asg: String): String =
    s"""$exp AS (SELECT cid, d, x FROM $asg LATERAL VIEW posexplode(qe) t AS d, x),
       |$mean AS (SELECT cid, d, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
       |  FROM $exp GROUP BY cid, d),
       |$out AS (SELECT cid, transform(array_sort(collect_list(struct(d, m))), s -> s.m) AS ce
       |  FROM $mean GROUP BY cid)""".stripMargin

  private def duckUpdate(exp: String, mean: String, out: String, asg: String): String =
    s"""$exp AS (SELECT cid, qe, unnest(generate_series(1, len(qe))) AS i FROM $asg),
       |$mean AS (SELECT cid, i - 1 AS d, CAST(floor(CAST(sum(qe[i]) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
       |  FROM $exp GROUP BY cid, i),
       |$out AS (SELECT cid, array_agg(m ORDER BY d) AS ce FROM $mean GROUP BY cid)""".stripMargin

  /** Full Spark training chain: seeds -> (assign, update) x2 -> final
    * assignment `af` over trained centroids `c2`. Seeds are the 16
    * vectors with the smallest salted hash — a deterministic
    * pseudo-random pick that plans as a map-side-combinable top-k
    * (TakeOrdered), never a global sort; the tiny 16-row window that
    * numbers them is the only window in the chain.
    */
  private val sparkKmeans =
    s"""sd AS (SELECT vec_id, qe, ${h64("concat('seed_', vec_id)")} AS hv
       |  FROM v ORDER BY hv, vec_id LIMIT 16),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY hv, vec_id) - 1 AS BIGINT) AS cid, qe AS ce FROM sd),
       |${sparkAssign("a1", "c0")},
       |${sparkUpdate("e1", "m1", "c1", "a1")},
       |${sparkAssign("a2", "c1")},
       |${sparkUpdate("e2", "m2", "c2", "a2")},
       |${sparkAssign("af", "c2")}""".stripMargin

  private val duckKmeans =
    s"""sd AS (SELECT vec_id, qe, ${duckH64("'seed_' || vec_id::VARCHAR")} AS hv
       |  FROM v ORDER BY hv, vec_id LIMIT 16),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY hv, vec_id) - 1 AS BIGINT) AS cid, qe AS ce FROM sd),
       |${duckAssign("a1", "c0")},
       |${duckUpdate("e1", "m1", "c1", "a1")},
       |${duckAssign("a2", "c1")},
       |${duckUpdate("e2", "m2", "c2", "a2")},
       |${duckAssign("af", "c2")}""".stripMargin

  /** Parametric training chain over any (vec_id, qe) table: the same
    * seeds -> (assign, update) x2 -> final-assignment recipe with CTE
    * names prefixed, so several codebooks coexist in one statement —
    * product quantization trains one per subspace.
    */
  /** Exposed to [[graft.ops.IvfIndex]], whose codebook training must be
    * THIS exact deterministic recipe (same seeds, same two Lloyd rounds)
    * so an incrementally-maintained index is comparable row-for-row with
    * the query-pack's one-shot training.
    */
  private[graft] def sparkKmeansFor(p: String, vtab: String, k: Int = 16): String =
    s"""${p}sd AS (SELECT vec_id, qe, ${h64("concat('seed_', vec_id)")} AS hv
       |  FROM $vtab ORDER BY hv, vec_id LIMIT $k),
       |${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY hv, vec_id) - 1 AS BIGINT) AS cid, qe AS ce FROM ${p}sd),
       |${sparkAssign(s"${p}a1", s"${p}c0", vtab)},
       |${sparkUpdate(s"${p}e1", s"${p}m1", s"${p}c1", s"${p}a1")},
       |${sparkAssign(s"${p}a2", s"${p}c1", vtab)},
       |${sparkUpdate(s"${p}e2", s"${p}m2", s"${p}c2", s"${p}a2")},
       |${sparkAssign(s"${p}af", s"${p}c2", vtab)}""".stripMargin

  private def duckKmeansFor(p: String, vtab: String, k: Int = 16): String =
    s"""${p}sd AS (SELECT vec_id, qe, ${duckH64("'seed_' || vec_id::VARCHAR")} AS hv
       |  FROM $vtab ORDER BY hv, vec_id LIMIT $k),
       |${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY hv, vec_id) - 1 AS BIGINT) AS cid, qe AS ce FROM ${p}sd),
       |${duckAssign(s"${p}a1", s"${p}c0", vtab)},
       |${duckUpdate(s"${p}e1", s"${p}m1", s"${p}c1", s"${p}a1")},
       |${duckAssign(s"${p}a2", s"${p}c1", vtab)},
       |${duckUpdate(s"${p}e2", s"${p}m2", s"${p}c2", s"${p}a2")},
       |${duckAssign(s"${p}af", s"${p}c2", vtab)}""".stripMargin

  // ADC-shortlist -> exact-re-rank -> recall-vs-brute CTE chain shared by
  // the PQ queries: consumes an `adc(query_id, neighbor_id, adot, rnrm)`
  // CTE and yields `hits(query_id, hit)` (plus pq_top/brute_top). One
  // definition, referenced by x_ann_pq and x_ann_ivfpq in both engines.
  private val sparkPqRecall =
    """pq_short AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY CAST(adot AS DOUBLE) / sqrt(CAST(rnrm AS DOUBLE)) DESC, neighbor_id) AS rank
      |    FROM adc) t WHERE rank <= 50),
      |rer AS (
      |  SELECT sh.query_id, sh.neighbor_id,
      |    CAST(dot_i64(qv.qe, nv.qe) AS DOUBLE)
      |      / (sqrt(CAST(qv.nrm AS DOUBLE)) * sqrt(CAST(nv.nrm AS DOUBLE))) AS cos
      |  FROM pq_short sh JOIN v qv ON qv.vec_id = sh.query_id
      |                   JOIN v nv ON nv.vec_id = sh.neighbor_id),
      |pq_top AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM rer) t WHERE rank <= 5),
      |brute AS (
      |  SELECT q2.vec_id AS query_id, v2b.vec_id AS neighbor_id,
      |    CAST(dot_i64(q2.qe, v2b.qe) AS DOUBLE)
      |      / (sqrt(CAST(q2.nrm AS DOUBLE)) * sqrt(CAST(v2b.nrm AS DOUBLE))) AS cos
      |  FROM qsel q2
      |  JOIN v v2b ON q2.vec_id != v2b.vec_id),
      |brute_top AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM brute) t WHERE rank <= 5),
      |hits AS (
      |  SELECT b.query_id, count(l.neighbor_id) AS hit
      |  FROM brute_top b LEFT JOIN pq_top l
      |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
      |  GROUP BY b.query_id)""".stripMargin

  private val duckPqRecall =
    """pq_short AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY CAST(adot AS DOUBLE) / sqrt(CAST(rnrm AS DOUBLE)) DESC, neighbor_id) AS rank
      |    FROM adc) t WHERE rank <= 50),
      |rer AS (
      |  SELECT sh.query_id, sh.neighbor_id,
      |    CAST(list_dot_product(qv.qe::DOUBLE[], nv.qe::DOUBLE[]) AS DOUBLE)
      |      / (sqrt(CAST(qv.nrm AS DOUBLE)) * sqrt(CAST(nv.nrm AS DOUBLE))) AS cos
      |  FROM pq_short sh JOIN v qv ON qv.vec_id = sh.query_id
      |                   JOIN v nv ON nv.vec_id = sh.neighbor_id),
      |pq_top AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM rer) t WHERE rank <= 5),
      |brute AS (
      |  SELECT q2.vec_id AS query_id, v2b.vec_id AS neighbor_id,
      |    CAST(list_dot_product(q2.qe::DOUBLE[], v2b.qe::DOUBLE[]) AS DOUBLE)
      |      / (sqrt(CAST(q2.nrm AS DOUBLE)) * sqrt(CAST(v2b.nrm AS DOUBLE))) AS cos
      |  FROM qsel q2
      |  JOIN v v2b ON q2.vec_id != v2b.vec_id),
      |brute_top AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM brute) t WHERE rank <= 5),
      |hits AS (
      |  SELECT b.query_id, count(l.neighbor_id) AS hit
      |  FROM brute_top b LEFT JOIN pq_top l
      |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
      |  GROUP BY b.query_id)""".stripMargin

  // ------------------------------------------------------------------
  // Trained-model materialization: the k-means codebooks / assignments
  // are INDEX ARTIFACTS — trained once, served by many queries — so
  // they materialize once per (session, sfDir) and register as temp
  // views (`km_c2`/`km_af` for the 16-list coarse quantizer, `pq_*` for
  // the two 64-centroid PQ codebooks), the same shared-artifact pattern
  // as the cached MinHash signature view. localCheckpoint, NOT
  // Tables.cacheView: the training plans contain SQL CTEs, which the
  // Spark 4.1.2 cache-manager dedup crashes on (InlineCTE /
  // DeduplicateRelations). The tables are tiny (k x dims codebooks, one
  // (vec_id, qe, cid) row per vector). The DuckDB oracles keep their
  // inline CTE chains — same math, results identical; x_ann_ivfpq's
  // coarse quantizer reuses km_c2/km_af because kmeansFor("g", "v") is
  // the same seeds/rounds chain modulo CTE names.
  // ------------------------------------------------------------------
  private val trained = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  // synchronized: getOrElseUpdate alone could run the multi-second
  // training thunk twice (and orphan one checkpoint's blocks) under
  // concurrent first access; the runners are sequential today but the
  // guard costs nothing on the memoized path
  private def trainedView(s: SparkSession, dir: String, name: String)(sql: => String): Unit =
    trained.synchronized {
      trained.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
      trained.getOrElseUpdate((s, dir, name), Tables.materializeView(s.sql(sql)))
        .createOrReplaceTempView(name)
    }

  // one full training per model: the codebook view trains and
  // checkpoints first, then the assignment view is ONE assignment pass
  // against the registered codebook (not a second training run); both
  // store only what consumers read (codebooks: (cid, ce); assignments:
  // (vec_id, cid) — every serving query joins v for vectors)
  private def kmeansViews(s: SparkSession, dir: String): Unit = {
    trainedView(s, dir, "km_c2")(
      s"WITH $sparkQuantV,\n$sparkKmeans\nSELECT cid, ce FROM c2")
    trainedView(s, dir, "km_af")(
      s"WITH $sparkQuantV,\n${sparkAssign("af", "km_c2")}\nSELECT vec_id, cid FROM af")
  }

  private val sparkHalves =
    """v1 AS (SELECT vec_id, slice(qe, 1, CAST(size(qe) DIV 2 AS INT)) AS qe FROM v),
      |v2 AS (SELECT vec_id, slice(qe, CAST(size(qe) DIV 2 + 1 AS INT), CAST(size(qe) - size(qe) DIV 2 AS INT)) AS qe FROM v)""".stripMargin

  private def pqViews(s: SparkSession, dir: String): Unit =
    Seq("p1" -> "v1", "p2" -> "v2").foreach { case (p, half) =>
      trainedView(s, dir, s"pq_${p}c2")(
        s"WITH $sparkQuantV,\n$sparkHalves,\n${sparkKmeansFor(p, half, 64)}\nSELECT cid, ce FROM ${p}c2")
      trainedView(s, dir, s"pq_${p}af")(
        s"WITH $sparkQuantV,\n$sparkHalves,\n${sparkAssign(s"${p}af", s"pq_${p}c2", half)}\nSELECT vec_id, cid FROM ${p}af")
    }

  // Query-side probing: each query (the shared count-bounded qsel set —
  // the 100 smallest-salted-hash vectors) probes its nprobe=3 nearest
  // trained centroids; candidates are the probed lists' members,
  // reranked by exact cosine.
  private val sparkKmeansScored =
    s"""$sparkQsel,
       |probes AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT qv.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY qv.vec_id
       |        ORDER BY dot_i64(c.ce, c.ce) - 2 * dot_i64(qv.qe, c.ce), c.cid) AS rnk
       |    FROM qsel qv CROSS JOIN km_c2 c) WHERE rnk <= 3),
       |cand AS (
       |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN km_af a ON a.cid = p.cid AND a.vec_id != p.vec_id),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    dot_i64(qv.qe, nv.qe) AS dot, qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  private val duckKmeansScored =
    s"""$duckKmeans,
       |$duckQsel,
       |probes AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT qv.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY qv.vec_id
       |        ORDER BY CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT)
       |          - 2 * CAST(list_dot_product(qv.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT), c.cid) AS rnk
       |    FROM qsel qv CROSS JOIN c2 c) WHERE rnk <= 3),
       |cand AS (
       |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN af a ON a.cid = p.cid AND a.vec_id != p.vec_id),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(list_dot_product(qv.qe::DOUBLE[], nv.qe::DOUBLE[]) AS BIGINT) AS dot,
       |    qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  // ------------------------------------------------------------------
  // Incrementally-maintained IVF index (ops.IvfIndex): codebook trained
  // ONCE on the bootstrap snapshot (the sparkKmeansFor recipe, so it
  // matches DuckDB's re-derivation exactly), lists kept current from
  // the vector table's change feed through one churn window — updates
  // that move vectors between lists, deletes, fresh inserts. The oracle
  // trains on the ORIGINAL embeddings table (the bootstrap state) and
  // assigns the replayed post-churn state: maintained must equal that
  // recompute row-for-row.
  // ------------------------------------------------------------------
  private val ivfIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.ops.IvfIndex]

  private def maintainedIvf(s: SparkSession, dir: String): graft.ops.IvfIndex =
    ivfIndexes.synchronized {
      ivfIndexes.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      ivfIndexes.getOrElseUpdate((s, dir), {
        import org.apache.spark.sql.functions._
        val root = java.nio.file.Files.createTempDirectory("graft_ivf").toString
        val embsDf = Tables(s, dir, "embeddings")
        val source = new graft.ops.CdcTable(s, s"$root/vectors", Seq("vec_id"), retainVersions = 5)
        source.init(embsDf)
        val idx = new graft.ops.IvfIndex(s, s"$root/ivf", k = 16)
        idx.build(source)
        val slot = col("vec_id") % 10
        source.merge(
          embsDf.filter(slot < 2)
            .withColumn("embedding", reverse(col("embedding")))
            .withColumn("__op", lit("u"))
            .unionByName(embsDf.filter(slot === 2 || slot === 3).withColumn("__op", lit("d")))
            .unionByName(embsDf.filter(slot >= 8)
              .withColumn("vec_id", col("vec_id") + lit(1000000000L))
              .withColumn("__op", lit("c")))
            .withColumn("v_ts", lit(java.sql.Timestamp.valueOf("2001-01-02 00:00:00"))),
          "v_ts")
        idx.refresh(source)
        idx
      })
    }

  /** Cell count for semantic dedup: smallest power of two in [16, 4096]
    * keeping expected cell occupancy <= 64 vectors — so within-cell pair
    * generation stays O(n x 64) at ANY corpus size (SemDeDup's k ~ n
    * scaling rule), instead of O(n^2 / 16) at a frozen k. Integer-exact;
    * the DuckDB oracle computes the identical rule from its own count(*).
    */
  private[graft] def adaptiveCells(n: Long): Int =
    (4 to 12).map(1 << _).find(k => n <= 64L * k).getOrElse(4096)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_ann_index_incremental" -> ((s, dir) =>
      maintainedIvf(s, dir).lists.read.select("vec_id", "cid")),

    // SemDeDup-style semantic dedup: k-means cells (corpus-adaptive k,
    // adaptiveCells) bound pair generation to within-cell candidates;
    // cosine edges >= 0.4 over the quantized vectors; connected
    // components pick ONE representative (min vec_id) per semantic
    // group. Never an all-pairs step: candidates are a cid-equality
    // self-join with O(64) expected occupancy per cell, and the only
    // corpus-wide operations are the broadcast centroid assignment and
    // a broadcast anti-join for singletons.
    "x_dedup_semantic" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val k = adaptiveCells(Tables.rowCount(s, dir, "embeddings"))
      graft.functions.VectorFunctions.register(s)
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      trainedView(s, dir, "sem_cells")(
        s"WITH $sparkQuantV,\n${sparkKmeansFor("sem_", "v", k)}\nSELECT vec_id, cid FROM sem_af")
      val edges = s.sql(
        s"""WITH $sparkQuantV,
           |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2
           |  FROM sem_cells a JOIN sem_cells b ON a.cid = b.cid AND a.vec_id < b.vec_id)
           |SELECT p.d1, p.d2
           |FROM pairs p JOIN v x ON x.vec_id = p.d1 JOIN v y ON y.vec_id = p.d2
           |WHERE CAST(dot_i64(x.qe, y.qe) AS DOUBLE)
           |  / (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE))) >= 0.4""".stripMargin)
        .localCheckpoint()
      SimilarityQueries.connectedComponents(edges)
        .select(col("node").as("vec_id"), col("label").as("rep_id"))
        .createOrReplaceTempView("sem_comp")
      s.sql(
        """SELECT vec_id, rep_id, vec_id = rep_id AS kept FROM sem_comp
          |UNION ALL
          |SELECT e.vec_id, e.vec_id AS rep_id, true AS kept
          |FROM embeddings e LEFT ANTI JOIN sem_comp c ON c.vec_id = e.vec_id""".stripMargin)
    }),

    // k-means-trained IVF ANN: top-5 by exact cosine within the nprobe=3
    // probed lists. The trained-quantizer upgrade of x_ann_ivf (whose
    // given-label lists have no geometric meaning — recall 0.12): same
    // partition-bounded probe cost shape, learned lists.
    "x_ann_ivf_kmeans" -> ((s, dir) => embsTrained(s, dir, km = true, pq = false)(
      s"""WITH $sparkQuantV,
         |$sparkKmeansScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // Recall + scan-cost row for the k-means IVF: recall@5 vs brute force
    // and the fraction of the corpus scanned — the fourth point on the
    // ANN operating-point dashboard (sf0.01, 100-query qsel set:
    // kmeans-IVF 0.50/0.19 vs single-probe LSH 0.45, multi-probe LSH
    // 0.67/0.42, label-IVF 0.12).
    "x_ann_recall_kmeans" -> ((s, dir) => embsTrained(s, dir, km = true, pq = false)(
      s"""WITH $sparkQuantV,
         |$sparkKmeansScored,
         |ivf_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM scored) t WHERE rank <= 5),
         |brute AS (
         |  SELECT q2.vec_id AS query_id, v2.vec_id AS neighbor_id,
         |    CAST(dot_i64(q2.qe, v2.qe) AS DOUBLE)
         |      / (sqrt(CAST(q2.nrm AS DOUBLE)) * sqrt(CAST(v2.nrm AS DOUBLE))) AS cos
         |  FROM qsel q2
         |  JOIN v v2 ON q2.vec_id != v2.vec_id),
         |brute_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM brute) t WHERE rank <= 5),
         |hits AS (
         |  SELECT b.query_id, count(l.neighbor_id) AS hit
         |  FROM brute_top b LEFT JOIN ivf_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id),
         |scan AS (SELECT count(*) AS n_cand FROM cand),
         |corpus AS (SELECT count(*) AS n FROM v)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(s.n_cand) AS BIGINT) AS n_candidates,
         |  CAST(max(s.n_cand) AS DOUBLE) / (count(*) * (max(c.n) - 1)) AS scanned_frac
         |FROM hits CROSS JOIN scan s CROSS JOIN corpus c""".stripMargin)),

    // Product quantization ANN with exact re-rank: each vector
    // compresses to a 2-subspace code (64 centroids per half via the
    // shared k-means recipe — 12 bits total); queries score the corpus
    // by asymmetric distance (ADC: dot(query_half, centroid) looked up
    // from a 64-row table per subspace and summed — no full-width vector
    // arithmetic per candidate), keep an ADC top-50 shortlist, and only
    // the shortlist is re-ranked with exact cosine — the standard
    // PQ + refine topology. The memory story at 100 TB: the scanned
    // index holds ~1.5 bytes per vector plus two 64-row codebooks; full
    // vectors are touched only to (re)train, encode, and re-rank 50
    // rows per query. Emits recall@5 vs exact brute force and the
    // number of distinct codes in use. All ranking terms are exact
    // integer dots; ties break on neighbor_id.
    "x_ann_pq" -> ((s, dir) => embsTrained(s, dir, km = false, pq = true)(
      s"""WITH $sparkQuantV,
         |$sparkHalves,
         |$sparkQsel,
         |qs AS (SELECT vec_id FROM qsel),
         |d1 AS (SELECT q.vec_id AS query_id, c.cid, dot_i64(s1.qe, c.ce) AS qdot, dot_i64(c.ce, c.ce) AS cnrm
         |  FROM qs q JOIN v1 s1 ON s1.vec_id = q.vec_id CROSS JOIN pq_p1c2 c),
         |d2 AS (SELECT q.vec_id AS query_id, c.cid, dot_i64(s2.qe, c.ce) AS qdot, dot_i64(c.ce, c.ce) AS cnrm
         |  FROM qs q JOIN v2 s2 ON s2.vec_id = q.vec_id CROSS JOIN pq_p2c2 c),
         |adc AS (
         |  SELECT d1.query_id, a1.vec_id AS neighbor_id,
         |    d1.qdot + d2.qdot AS adot, d1.cnrm + d2.cnrm AS rnrm
         |  FROM pq_p1af a1 JOIN pq_p2af a2 ON a2.vec_id = a1.vec_id
         |  JOIN d1 ON d1.cid = a1.cid
         |  JOIN d2 ON d2.query_id = d1.query_id AND d2.cid = a2.cid
         |  WHERE a1.vec_id != d1.query_id),
         |$sparkPqRecall,
         |codes AS (SELECT CAST(count(*) AS BIGINT) AS n_codes FROM (
         |  SELECT DISTINCT a1.cid AS cx, a2.cid AS cy
         |  FROM pq_p1af a1 JOIN pq_p2af a2 ON a2.vec_id = a1.vec_id) t)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(c.n_codes) AS BIGINT) AS n_codes_used
         |FROM hits CROSS JOIN codes c""".stripMargin)),

    // IVF + PQ + refine — the complete composed ANN topology: a coarse
    // 16-list quantizer prunes WHICH vectors are considered (nprobe=3),
    // PQ codes bound the MEMORY touched per considered vector (two 64-row
    // ADC lookup tables), and an exact re-rank of the ADC top-50 restores
    // precision. At 100 TB: probe cost = nprobe/16 of the corpus codes
    // (~1.5 bytes/vector), full vectors read for 50 rows per query.
    // Emits recall@5 vs brute force plus the candidate scan fraction.
    "x_ann_ivfpq" -> ((s, dir) => embsTrained(s, dir, km = true, pq = true)(
      s"""WITH $sparkQuantV,
         |$sparkHalves,
         |$sparkQsel,
         |qs AS (SELECT vec_id FROM qsel),
         |probes AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT qv.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY qv.vec_id
         |        ORDER BY dot_i64(c.ce, c.ce) - 2 * dot_i64(qv.qe, c.ce), c.cid) AS rnk
         |    FROM (SELECT v.* FROM v JOIN qs ON qs.vec_id = v.vec_id) qv
         |    CROSS JOIN km_c2 c) WHERE rnk <= 3),
         |cand AS (
         |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN km_af a ON a.cid = p.cid AND a.vec_id != p.vec_id),
         |d1 AS (SELECT q.vec_id AS query_id, c.cid, dot_i64(s1.qe, c.ce) AS qdot, dot_i64(c.ce, c.ce) AS cnrm
         |  FROM qs q JOIN v1 s1 ON s1.vec_id = q.vec_id CROSS JOIN pq_p1c2 c),
         |d2 AS (SELECT q.vec_id AS query_id, c.cid, dot_i64(s2.qe, c.ce) AS qdot, dot_i64(c.ce, c.ce) AS cnrm
         |  FROM qs q JOIN v2 s2 ON s2.vec_id = q.vec_id CROSS JOIN pq_p2c2 c),
         |adc AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    d1.qdot + d2.qdot AS adot, d1.cnrm + d2.cnrm AS rnrm
         |  FROM cand c
         |  JOIN pq_p1af a1 ON a1.vec_id = c.neighbor_id
         |  JOIN pq_p2af a2 ON a2.vec_id = c.neighbor_id
         |  JOIN d1 ON d1.query_id = c.query_id AND d1.cid = a1.cid
         |  JOIN d2 ON d2.query_id = c.query_id AND d2.cid = a2.cid),
         |$sparkPqRecall,
         |scan AS (SELECT count(*) AS n_cand FROM cand),
         |corpus AS (SELECT count(*) AS n FROM v)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(s.n_cand) AS BIGINT) AS n_candidates,
         |  CAST(max(s.n_cand) AS DOUBLE) / (count(*) * (max(c.n) - 1)) AS scanned_frac
         |FROM hits CROSS JOIN scan s CROSS JOIN corpus c""".stripMargin)),

    // Corpus clustering quality: the trained k-means partition audited
    // per cluster — member count and exact integer inertia
    // (sum ||x-c||^2 = sum(x.x) - 2 sum(x.c) + n*c.c, every term an
    // exact integer dot). The mixture-analysis face of the IVF
    // machinery: how big and how tight each learned corpus cluster is.
    // One broadcast join (k rows) + one combine-friendly groupBy on cid.
    "x_kmeans_quality" -> ((s, dir) => embsTrained(s, dir, km = true, pq = false)(
      s"""WITH $sparkQuantV,
         |j AS (
         |  SELECT a.cid, v.nrm, dot_i64(v.qe, c.ce) AS xc, dot_i64(c.ce, c.ce) AS cc
         |  FROM km_af a JOIN v ON v.vec_id = a.vec_id JOIN km_c2 c ON c.cid = a.cid)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(nrm) - 2 * sum(xc) + count(*) * max(cc) AS BIGINT) AS inertia,
         |  CAST((sum(nrm) - 2 * sum(xc) + count(*) * max(cc)) DIV count(*) AS BIGINT) AS inertia_per_member
         |FROM j GROUP BY cid""".stripMargin)),

    // Corpus line-level exact dedup (the CCNet/Gopher boilerplate pass):
    // documents split into non-overlapping 8-word segments, each hashed
    // to 60 bits; a segment is boilerplate when its hash occurs >= 2
    // times corpus-wide. Per doc: segment count, duplicated-segment
    // count/fraction, and the keep verdict. One map-side-combinable
    // groupBy on the hash + one equi-join back — no shuffle of text.
    // Boilerplate stripping (the Common-Crawl header/footer cleaning
    // pass): a segment appearing in >= 30% of its SOURCE's documents is
    // sitewide boilerplate; the cleaned document is rebuilt from the
    // surviving segments in order and value-checked by md5 — so the
    // oracle proves the RECONSTRUCTION, not just the counts. Integer
    // permille threshold; scale shape: segment DF is a map-side-combined
    // groupBy on (source, segment), the rebuild one ordered
    // collect_list per doc — no window over the corpus, no self-join
    // beyond the segment-flag equi-join.
    "x_boilerplate_strip" -> ((s, dir) => docs(s, dir,
      """WITH w AS (
        |  SELECT doc_id, source, split(text, '\\s+') AS words
        |  FROM documents WHERE size(split(text, '\\s+')) >= 8),
        |seg AS (
        |  SELECT doc_id, source, s.k AS k, s.seg AS segment FROM (
        |    SELECT doc_id, source, explode(transform(sequence(0, size(words) DIV 8 - 1),
        |      k -> struct(k AS k, concat_ws(' ', slice(words, k * 8 + 1, 8)) AS seg))) AS s
        |    FROM w)),
        |df AS (SELECT source, segment, count(DISTINCT doc_id) AS docs_with
        |       FROM seg GROUP BY source, segment),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY source),
        |flag AS (SELECT df.source, df.segment,
        |    (1000 * df.docs_with) DIV nd.n_docs >= 300 AS boiler
        |  FROM df JOIN nd ON nd.source = df.source)
        |SELECT seg.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN flag.boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  md5(array_join(transform(
        |    array_sort(collect_list(CASE WHEN NOT flag.boiler THEN struct(seg.k, seg.segment) END)),
        |    x -> x.segment), ' ')) AS stripped_hash
        |FROM seg JOIN flag ON flag.source = seg.source AND flag.segment = seg.segment
        |GROUP BY seg.doc_id""".stripMargin)),

    "x_line_dedup" -> ((s, dir) => docs(s, dir,
      s"""WITH w AS (
         |  SELECT doc_id, split(text, '\\\\s+') AS words
         |  FROM documents WHERE size(split(text, '\\\\s+')) >= 8),
         |l AS (
         |  SELECT doc_id, explode(transform(sequence(0, size(words) DIV 8 - 1),
         |    k -> ${h64("concat_ws(' ', slice(words, k * 8 + 1, 8))")})) AS lh
         |  FROM w),
         |g AS (SELECT lh, count(*) AS c FROM l GROUP BY lh)
         |SELECT l.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.3 AS keep
         |FROM l JOIN g ON g.lh = l.lh
         |GROUP BY l.doc_id""".stripMargin)),

    // Span-level near-boilerplate dedup (the substring face of the
    // RefinedWeb/Gopher passes): OVERLAPPING 32-word spans at stride 16 —
    // duplication that crosses x_line_dedup's fixed 8-word segment
    // boundaries still collides on some shared span. Cross-doc sharing is
    // counted over DISTINCT (doc, span) so within-doc repetition (already
    // x_repetition_filter's job) doesn't inflate it. Same scale shape as
    // line dedup: one combine-friendly groupBy on the span hash + one
    // equi-join back; only 60-bit hashes shuffle, never text.
    "x_span_dedup" -> ((s, dir) => docs(s, dir,
      s"""WITH w AS (
         |  SELECT doc_id, split(text, '\\\\s+') AS words
         |  FROM documents WHERE size(split(text, '\\\\s+')) >= 32),
         |ds AS (
         |  SELECT DISTINCT doc_id, span_h FROM (
         |    SELECT doc_id, explode(transform(sequence(0, (size(words) - 32) DIV 16),
         |      k -> ${h64("concat_ws(' ', slice(words, k * 16 + 1, 32))")})) AS span_h
         |    FROM w)),
         |g AS (SELECT span_h, count(*) AS n_docs FROM ds GROUP BY span_h)
         |SELECT ds.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN g.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(max(g.n_docs) AS BIGINT) AS hottest_span_docs,
         |  CAST(sum(CASE WHEN g.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.5 AS keep
         |FROM ds JOIN g ON g.span_h = ds.span_h
         |GROUP BY ds.doc_id""".stripMargin)),

    // Bloom-filter semi-join pruning: the filter (65536 bits as 2048
    // 32-bit words, 2 salted hash probes per key) is built from the
    // selective side (orders placed since 1998-06-01) and probes distinct
    // lineitem order keys. Emits the soundness row: every true member
    // passes (n_missed = 0 — Bloom filters have no false negatives), plus
    // the measured false-positive count/rate against the exact semi-join.
    "x_bloom_prune" -> ((s, dir) => ordersLineitem(s, dir,
      s"""WITH sel AS (
         |  SELECT o_orderkey FROM orders WHERE o_orderdate >= DATE '1998-06-01'),
         |build AS (
         |  SELECT pmod(${h64("concat('b1_', o_orderkey)")}, 65536) AS pos FROM sel
         |  UNION ALL
         |  SELECT pmod(${h64("concat('b2_', o_orderkey)")}, 65536) AS pos FROM sel),
         |bloom AS (
         |  SELECT CAST(pos DIV 32 AS BIGINT) AS w,
         |    CAST(bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))) AS BIGINT) AS word
         |  FROM build GROUP BY pos DIV 32),
         |keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
         |probe AS (
         |  SELECT l_orderkey, pmod(${h64("concat('b1_', l_orderkey)")}, 65536) AS pos FROM keys
         |  UNION ALL
         |  SELECT l_orderkey, pmod(${h64("concat('b2_', l_orderkey)")}, 65536) AS pos FROM keys),
         |checked AS (
         |  SELECT p.l_orderkey,
         |    min(CASE WHEN b.word IS NOT NULL
         |             AND (b.word & shiftleft(CAST(1 AS BIGINT), CAST(p.pos % 32 AS INT))) != 0
         |        THEN 1 ELSE 0 END) AS pass
         |  FROM probe p LEFT JOIN bloom b ON b.w = p.pos DIV 32
         |  GROUP BY p.l_orderkey),
         |truth AS (
         |  SELECT k.l_orderkey, CASE WHEN s.o_orderkey IS NULL THEN 0 ELSE 1 END AS member
         |  FROM keys k LEFT JOIN sel s ON s.o_orderkey = k.l_orderkey)
         |SELECT
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(t.member) AS BIGINT) AS n_members,
         |  CAST(sum(c.pass) AS BIGINT) AS n_bloom_pass,
         |  CAST(sum(CASE WHEN t.member = 1 AND c.pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  CAST(sum(CASE WHEN t.member = 0 AND c.pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
         |  CAST(sum(CASE WHEN t.member = 0 AND c.pass = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / sum(CASE WHEN t.member = 0 THEN 1 ELSE 0 END) AS false_pos_rate
         |FROM checked c JOIN truth t ON t.l_orderkey = c.l_orderkey""".stripMargin)),

    // Bloom RUNTIME filter: where x_bloom_prune proves the bloom ALGEBRA
    // in SQL (probing via a positions join), this proves the ENGINE
    // ARTIFACT — functions.BloomAggregator builds a mergeable 4096-bit
    // sketch over the BUILDING customers' key hashes (map-side
    // combinable pointwise-OR, 512 B per partial), and the finished
    // sketch compiles into a scan-local literal predicate
    // (containsSql: four element_at bit tests, whole-stage codegen, no
    // probe join, no shuffle on the fact side) — Spark's own
    // InjectRuntimeFilter shape, but with a layout a DuckDB oracle
    // recomputes bit-exactly from >>/& on the same md5 hashes. The
    // audit left-join exists only to MEASURE the verdicts (soundness
    // n_missed = 0, measured false positives); the production path is
    // build -> collect 512 B -> filter inside the scan.
    "x_bloom_runtime_filter" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.functions.BloomAggregator
      val dim = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")).distinct().localCheckpoint()
      // corpus-adaptive width (smallest pow2 >= 16 keys/bit-ratio) — the
      // oracle re-derives the identical width from its own count(*)
      val bloomBits = BloomAggregator.adaptiveBits(dim.count())
      val words = dim
        .selectExpr(s"${h64("CAST(c_custkey AS STRING)")} AS h").as[Long]
        .select(new BloomAggregator(bloomBits).toColumn).head()
      val probed = Tables(s, dir, "orders")
        .selectExpr("o_custkey", s"${h64("CAST(o_custkey AS STRING)")} AS h")
        .withColumn("pass",
          expr(BloomAggregator.containsSql(words, "h")).cast("int"))
      val m = dim.withColumn("member", lit(1))
      probed.join(m, probed("o_custkey") === m("c_custkey"), "left")
        .agg(
          first(lit(BloomAggregator.bitsSet(words))).as("bits_set"),
          count(lit(1)).as("n_rows"),
          sum(coalesce(col("member"), lit(0))).cast("long").as("n_members"),
          sum(col("pass")).cast("long").as("n_pass"),
          sum(when(col("member") === 1 && col("pass") === 0, 1L).otherwise(0L))
            .as("n_missed"),
          sum(when(col("member").isNull && col("pass") === 1, 1L).otherwise(0L))
            .as("n_false_pos"))
    })
  )

  def oracle: Map[String, String] = Map(

    // same adaptiveCells rule from DuckDB's own count(*) (ks CTE); the
    // seed pick is the window-filter twin of Spark's ORDER BY/LIMIT
    "x_dedup_semantic" ->
      s"""WITH RECURSIVE $duckQuantV,
         |ks AS (SELECT COALESCE(MIN(1::BIGINT << e), 4096) AS k
         |  FROM (SELECT unnest(generate_series(4, 12)) AS e), (SELECT count(*) AS n FROM embeddings)
         |  WHERE n <= 64 * (1::BIGINT << e)),
         |sem_sd AS (SELECT vec_id, qe, hv FROM (
         |  SELECT vec_id, qe, ${duckH64("'seed_' || vec_id::VARCHAR")} AS hv,
         |    row_number() OVER (ORDER BY ${duckH64("'seed_' || vec_id::VARCHAR")}, vec_id) AS rnk
         |  FROM v) WHERE rnk <= (SELECT k FROM ks)),
         |sem_c0 AS (SELECT CAST(row_number() OVER (ORDER BY hv, vec_id) - 1 AS BIGINT) AS cid, qe AS ce FROM sem_sd),
         |${duckAssign("sem_a1", "sem_c0")},
         |${duckUpdate("sem_e1", "sem_m1", "sem_c1", "sem_a1")},
         |${duckAssign("sem_a2", "sem_c1")},
         |${duckUpdate("sem_e2", "sem_m2", "sem_c2", "sem_a2")},
         |${duckAssign("sem_af", "sem_c2")},
         |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2
         |  FROM sem_af a JOIN sem_af b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |e0 AS (
         |  SELECT p.d1, p.d2
         |  FROM pairs p JOIN v x ON x.vec_id = p.d1 JOIN v y ON y.vec_id = p.d2
         |  WHERE CAST(CAST(list_dot_product(x.qe::DOUBLE[], y.qe::DOUBLE[]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE))) >= 0.4),
         |edges AS (SELECT d1 AS a, d2 AS b FROM e0 UNION SELECT d2, d1 FROM e0),
         |closure(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a),
         |comp AS (SELECT a AS vec_id, least(a, min(b)) AS rep_id FROM closure GROUP BY a)
         |SELECT vec_id, rep_id, vec_id = rep_id AS kept FROM comp
         |UNION ALL
         |SELECT e.vec_id, e.vec_id AS rep_id, TRUE AS kept
         |FROM embeddings e WHERE e.vec_id NOT IN (SELECT vec_id FROM comp)""".stripMargin,

    // trains on the bootstrap state (the unmodified embeddings table),
    // then assigns the replayed post-churn state against that frozen
    // codebook — the maintained lists must equal this recompute
    "x_ann_index_incremental" ->
      s"""WITH $duckQuantV,
         |${duckKmeansFor("ivf_", "v", 16)},
         |src AS (
         |  SELECT vec_id,
         |    CASE WHEN vec_id % 10 < 2 THEN list_reverse(embedding) ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 10 NOT IN (2, 3)
         |  UNION ALL
         |  SELECT vec_id + 1000000000, embedding FROM embeddings WHERE vec_id % 10 IN (8, 9)),
         |q2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qe FROM src),
         |${duckAssign("af2", "ivf_c2", "q2")}
         |SELECT vec_id, cid FROM af2""".stripMargin,

    "x_ann_ivf_kmeans" ->
      s"""WITH $duckQuantV,
         |$duckKmeansScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_ann_recall_kmeans" ->
      s"""WITH $duckQuantV,
         |$duckKmeansScored,
         |ivf_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM scored) t WHERE rank <= 5),
         |brute AS (
         |  SELECT q2.vec_id AS query_id, v2.vec_id AS neighbor_id,
         |    CAST(list_dot_product(q2.qe::DOUBLE[], v2.qe::DOUBLE[]) AS DOUBLE)
         |      / (sqrt(CAST(q2.nrm AS DOUBLE)) * sqrt(CAST(v2.nrm AS DOUBLE))) AS cos
         |  FROM qsel q2
         |  JOIN v v2 ON q2.vec_id != v2.vec_id),
         |brute_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM brute) t WHERE rank <= 5),
         |hits AS (
         |  SELECT b.query_id, count(l.neighbor_id) AS hit
         |  FROM brute_top b LEFT JOIN ivf_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id),
         |scan AS (SELECT count(*) AS n_cand FROM cand),
         |corpus AS (SELECT count(*) AS n FROM v)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(s.n_cand) AS BIGINT) AS n_candidates,
         |  CAST(max(s.n_cand) AS DOUBLE) / (count(*) * (max(c.n) - 1)) AS scanned_frac
         |FROM hits CROSS JOIN scan s CROSS JOIN corpus c""".stripMargin,

    "x_ann_pq" ->
      s"""WITH $duckQuantV,
         |v1 AS (SELECT vec_id, list_slice(qe, 1, len(qe) // 2) AS qe FROM v),
         |v2 AS (SELECT vec_id, list_slice(qe, len(qe) // 2 + 1, len(qe)) AS qe FROM v),
         |${duckKmeansFor("p1", "v1", 64)},
         |${duckKmeansFor("p2", "v2", 64)},
         |$duckQsel,
         |qs AS (SELECT vec_id FROM qsel),
         |d1 AS (SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_dot_product(s1.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS qdot,
         |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS cnrm
         |  FROM qs q JOIN v1 s1 ON s1.vec_id = q.vec_id CROSS JOIN p1c2 c),
         |d2 AS (SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_dot_product(s2.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS qdot,
         |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS cnrm
         |  FROM qs q JOIN v2 s2 ON s2.vec_id = q.vec_id CROSS JOIN p2c2 c),
         |adc AS (
         |  SELECT d1.query_id, a1.vec_id AS neighbor_id,
         |    d1.qdot + d2.qdot AS adot, d1.cnrm + d2.cnrm AS rnrm
         |  FROM p1af a1 JOIN p2af a2 ON a2.vec_id = a1.vec_id
         |  JOIN d1 ON d1.cid = a1.cid
         |  JOIN d2 ON d2.query_id = d1.query_id AND d2.cid = a2.cid
         |  WHERE a1.vec_id != d1.query_id),
         |$duckPqRecall,
         |codes AS (SELECT CAST(count(*) AS BIGINT) AS n_codes FROM (
         |  SELECT DISTINCT a1.cid AS cx, a2.cid AS cy
         |  FROM p1af a1 JOIN p2af a2 ON a2.vec_id = a1.vec_id) t)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(c.n_codes) AS BIGINT) AS n_codes_used
         |FROM hits CROSS JOIN codes c""".stripMargin,

    "x_ann_ivfpq" ->
      s"""WITH $duckQuantV,
         |${duckKmeansFor("g", "v")},
         |v1 AS (SELECT vec_id, list_slice(qe, 1, len(qe) // 2) AS qe FROM v),
         |v2 AS (SELECT vec_id, list_slice(qe, len(qe) // 2 + 1, len(qe)) AS qe FROM v),
         |${duckKmeansFor("p1", "v1", 64)},
         |${duckKmeansFor("p2", "v2", 64)},
         |$duckQsel,
         |qs AS (SELECT vec_id FROM qsel),
         |probes AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT qv.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY qv.vec_id
         |        ORDER BY CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT)
         |          - 2 * CAST(list_dot_product(qv.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT), c.cid) AS rnk
         |    FROM (SELECT v.* FROM v JOIN qs ON qs.vec_id = v.vec_id) qv
         |    CROSS JOIN gc2 c) WHERE rnk <= 3),
         |cand AS (
         |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN gaf a ON a.cid = p.cid AND a.vec_id != p.vec_id),
         |d1 AS (SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_dot_product(s1.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS qdot,
         |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS cnrm
         |  FROM qs q JOIN v1 s1 ON s1.vec_id = q.vec_id CROSS JOIN p1c2 c),
         |d2 AS (SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_dot_product(s2.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS qdot,
         |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS cnrm
         |  FROM qs q JOIN v2 s2 ON s2.vec_id = q.vec_id CROSS JOIN p2c2 c),
         |adc AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    d1.qdot + d2.qdot AS adot, d1.cnrm + d2.cnrm AS rnrm
         |  FROM cand c
         |  JOIN p1af a1 ON a1.vec_id = c.neighbor_id
         |  JOIN p2af a2 ON a2.vec_id = c.neighbor_id
         |  JOIN d1 ON d1.query_id = c.query_id AND d1.cid = a1.cid
         |  JOIN d2 ON d2.query_id = c.query_id AND d2.cid = a2.cid),
         |$duckPqRecall,
         |scan AS (SELECT count(*) AS n_cand FROM cand),
         |corpus AS (SELECT count(*) AS n FROM v)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5,
         |  CAST(max(s.n_cand) AS BIGINT) AS n_candidates,
         |  CAST(max(s.n_cand) AS DOUBLE) / (count(*) * (max(c.n) - 1)) AS scanned_frac
         |FROM hits CROSS JOIN scan s CROSS JOIN corpus c""".stripMargin,

    "x_kmeans_quality" ->
      s"""WITH $duckQuantV,
         |$duckKmeans,
         |j AS (
         |  SELECT a.cid, v.nrm,
         |    CAST(list_dot_product(v.qe::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS xc,
         |    CAST(list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS BIGINT) AS cc
         |  FROM af a JOIN v ON v.vec_id = a.vec_id JOIN c2 c ON c.cid = a.cid)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(nrm) - 2 * sum(xc) + count(*) * max(cc) AS BIGINT) AS inertia,
         |  CAST((sum(nrm) - 2 * sum(xc) + count(*) * max(cc)) // count(*) AS BIGINT) AS inertia_per_member
         |FROM j GROUP BY cid""".stripMargin,

    "x_boilerplate_strip" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split_regex(text, '\s+') AS words
        |  FROM documents WHERE len(string_split_regex(text, '\s+')) >= 8),
        |seg AS (
        |  SELECT doc_id, source, i AS k,
        |    array_to_string(list_slice(words, i * 8 + 1, i * 8 + 8), ' ') AS segment
        |  FROM (SELECT doc_id, source, words,
        |          unnest(generate_series(0, len(words) // 8 - 1)) AS i FROM w)),
        |df AS (SELECT source, segment, count(DISTINCT doc_id) AS docs_with
        |       FROM seg GROUP BY source, segment),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY source),
        |flag AS (SELECT df.source, df.segment,
        |    (1000 * df.docs_with) // nd.n_docs >= 300 AS boiler
        |  FROM df JOIN nd ON nd.source = df.source)
        |SELECT seg.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN flag.boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  md5(coalesce(string_agg(seg.segment, ' ' ORDER BY seg.k)
        |    FILTER (WHERE NOT flag.boiler), '')) AS stripped_hash
        |FROM seg JOIN flag ON flag.source = seg.source AND flag.segment = seg.segment
        |GROUP BY seg.doc_id""".stripMargin,

    "x_line_dedup" ->
s"""WITH w AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS words
         |  FROM documents WHERE len(string_split_regex(text, '\\s+')) >= 8),
         |idx AS (SELECT doc_id, words, unnest(generate_series(0, len(words) // 8 - 1)) AS k FROM w),
         |l AS (SELECT doc_id,
         |  ${duckH64("array_to_string(list_slice(words, k * 8 + 1, k * 8 + 8), ' ')")} AS lh
         |  FROM idx),
         |g AS (SELECT lh, count(*) AS c FROM l GROUP BY lh)
         |SELECT l.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac,
         |  CAST(sum(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.3 AS keep
         |FROM l JOIN g ON g.lh = l.lh
         |GROUP BY l.doc_id""".stripMargin,

    "x_span_dedup" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS words
         |  FROM documents WHERE len(string_split_regex(text, '\\s+')) >= 32),
         |idx AS (SELECT doc_id, words, unnest(generate_series(0, (len(words) - 32) // 16)) AS k FROM w),
         |ds AS (SELECT DISTINCT doc_id,
         |  ${duckH64("array_to_string(list_slice(words, k * 16 + 1, k * 16 + 32), ' ')")} AS span_h
         |  FROM idx),
         |g AS (SELECT span_h, count(*) AS n_docs FROM ds GROUP BY span_h)
         |SELECT ds.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN g.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(max(g.n_docs) AS BIGINT) AS hottest_span_docs,
         |  CAST(sum(CASE WHEN g.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.5 AS keep
         |FROM ds JOIN g ON g.span_h = ds.span_h
         |GROUP BY ds.doc_id""".stripMargin,

    "x_bloom_prune" ->
      s"""WITH sel AS (
         |  SELECT o_orderkey FROM orders WHERE o_orderdate >= DATE '1998-06-01'),
         |build AS (
         |  SELECT ${duckH64("'b1_' || o_orderkey::VARCHAR")} % 65536 AS pos FROM sel
         |  UNION ALL
         |  SELECT ${duckH64("'b2_' || o_orderkey::VARCHAR")} % 65536 AS pos FROM sel),
         |bloom AS (
         |  SELECT CAST(pos // 32 AS BIGINT) AS w,
         |    CAST(bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS BIGINT) AS word
         |  FROM build GROUP BY pos // 32),
         |keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
         |probe AS (
         |  SELECT l_orderkey, ${duckH64("'b1_' || l_orderkey::VARCHAR")} % 65536 AS pos FROM keys
         |  UNION ALL
         |  SELECT l_orderkey, ${duckH64("'b2_' || l_orderkey::VARCHAR")} % 65536 AS pos FROM keys),
         |checked AS (
         |  SELECT p.l_orderkey,
         |    min(CASE WHEN b.word IS NOT NULL
         |             AND (b.word & (1::BIGINT << CAST(p.pos % 32 AS INT))) != 0
         |        THEN 1 ELSE 0 END) AS pass
         |  FROM probe p LEFT JOIN bloom b ON b.w = p.pos // 32
         |  GROUP BY p.l_orderkey),
         |truth AS (
         |  SELECT k.l_orderkey, CASE WHEN s.o_orderkey IS NULL THEN 0 ELSE 1 END AS member
         |  FROM keys k LEFT JOIN sel s ON s.o_orderkey = k.l_orderkey)
         |SELECT
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(t.member) AS BIGINT) AS n_members,
         |  CAST(sum(c.pass) AS BIGINT) AS n_bloom_pass,
         |  CAST(sum(CASE WHEN t.member = 1 AND c.pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  CAST(sum(CASE WHEN t.member = 0 AND c.pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
         |  CAST(sum(CASE WHEN t.member = 0 AND c.pass = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / sum(CASE WHEN t.member = 0 THEN 1 ELSE 0 END) AS false_pos_rate
         |FROM checked c JOIN truth t ON t.l_orderkey = c.l_orderkey""".stripMargin,

    // recomputes the aggregator's exact bit layout: 4 probe positions =
    // disjoint 12-bit slices of the same 60-bit md5 hash; bits_set =
    // |distinct positions|; membership = all four slices present
    "x_bloom_runtime_filter" ->
      s"""WITH dim AS (
         |  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         |mm AS (
         |  SELECT CASE WHEN 16 * n <= 4096 THEN 4096
         |              WHEN 16 * n <= 8192 THEN 8192
         |              WHEN 16 * n <= 16384 THEN 16384
         |              WHEN 16 * n <= 32768 THEN 32768
         |              ELSE 65536 END AS m
         |  FROM (SELECT count(*) AS n FROM dim)),
         |hb AS (
         |  SELECT h % 1073741824 AS h1, (h // 1073741824) | 1 AS h2
         |  FROM (SELECT ${duckH64("c_custkey::VARCHAR")} AS h FROM dim)),
         |pos AS (
         |  SELECT DISTINCT (h1 + i * h2) % m AS p
         |  FROM hb CROSS JOIN mm CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
         |probe AS (
         |  SELECT o_custkey, h % 1073741824 AS h1, (h // 1073741824) | 1 AS h2
         |  FROM (SELECT o_custkey, ${duckH64("o_custkey::VARCHAR")} AS h FROM orders)),
         |v AS (
         |  SELECT o_custkey,
         |    CASE WHEN ((h1 + 0 * h2) % m) IN (SELECT p FROM pos)
         |          AND ((h1 + 1 * h2) % m) IN (SELECT p FROM pos)
         |          AND ((h1 + 2 * h2) % m) IN (SELECT p FROM pos)
         |          AND ((h1 + 3 * h2) % m) IN (SELECT p FROM pos)
         |      THEN 1 ELSE 0 END AS pass
         |  FROM probe CROSS JOIN mm),
         |t AS (
         |  SELECT v.pass, CASE WHEN d.c_custkey IS NULL THEN NULL ELSE 1 END AS member
         |  FROM v LEFT JOIN dim d ON d.c_custkey = v.o_custkey)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM pos) AS bits_set,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(coalesce(member, 0)) AS BIGINT) AS n_members,
         |  CAST(sum(pass) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN member = 1 AND pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  CAST(sum(CASE WHEN member IS NULL AND pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
         |FROM t""".stripMargin
  )
}
