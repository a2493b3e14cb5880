package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, least, min}

/** Near-duplicate detection and similarity search — the LLM-training-data
  * operators (SURVEY.md §7 step 7): n-gram Jaccard, MinHash+LSH banding,
  * SimHash, embedding-cosine near-dup, brute-force cosine top-k, and an
  * LSH-bucketed ANN variant.
  *
  * Scale design: every pipeline avoids the quadratic all-pairs step at
  * 100 TB — MinHash banding and SimHash byte-bands bound candidate
  * generation to hash-equal buckets (a hash-partition shuffle, no cross
  * join); only verified candidates pay the exact-similarity cost. The
  * brute-force variants exist as correctness baselines for the oracles.
  *
  * Determinism across engines: MinHash permutations are salted md5 hashes
  * (h64), never random; embeddings are quantized to integers (floor(x*1000
  * + 0.5)) so dot products and norms are exact in IEEE double arithmetic
  * regardless of summation order; cosine formulas are textually identical
  * in Spark and DuckDB SQL.
  */
object SimilarityQueries extends QueryPack {
  import TextQueries.{h64, duckH64}

  private def docs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  /** Register the hashed shingle set (`sh`), per-doc shingle counts
    * (`n`), and the MinHash band-signature table (`mh_sig`) as cached
    * temp views before running `sql`. The shingle pipeline (regex split +
    * md5 per shingle + distinct) and the signature table (16 permutations
    * -> 4 bands x 4 rows per doc) are the expensive shared stages of the
    * document-dedup queries; as plain CTEs Spark re-inlines and recomputes
    * them per reference, so both materialize once per session (the DuckDB
    * oracle keeps the equivalent CTE text — results identical). All three
    * document-dedup queries (jaccard, minhash, clusters) gate pair
    * generation on band equality over `mh_sig`.
    */
  // Registration is memoized per session AND current dir: building the
  // sh/mh_sig comparison plans for cacheView's sameResult check costs
  // a few hundred ms of analysis per call, which dominated repeat
  // invocations. A dir SWITCH within one session re-registers (the
  // views are session-global, so A -> B -> A must not serve B's data).
  private val dedupViewsFor =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]
  private val simhashFor =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  private def registerDedupViews(s: SparkSession, dir: String): Unit =
    if (!dedupViewsFor.get(s).contains(dir)) dedupViewsFor.synchronized {
      // double-checked under the monitor like trainedView/interCache so
      // concurrent first calls can't double-build and leak a cached plan
      if (!dedupViewsFor.get(s).contains(dir)) {
        dedupViewsFor.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        Tables.cacheView("sh", s.sql(s"WITH $sparkShingles SELECT doc_id, shingle_h FROM sh"))
        Tables.cacheView("n",
          s.sql("SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id"))
        Tables.cacheView("mh", s.sql(s"WITH $sparkPermsMh SELECT doc_id, p, mh FROM mh"))
        Tables.cacheView("mh_sig", s.sql(s"WITH $sparkSigCtes SELECT doc_id, band, sig FROM sigt"))
        dedupViewsFor.update(s, dir)
      }
    }

  private def docsWithBands(s: SparkSession, dir: String, sql: String): DataFrame = {
    registerDedupViews(s, dir)
    s.sql(sql)
  }

  /** [[docsWithBands]] plus the shared exact-intersection artifact
    * `dedup_inter(d1, d2, inter)`: the per-candidate-pair shared-shingle
    * count, i.e. the verification table EVERY exact-verify dedup query
    * (jaccard, minhash, containment, estimate calibration — and through
    * the first of those, near-dup clustering) consumes. Like the trained
    * ANN models, it is an index artifact built once per (session, sfDir)
    * and served from a localCheckpoint (not cacheView — the plan
    * contains SQL CTEs, which the Spark 4.1.2 cache-manager dedup
    * crashes on). Every consumer inner-joins it, so pairs outside it
    * can never affect results.
    */
  private val interCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def docsWithInter(s: SparkSession, dir: String, sql: String): DataFrame = {
    registerDedupViews(s, dir)
    interCache.synchronized {
      interCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      interCache.getOrElseUpdate((s, dir),
        s.sql(
          s"""WITH $sparkCand,
             |inter AS (
             |  SELECT c.d1, c.d2, count(*) AS inter
             |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
             |  GROUP BY c.d1, c.d2)
             |SELECT d1, d2, inter FROM inter""".stripMargin).localCheckpoint())
        .createOrReplaceTempView("dedup_inter")
    }
    s.sql(sql)
  }

  private def embs(s: SparkSession, dir: String, sql: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    s.sql(sql)
  }

  /** [[embs]] plus a shared hyperplane-projection artifact: the 16
    * per-vector projections (`pr` array), materialized once per
    * (session, sfDir, view) and served to every query of that LSH
    * family — the projection pass runs once, not once per query. Bands
    * and multiprobe flip selection are row-local transforms of `pr`, so
    * everything downstream of the artifact is a cheap derivation — the
    * same shared-index discipline as the k-means `trainedView`s.
    * `proj64` serves the fixed-operating-point 64-dim family; `proj256`
    * serves the 256-dim (encoder-dimensionality) family, whose
    * 16 x 256-term pass is the board's most expensive single
    * computation. localCheckpoint via Tables.materializeView (the plan
    * contains SQL CTEs, which the Spark 4.1.2 cache-manager dedup
    * crashes on). The adaptive-width near-dup path (x_dedup_embedding)
    * stays inline: its plane count varies with corpus size, so a
    * fixed-width artifact cannot serve it.
    */
  private val projCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def embsWithProj(s: SparkSession, dir: String, view: String,
                           buildSql: => String, sql: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    projCache.synchronized {
      projCache.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
      projCache.getOrElseUpdate((s, dir, view), Tables.materializeView(s.sql(buildSql)))
        .createOrReplaceTempView(view)
    }
    s.sql(sql)
  }

  private def embs256(s: SparkSession, dir: String, sql: String): DataFrame =
    embsWithProj(s, dir, "proj256",
      s"""WITH $sparkQuant,
         |$sparkV256,
         |$sparkProjt256
         |SELECT vec_id, pr FROM projt""".stripMargin, sql)

  private def embs64(s: SparkSession, dir: String, sql: String): DataFrame =
    embsWithProj(s, dir, "proj64",
      s"""WITH $sparkQuant,
         |projt AS (
         |  SELECT vec_id, array(
         |    ${(0 until 16).map(p => s"dot_i64(qe, ${planeLit(p)})").mkString(",\n         |    ")}) AS pr
         |  FROM v)
         |SELECT vec_id, pr FROM projt""".stripMargin, sql)

  // 3-word shingle sets per doc, hashed to 60-bit longs at the source —
  // every downstream join/shuffle moves 8-byte keys, never shingle
  // strings. Spark and DuckDB twins.
  private[graft] val sparkShingles =
    s"""w AS (SELECT doc_id, split(text, '\\\\s+') AS words FROM documents
       |       WHERE size(split(text, '\\\\s+')) >= 3),
       |sh AS (SELECT DISTINCT doc_id, shingle_h FROM (
       |  SELECT doc_id, explode(transform(sequence(0, size(words)-3),
       |    i -> ${h64("concat(words[i], ' ', words[i+1], ' ', words[i+2])")})) AS shingle_h FROM w)),
       |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private[graft] val duckShingles =
    s"""w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
       |       WHERE len(string_split_regex(text, '\\s+')) >= 3),
       |idx AS (SELECT doc_id, words, unnest(generate_series(1, len(words)-2)) AS i FROM w),
       |sh AS (SELECT DISTINCT doc_id, ${duckH64("words[i] || ' ' || words[i+1] || ' ' || words[i+2]")} AS shingle_h FROM idx),
       |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  // MinHash signatures over the hashed shingles: 16 xor-mix permutations
  // of the 60-bit shingle hash, folded into 4 band signatures of 4 rows
  // each. Each permutation is one xor — not another md5 over shingle text.
  private val sparkPermsMh =
    s"""perms AS (SELECT p, ${h64("CAST(p AS STRING)")} AS kp
       |  FROM (SELECT explode(sequence(0, 15)) AS p)),
       |mh AS (
       |  SELECT doc_id, p, min(shingle_h ^ kp) AS mh
       |  FROM sh CROSS JOIN perms
       |  GROUP BY doc_id, p)""".stripMargin

  private val sparkSigCtes =
    s"""$sparkPermsMh,
       |sigt AS (
       |  SELECT doc_id, p DIV 4 AS band,
       |    concat_ws(',', transform(array_sort(collect_list(struct(p, mh))),
       |      x -> cast(x.mh AS string))) AS sig
       |  FROM mh GROUP BY doc_id, p DIV 4)""".stripMargin

  // Band-equality candidate pairs over the cached signature view — the
  // 100 TB pair-generation path: an equi-join on (band, signature), no
  // all-pairs or inverted-index blow-up anywhere.
  private val sparkCand =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM mh_sig a JOIN mh_sig b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  // DuckDB twin of the full signature + candidate chain (the oracle keeps
  // the inline CTE form; results are identical).
  private val duckPermsMh =
    s"""perms AS (SELECT p, ${duckH64("p::VARCHAR")} AS kp
       |  FROM (SELECT unnest(generate_series(0, 15)) AS p)),
       |mh AS (
       |  SELECT doc_id, p, min(xor(shingle_h, kp)) AS mh
       |  FROM sh CROSS JOIN perms GROUP BY doc_id, p)""".stripMargin

  private val duckBandCand =
    s"""$duckPermsMh,
       |sig AS (
       |  SELECT doc_id, p // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY p) AS sig
       |  FROM mh GROUP BY doc_id, p // 4),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  // DuckDB truth for near-dup cluster labels: recursive-CTE transitive
  // closure over the verified jaccard pairs — shared by x_dedup_clusters
  // (pointer-jump propagation) and x_cc_largestar (large-star/small-star)
  private val duckClusterClosure =
    s"""WITH RECURSIVE $duckShingles,
       |$duckBandCand,
       |prs AS (
       |  SELECT p.d1, p.d2 FROM (
       |    SELECT c.d1, c.d2, count(*) AS inter
       |    FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
       |    GROUP BY c.d1, c.d2) p
       |  JOIN n n1 ON n1.doc_id = p.d1 JOIN n n2 ON n2.doc_id = p.d2
       |  WHERE CAST(inter AS DOUBLE) / (n1.n + n2.n - inter) >= 0.8),
       |edges AS (SELECT d1 AS a, d2 AS b FROM prs UNION SELECT d2, d1 FROM prs),
       |closure(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |FROM closure GROUP BY a""".stripMargin

  // integer-quantized embeddings + exact integer norms (dot_i64 is the
  // engine's codegen'd Catalyst expression — see functions.DotI64)
  private val sparkQuant =
    """q AS (SELECT vec_id, label, transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qe FROM embeddings),
      |v AS (SELECT vec_id, label, qe, dot_i64(qe, qe) AS nrm FROM q)""".stripMargin

  private val duckQuant =
    """q AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qe FROM embeddings),
      |v AS (SELECT vec_id, label, qe, CAST(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) AS BIGINT) AS nrm FROM q)""".stripMargin

  // Shared LSH-banded ANN candidate scoring: 16 deterministic hyperplanes
  // folded into 4 bands of 4 sign bits (same banding family as the
  // embedding near-dup); a vector is a candidate for a query when any
  // band value matches. The hyperplane weights are pure functions of
  // (plane, dim) through the same md5 arithmetic as h64, so the engine
  // precomputes them at plan-build time and embeds them as literal
  // arrays: each row computes its 16 projections with dot_i64 in one
  // codegen'd pass — no 1,024-row plane table, no row x 1024 expansion,
  // and no aggregate exchange keyed on (vec_id, plane). Banding is
  // map-side; the only shuffle left in candidate generation is the
  // (band, bval) equi-join itself. (The DuckDB oracles keep the
  // declarative CROSS JOIN planes form — the weights are identical by
  // construction, so results hash-match.) The query set is `qsel`.
  private def h64Const(x: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private[graft] def planeWeight(p: Int, d: Int): Long =
    (h64Const(s"${p}_${d}") % 2001L) - 1000L
  // plane literals are GENERATED on demand from the (plane, dim) pure
  // function — any operating point constructs by definition, no fixed
  // precomputed cap. Memoized per plane index: each literal is a 64-term
  // array expression reused across every LSH query in a session.
  private val planeLitCache = scala.collection.concurrent.TrieMap.empty[Int, String]
  private def planeLit(p: Int): String =
    planeLitCache.getOrElseUpdate(p,
      (0 until 64).map(d => s"${planeWeight(p, d)}L").mkString("array(", ",", ")"))

  /** The literal-plane banding CTEs at a given operating point: 4 bands
    * of `bandBits` sign bits each (4 * bandBits hyperplanes total). The
    * ANN family pins bandBits = 4 (the documented recall/scan frontier);
    * the all-pairs near-dup path picks bandBits from the corpus size —
    * see x_dedup_embedding.
    */
  private[graft] def lshBandsSql(bandBits: Int): String = {
    val planes = 4 * bandBits
    // any plane count constructs — planeLit generates literals on demand
    // from the pure (plane, dim) function, so the only remaining cap is
    // the adaptiveBandBits [4, 16] clamp itself, which is the SHARED
    // operating envelope (the DuckDB oracle's nb CTE computes the same
    // clamp and sizes its planes series to it): widening the envelope
    // means widening BOTH engines' ranges identically, not this function
    val bval = (0 until bandBits)
      .map(i => s"IF(pr[b*$bandBits+$i] > 0, ${1L << i}L, 0L)").mkString(" + ")
    s"""projt AS (
       |  SELECT vec_id, array(
       |    ${(0 until planes).map(p => s"dot_i64(qe, ${planeLit(p)})").mkString(",\n       |    ")}) AS pr
       |  FROM v),
       |proj AS (SELECT vec_id, p, s FROM projt LATERAL VIEW posexplode(pr) t AS p, s),
       |bands AS (
       |  SELECT vec_id, b AS band,
       |    CAST($bval AS BIGINT) AS bval
       |  FROM projt LATERAL VIEW explode(sequence(0, 3)) t AS b)""".stripMargin
  }

  // 4 bands x 4 sign bits folded row-locally from the materialized
  // proj64 artifact (see embs64) — the fixed-point ANN family's banding
  // without recomputing the projection pass per query
  private val sparkBands64 = {
    val bval = (0 until 4).map(i => s"IF(pr[b*4+$i] > 0, ${1L << i}L, 0L)").mkString(" + ")
    s"""bands AS (
       |  SELECT vec_id, b AS band, CAST($bval AS BIGINT) AS bval
       |  FROM proj64 LATERAL VIEW explode(sequence(0, 3)) t AS b)""".stripMargin
  }

  /** The corpus-adaptive band width for the all-pairs near-dup path:
    * smallest bits in [4, 16] with n <= 64 * 2^bits (expected bucket
    * occupancy <= 64 — candidates O(n)). Integer shift-and-compare so
    * the DuckDB oracle's SQL twin (`nb` CTE in the x_dedup_embedding
    * oracle) computes the identical value at any corpus size.
    */
  private[graft] def adaptiveBandBits(n: Long): Int =
    (4 to 16).find(b => n <= (64L << b)).getOrElse(16)

  /** The corpus-adaptive SimHash operating point: 3 bands (the pigeonhole
    * minimum covering hamming <= 2 — two flips dirty at most two bands,
    * so one band always matches, an EXACT recall guarantee at any band
    * width) of `b` bits each, signature width 3*b. Unlike the uniform
    * LSH band values, simhash band values are correlated (shared
    * vocabulary pulls signatures together), so the occupancy target is
    * <= 1 expected uniform occupant, not 64: smallest b in [12, 20] with
    * n <= 2^b. Integer shift-and-compare; the DuckDB oracle's `nb` CTE
    * computes the identical value from its own count(*), so the two
    * engines agree at any corpus size. The cap b = 20 uses all 60 bits
    * h64 yields; past n ~ 10^6 docs candidate noise re-grows O(n^2/2^20)
    * — the named remedy is a second salted h64 per token (120-bit
    * signature, b to 40), not a re-tune of this rule.
    */
  private[graft] def adaptiveSimhashBits(n: Long): Int =
    (12 to 20).find(b => n <= (1L << b)).getOrElse(20)

  /** Connected components over an undirected pair list (columns d1, d2)
    * via iterative min-label propagation with pointer jumping — the
    * scalable formulation (each round: one equi-join + groupBy, one
    * label(label) self-join). Returns (node, label) with label = the
    * component's minimum node id.
    *
    * CONVERGES OR THROWS — never returns partial labels: pointer jumping
    * at least halves every label chain per round, so a component of n
    * nodes converges within ~log2(n) rounds; the loop runs to
    * `changed == 0` under a cap of 2*ceil(log2(nodes)) + 8 rounds and
    * raises IllegalStateException if the cap is ever hit with changes
    * still flowing (which would indicate a logic bug, not a big graph —
    * prior behavior silently returned partially-propagated clusters).
    * localCheckpoint after every round truncates the logical plan:
    * without it the self-referencing lineage doubles per iteration and
    * blows up the optimizer (stack overflow by ~round 10).
    */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionAll(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    val nodes = labels.count()
    val maxRounds =
      2 * (64 - java.lang.Long.numberOfLeadingZeros(math.max(nodes, 1L))) + 8
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      if (rounds >= maxRounds) throw new IllegalStateException(
        s"connectedComponents: not converged after $rounds rounds " +
          s"($nodes nodes, $changed labels still changing) — " +
          "pointer-jumping propagation should converge in O(log n); " +
          "refusing to return partially-propagated cluster labels")
      // (1) neighbor-min, (2) pointer-jump label(label) — halves the
      // rounds needed vs pure propagation. The round's PREVIOUS label
      // rides along as `old` inside the checkpointed frame, so the
      // convergence probe is a filter-count over the checkpoint — the
      // prior shape paid one more shuffle join per round (next ⋈ labels
      // on node) just to compare new against old.
      val byNeighbor = edges
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node")).agg(min("label").as("nlabel"))
      val stepped = labels.withColumnRenamed("label", "old")
        .join(byNeighbor, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"))
      val next = stepped
        .join(stepped.select(col("node").as("label"), col("label").as("jump")),
          Seq("label"), "left")
        .select(col("node"), col("old"), coalesce(col("jump"), col("label")).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select("node", "label")
      rounds += 1
    }
    labels
  }

  // ANN query set bounded by COUNT, not fraction: the 100 vectors with
  // the smallest salted hash (ties broken by vec_id — a total order, so
  // both engines pick the same rows at any scale factor). |Q| stays 100
  // as the corpus grows, which keeps the recall harnesses' brute-force
  // ground truth at O(100 * n); the previous fixed-fraction set
  // (vec_id % 50 = 0) grew |Q| with n and made ground truth O(n^2 / 50).
  // Plans as a map-side-combinable TakeOrdered, never a global sort.
  private[graft] val sparkQsel =
    s"""qsel AS (SELECT * FROM v ORDER BY ${h64("concat('q_', vec_id)")}, vec_id LIMIT 100)"""
  private[graft] val duckQsel =
    s"""qsel AS (SELECT * FROM v ORDER BY ${duckH64("'q_' || vec_id::VARCHAR")}, vec_id LIMIT 100)"""

  private val sparkLshScored =
    s"""$sparkBands64,
       |$sparkQsel,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id != b.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM qsel)),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    dot_i64(qv.qe, nv.qe) AS dot, qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  private val duckLshBands =
    s"""planes AS (
       |  SELECT pp.p, dd.d, (${duckH64("pp.p::VARCHAR || '_' || dd.d::VARCHAR")} % 2001) - 1000 AS wgt
       |  FROM (SELECT unnest(generate_series(0, 15)) AS p) pp
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) dd),
       |proj AS (
       |  SELECT v.vec_id, planes.p, sum(v.qe[planes.d + 1] * planes.wgt) AS s
       |  FROM v CROSS JOIN planes GROUP BY v.vec_id, planes.p),
       |bands AS (
       |  SELECT vec_id, p // 4 AS band,
       |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << (p % 4)) ELSE 0::BIGINT END) AS BIGINT) AS bval
       |  FROM proj GROUP BY vec_id, p // 4)""".stripMargin

  private val duckLshScored =
    s"""$duckLshBands,
       |$duckQsel,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id != b.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM qsel)),
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
  // 256-dim operating point (r14 verdict #3): real encoder output is
  // 384-1536-dim, which changes the LSH plane budget and projection
  // cost. The corpus lifts 64 -> 256 dims by a BLOCK ISOMETRY — four
  // sign-flipped circular shifts stacked: dot256(x,y) = 4*dot64(x,y)
  // and nrm256 = 4*nrm64 EXACTLY (integers), so cosine structure — and
  // therefore the brute-force ground truth — is preserved by
  // construction, while the index machinery (16 hyperplanes x 256
  // terms, the band join, the projection pass) runs at genuine 256-dim
  // cost. Both engines derive the lift from the same pure (b, j)
  // functions, so the hash-compare holds at any scale factor.
  // ------------------------------------------------------------------
  private val sparkV256 =
    """v256 AS (
      |  SELECT vec_id, flatten(transform(sequence(0, 3), b ->
      |    transform(sequence(0, 63), j ->
      |      IF((j + b) % 2 = 0, 1L, -1L)
      |        * element_at(qe, CAST(pmod(j + b * 16, 64) + 1 AS INT))))) AS qe
      |  FROM v)""".stripMargin

  private val duckV256 =
    """v256 AS (
      |  SELECT vec_id, flatten(list_transform(range(0, 4), b ->
      |    list_transform(range(0, 64), j ->
      |      CASE WHEN (j + b) % 2 = 0 THEN 1::BIGINT ELSE -1::BIGINT END
      |        * qe[CAST((j + b * 16) % 64 + 1 AS INTEGER)]))) AS qe
      |  FROM v)""".stripMargin

  private val planeLit256Cache = scala.collection.concurrent.TrieMap.empty[Int, String]
  private def planeLit256(p: Int): String =
    planeLit256Cache.getOrElseUpdate(p,
      (0 until 256).map(d => s"${planeWeight(p, d)}L").mkString("array(", ",", ")"))

  /** 256-dim literal-plane projection: 16 hyperplanes from the same
    * pure (plane, dim) weight function extended to 256 dims, computed
    * over v256. Materialized once per session/dir as `proj256` (see
    * [[embs256]]); banding and multiprobe flips derive row-locally.
    * Scoring reuses the 64-dim vectors (the lift preserves cosine
    * exactly, so candidates pay the cheap dot product).
    */
  private val sparkProjt256 =
    s"""projt AS (
       |  SELECT vec_id, array(
       |    ${(0 until 16).map(p => s"dot_i64(qe, ${planeLit256(p)})").mkString(",\n       |    ")}) AS pr
       |  FROM v256)""".stripMargin

  // 4 bands x 4 sign bits folded from the materialized projections — a
  // row-local transform of proj256, no recomputation of the 256-term dots
  private val sparkBands256 = {
    val bval = (0 until 4).map(i => s"IF(pr[b*4+$i] > 0, ${1L << i}L, 0L)").mkString(" + ")
    s"""bands AS (
       |  SELECT vec_id, b AS band, CAST($bval AS BIGINT) AS bval
       |  FROM proj256 LATERAL VIEW explode(sequence(0, 3)) t AS b)""".stripMargin
  }

  private val duckBands256 =
    s"""planes AS (
       |  SELECT pp.p, dd.d, (${duckH64("pp.p::VARCHAR || '_' || dd.d::VARCHAR")} % 2001) - 1000 AS wgt
       |  FROM (SELECT unnest(generate_series(0, 15)) AS p) pp
       |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS d) dd),
       |proj AS (
       |  SELECT v256.vec_id, planes.p, sum(v256.qe[planes.d + 1] * planes.wgt) AS s
       |  FROM v256 CROSS JOIN planes GROUP BY v256.vec_id, planes.p),
       |bands AS (
       |  SELECT vec_id, p // 4 AS band,
       |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << (p % 4)) ELSE 0::BIGINT END) AS BIGINT) AS bval
       |  FROM proj GROUP BY vec_id, p // 4)""".stripMargin

  private val sparkLsh256Scored =
    s"""$sparkBands256,
       |$sparkQsel,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id != b.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM qsel)),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    dot_i64(qv.qe, nv.qe) AS dot, qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  private val duckLsh256Scored =
    s"""$duckV256,
       |$duckBands256,
       |$duckQsel,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id != b.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM qsel)),
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

  // Query-directed multi-probe LSH: besides its own 4 band values, each
  // query probes the buckets reached by flipping the 4 sign bits whose
  // projection magnitude |s| is smallest — exactly the bits most likely
  // to have landed on the wrong side of a hyperplane. 8 probes/query
  // total. Measured frontier at sf0.01 over the 100-query qsel set
  // (recall@5 / corpus fraction scanned): directed-4 = 0.67/0.42
  // (chosen) vs single-probe 0.45 — and blind hamming-1 (all 16 flips)
  // scans ~2x for a smaller gain. Probing is the recall lever that costs
  // extra bucket READS only — no index copies, no rebuild — so at
  // 100 TB the same banded index serves every point on this frontier.
  private val sparkMultiprobeScored =
    s"""$sparkBands64,
       |$sparkQsel,
       |qproj AS (
       |  SELECT vec_id, p, s FROM proj64 LATERAL VIEW posexplode(pr) t AS p, s
       |  WHERE vec_id IN (SELECT vec_id FROM qsel)),
       |flips AS (
       |  SELECT vec_id, p DIV 4 AS band, shiftleft(CAST(1 AS BIGINT), p % 4) AS bit,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY abs(s), p) AS rnk
       |  FROM qproj),
       |probes AS (
       |  SELECT vec_id, band, bval AS pval FROM bands WHERE vec_id IN (SELECT vec_id FROM qsel)
       |  UNION ALL
       |  SELECT f.vec_id, f.band, b.bval ^ f.bit AS pval
       |  FROM flips f JOIN bands b ON b.vec_id = f.vec_id AND b.band = f.band
       |  WHERE f.rnk <= 4),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM probes p JOIN bands b
       |    ON b.band = p.band AND b.bval = p.pval AND b.vec_id != p.vec_id),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    dot_i64(qv.qe, nv.qe) AS dot, qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  private val duckMultiprobeScored =
    s"""$duckLshBands,
       |$duckQsel,
       |qproj AS (SELECT vec_id, p, s FROM proj WHERE vec_id IN (SELECT vec_id FROM qsel)),
       |flips AS (
       |  SELECT vec_id, p // 4 AS band, (1::BIGINT << (p % 4)) AS bit,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY abs(s), p) AS rnk
       |  FROM qproj),
       |probes AS (
       |  SELECT vec_id, band, bval AS pval FROM bands WHERE vec_id IN (SELECT vec_id FROM qsel)
       |  UNION ALL
       |  SELECT f.vec_id, f.band, xor(b.bval, f.bit) AS pval
       |  FROM flips f JOIN bands b ON b.vec_id = f.vec_id AND b.band = f.band
       |  WHERE f.rnk <= 4),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM probes p JOIN bands b
       |    ON b.band = p.band AND b.bval = p.pval AND b.vec_id != p.vec_id),
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

  // Directed multiprobe at the 256-dim operating point: identical probe
  // policy to the 64-dim family (own 4 band values + the 4 lowest-|s|
  // sign-bit flips = 8 probes/query), but the projections come from the
  // materialized proj256 artifact — flip selection is a posexplode of
  // the stored pr array, so the multiprobe point costs zero extra
  // projection passes over the single-probe index. The 100 TB story is
  // unchanged: probing multiplies bucket READS only; the index (one
  // (band, bval) row per vector per band) is shared across the whole
  // 256-dim family.
  private val sparkMultiprobe256Scored =
    s"""$sparkBands256,
       |$sparkQsel,
       |qproj AS (
       |  SELECT vec_id, p, s FROM proj256 LATERAL VIEW posexplode(pr) t AS p, s
       |  WHERE vec_id IN (SELECT vec_id FROM qsel)),
       |flips AS (
       |  SELECT vec_id, p DIV 4 AS band, shiftleft(CAST(1 AS BIGINT), p % 4) AS bit,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY abs(s), p) AS rnk
       |  FROM qproj),
       |probes AS (
       |  SELECT vec_id, band, bval AS pval FROM bands WHERE vec_id IN (SELECT vec_id FROM qsel)
       |  UNION ALL
       |  SELECT f.vec_id, f.band, b.bval ^ f.bit AS pval
       |  FROM flips f JOIN bands b ON b.vec_id = f.vec_id AND b.band = f.band
       |  WHERE f.rnk <= 4),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM probes p JOIN bands b
       |    ON b.band = p.band AND b.bval = p.pval AND b.vec_id != p.vec_id),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    dot_i64(qv.qe, nv.qe) AS dot, qv.nrm AS n1, nv.nrm AS n2
       |  FROM cand c JOIN v qv ON qv.vec_id = c.query_id
       |              JOIN v nv ON nv.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
       |  FROM pairs)""".stripMargin

  private val duckMultiprobe256Scored =
    s"""$duckV256,
       |$duckBands256,
       |$duckQsel,
       |qproj AS (SELECT vec_id, p, s FROM proj WHERE vec_id IN (SELECT vec_id FROM qsel)),
       |flips AS (
       |  SELECT vec_id, p // 4 AS band, (1::BIGINT << (p % 4)) AS bit,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY abs(s), p) AS rnk
       |  FROM qproj),
       |probes AS (
       |  SELECT vec_id, band, bval AS pval FROM bands WHERE vec_id IN (SELECT vec_id FROM qsel)
       |  UNION ALL
       |  SELECT f.vec_id, f.band, xor(b.bval, f.bit) AS pval
       |  FROM flips f JOIN bands b ON b.vec_id = f.vec_id AND b.band = f.band
       |  WHERE f.rnk <= 4),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM probes p JOIN bands b
       |    ON b.band = p.band AND b.bval = p.pval AND b.vec_id != p.vec_id),
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact n-gram Jaccard verification, gated on the MinHash band
    // prefilter: pair generation is the band-signature equi-join (never
    // the inverted-index join, whose candidate count grows quadratically
    // with shingle-bucket density); only surviving candidates pay the
    // exact intersection count. Emits both Jaccard and the overlap
    // coefficient. Pairs whose true Jaccard >= 0.8 but which collide in
    // no band are (deterministically, in both engines) not reported —
    // the standard LSH recall trade (16 perms, 4x4 banding: >= 88%
    // expected recall at the 0.8 threshold).
    "x_dedup_ngram_jaccard" -> ((s, dir) => docsWithInter(s, dir,
      """SELECT i.d1, i.d2,
        |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS jaccard,
        |  CAST(i.inter AS DOUBLE) / least(n1.n, n2.n) AS overlap
        |FROM dedup_inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
        |WHERE CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) >= 0.8""".stripMargin)),

    // MinHash + LSH banding end-to-end: candidates from band-signature
    // equality over the cached signature view, then exact verify. The
    // banding join is the 100 TB path: no all-pairs step anywhere.
    "x_dedup_minhash_lsh" -> ((s, dir) => docsWithInter(s, dir,
      """SELECT i.d1, i.d2,
        |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS jaccard
        |FROM dedup_inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
        |WHERE CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) >= 0.8""".stripMargin)),

    // Near-dup CLUSTERS: connected components over the verified jaccard
    // pairs (band-prefiltered, same as x_dedup_ngram_jaccard — the
    // cached shingle/signature views are shared) via iterative
    // min-label propagation (each iteration one
    // equi-join + groupBy — the scalable formulation; converges in
    // O(diameter) rounds, and near-dup components have tiny diameters).
    // Oracle: DuckDB recursive-CTE transitive closure.
    "x_dedup_clusters" -> ((s, dir) => {
      val pairs = queries("x_dedup_ngram_jaccard")(s, dir)
        .select("d1", "d2").localCheckpoint()
      connectedComponents(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    }),

    // Same labeling via the alternating large-star/small-star algorithm
    // (ops.ConnectedComponents) — the shuffle-balanced formulation whose
    // per-round keys are node ids (degree-distributed), never component
    // labels: on a 100 TB graph with a giant component, pointer-jumping's
    // label-keyed jump join concentrates on one reducer while this one
    // doesn't. Both algorithms must produce the identical labeling; the
    // oracle is the same recursive-CTE closure as x_dedup_clusters.
    "x_cc_largestar" -> ((s, dir) => {
      val pairs = queries("x_dedup_ngram_jaccard")(s, dir)
        .select("d1", "d2").localCheckpoint()
      ops.ConnectedComponents.largeStarSmallStar(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    }),

    // Survivorship: every near-dup cluster elects ONE canonical document
    // — highest composite quality score (the x_quality_score formula),
    // ties to the smallest doc_id — and the rest are marked dropped.
    // Scale shape: the ranking window runs ONLY over cluster-labeled
    // docs (the tiny near-dup subset — the clusters table comes from the
    // band-prefiltered edge pipeline, so it is O(dups), not O(corpus));
    // the corpus-sized side is a broadcast anti-join against that small
    // label table, so no window function ever touches the full corpus.
    "x_dedup_survivorship" -> ((s, dir) => {
      queries("x_dedup_clusters")(s, dir).createOrReplaceTempView("dup_clusters")
      Tables(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(
        """WITH q AS (
          |  SELECT doc_id,
          |    0.5 * (CAST(size(array_distinct(split(text, '\\s+'))) AS DOUBLE) / size(split(text, '\\s+')))
          |      + 0.3 * (1.0 - CAST(size(filter(split(text, '\\s+'), x -> x IN ('the','a','of','and'))) AS DOUBLE) / size(split(text, '\\s+')))
          |      + 0.2 * least(CAST(size(split(text, '\\s+')) AS DOUBLE) / 50.0, 1.0) AS quality_score
          |  FROM documents),
          |labeled AS (
          |  SELECT q.doc_id, c.cluster_id, q.quality_score
          |  FROM q JOIN dup_clusters c ON c.doc_id = q.doc_id),
          |ranked AS (
          |  SELECT doc_id, cluster_id, quality_score,
          |    row_number() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id) AS rk,
          |    count(*) OVER (PARTITION BY cluster_id) AS sz
          |  FROM labeled)
          |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
          |  CAST(sz AS BIGINT) AS cluster_size, quality_score, rk = 1 AS kept
          |FROM ranked
          |UNION ALL
          |SELECT q.doc_id, q.doc_id AS cluster_id, CAST(1 AS BIGINT) AS cluster_size,
          |  q.quality_score, true AS kept
          |FROM q LEFT ANTI JOIN dup_clusters c ON c.doc_id = q.doc_id""".stripMargin)
    }),

    // SimHash over distinct tokens + banded candidate join, at a
    // corpus-adaptive operating point (adaptiveSimhashBits): 3 bands of
    // b bits each over a 3b-bit signature, b = smallest in [12, 20] with
    // n <= 2^b. The pigeonhole guarantee is width-independent (hamming
    // <= 2 flips dirty at most 2 of 3 bands), so widening bands with the
    // corpus cuts random-collision candidates exponentially while recall
    // stays EXACT — the fix for the 4.4x sf1 slope the fixed 11/11/10
    // layout measured. The bit tallies run as 3b codegen'd conditional
    // sums in ONE pass over the token rows — no bit-explosion shuffle —
    // and the signature table materializes once (cached temp view)
    // instead of being recomputed per band-join side. (The DuckDB oracle
    // keeps the straightforward exploded CTE form and computes the SAME
    // b from its own count(*) — results identical at any corpus size.)
    "x_dedup_simhash" -> ((s, dir) => {
      val bits = adaptiveSimhashBits(Tables.rowCount(s, dir, "documents"))
      val w = 3 * bits
      val mask = (1L << bits) - 1
      // same registration memoization as registerDedupViews: building
      // the tally plan for the sameResult check costs more than the
      // served query (bits is a pure function of dir, so keying on dir
      // keys the operating point too)
      if (!simhashFor.get(s).contains(dir)) simhashFor.synchronized {
        if (!simhashFor.get(s).contains(dir)) {
          simhashFor.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
          Tables(s, dir, "documents").createOrReplaceTempView("documents")
          Tables.cacheView("simhash_sig", s.sql(
            s"""WITH w AS (SELECT doc_id, explode(array_distinct(split(text, '\\\\s+'))) AS word FROM documents),
               |h AS (SELECT doc_id, ${h64("word")} AS hw FROM w),
               |tallies AS (SELECT doc_id,
               |  ${(0 until w).map(b => s"sum(CASE WHEN (shiftright(hw, $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")}
               |  FROM h GROUP BY doc_id)
               |SELECT doc_id, CAST(${(0 until w).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b}L ELSE 0L END)").mkString(" + ")} AS BIGINT) AS simhash
               |FROM tallies""".stripMargin))
          simhashFor.update(s, dir)
        }
      }
      s.sql(
        s"""WITH bands AS (SELECT doc_id, simhash, k,
           |    shiftright(simhash, k * $bits) & $mask AS band
           |  FROM simhash_sig LATERAL VIEW explode(sequence(0, 2)) t AS k),
           |cand AS (SELECT DISTINCT a.doc_id AS d1, a.simhash AS s1, b.doc_id AS d2, b.simhash AS s2
           |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
           |SELECT d1, d2, CAST(bit_count(s1 ^ s2) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(s1 ^ s2) <= 2""".stripMargin)
    }),

    // Embedding cosine near-dup over integer-quantized vectors, with
    // hyperplane-LSH banded candidates (precomputed-literal hyperplanes
    // -> 4 bands of sign bits; candidates share at least one band value
    // — see lshBandsSql for the zero-shuffle banding). Pair generation
    // is a (band, value) equi-join and only candidates pay the exact
    // dot product. Unlike the query-bounded ANN paths, this is an
    // ALL-PAIRS candidate join, so a FIXED band width makes bucket
    // occupancy — and the candidate count — grow O(n^2 / 2^bits): the
    // sf0.1 -> sf1 slope bench measured 38x wall-clock at 10x rows with
    // 4-bit bands. The operating point therefore adapts to the corpus:
    // the smallest bandBits in [4, 16] with n <= 64 * 2^bandBits keeps
    // expected occupancy (<= 64 rows per band value) and candidates
    // O(n) at any scale — the standard LSH sizing rule. The [4, 16]
    // clamp is the shared operating envelope (occupancy re-grows past
    // n ~ 4M; widen the clamp AND the oracle's nb/planes ranges
    // together to raise it — plane literals themselves generate on
    // demand from planeWeight). The rule is INTEGER-exact
    // (shift-and-compare, no floating log), and the DuckDB oracle
    // computes the identical rule from its own count(*) — both engines
    // pick the same width at ANY corpus size, so the hash-compare
    // holds at every scale factor, not just the sf0.01 gate.
    "x_dedup_embedding" -> ((s, dir) => {
      val bandBits = adaptiveBandBits(Tables.rowCount(s, dir, "embeddings"))
      embs(s, dir,
      s"""WITH $sparkQuant,
         |${lshBandsSql(bandBits)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT c.v1, c.v2, dot_i64(a.qe, b.qe) AS dot, a.nrm AS n1, b.nrm AS n2
         |  FROM cand c JOIN v a ON a.vec_id = c.v1 JOIN v b ON b.vec_id = c.v2)
         |SELECT v1, v2,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |FROM pairs
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) >= 0.4""".stripMargin)
    }),

    // Array/higher-order function surface over the quantized vectors:
    // slicing, extrema, membership, filtered counts, element sums.
    "f_array_functions" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant
         |SELECT vec_id,
         |  CAST(size(qe) AS BIGINT) AS dim,
         |  element_at(qe, 1) AS first_q,
         |  array_max(qe) AS max_q,
         |  array_min(qe) AS min_q,
         |  dot_i64(qe, qe) AS sum_sq,
         |  CAST(size(filter(qe, x -> x > 0)) AS BIGINT) AS n_positive,
         |  aggregate(slice(qe, 1, 8), CAST(0 AS BIGINT), (acc, x) -> acc + x) AS head8_sum
         |FROM q""".stripMargin)),

    // Embedding hygiene audit — the validation pass a vector pipeline
    // runs BEFORE indexing: per label, dimension consistency, zero
    // vectors (an upstream encoder failure mode), dead dimensions per
    // vector, and norm² outliers (> 30% off the label's mean norm² —
    // truncated/duplicated payloads). All exact integers over the
    // quantized embeddings: norm² via dot_i64, the mean via integer DIV,
    // the outlier rule a cross-multiplication — no division, no libm, no
    // overflow (|dev|·10 stays far inside BIGINT at any corpus size).
    // One combine-friendly groupBy on label; nothing is all-pairs.
    "x_vector_hygiene" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant,
         |per AS (
         |  SELECT vec_id, label, CAST(size(qe) AS BIGINT) AS n_dims,
         |    dot_i64(qe, qe) AS nrm2,
         |    CAST(size(filter(qe, x -> x = 0)) AS BIGINT) AS n_zero_dims
         |  FROM q),
         |m AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
         |    CAST(min(n_dims) AS BIGINT) AS min_dims,
         |    CAST(max(n_dims) AS BIGINT) AS max_dims,
         |    CAST(sum(CASE WHEN nrm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
         |    CAST(sum(nrm2) DIV count(*) AS BIGINT) AS mean_norm2,
         |    CAST(sum(n_zero_dims) AS BIGINT) AS total_zero_dims
         |  FROM per GROUP BY label)
         |SELECT m.label, m.n_vectors, m.min_dims = m.max_dims AS dims_consistent,
         |  m.n_zero_vectors, m.mean_norm2, m.total_zero_dims,
         |  CAST(sum(CASE WHEN abs(per.nrm2 - m.mean_norm2) * 10 > m.mean_norm2 * 3
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_outliers
         |FROM per JOIN m ON m.label = per.label
         |GROUP BY m.label, m.n_vectors, m.min_dims, m.max_dims, m.n_zero_vectors,
         |  m.mean_norm2, m.total_zero_dims""".stripMargin)),

    // Brute-force cosine top-10 per query vector — the declared
    // correctness/ground-truth BASELINE for the ANN family, kept
    // deliberately exact (O(|Q| * n) with |Q| fixed at 100 by qsel).
    // The serving paths are its scale-safe siblings: x_ann_lsh /
    // x_ann_multiprobe (banded), x_ann_ivf_kmeans (partition-bounded),
    // x_ann_pq / x_ann_ivfpq (memory-bounded). Do not "optimize" this
    // query into one of them — the recall harnesses compare against it.
    "x_ann_topk" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant,
         |$sparkQsel,
         |qs AS (SELECT * FROM qsel),
         |pairs AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    dot_i64(qs.qe, v.qe) AS dot,
         |    qs.nrm AS n1, v.nrm AS n2
         |  FROM qs JOIN v ON qs.vec_id != v.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |  FROM pairs)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 10""".stripMargin)),

    // IVF-style ANN: the label column is the coarse quantizer (inverted
    // list id); search probes only the query's own list. At 100 TB the
    // lists are hash-partitioned so each probe touches one partition's
    // worth of vectors instead of the corpus.
    "x_ann_ivf" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant,
         |$sparkQsel,
         |qs AS (SELECT * FROM qsel),
         |pairs AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    dot_i64(qs.qe, v.qe) AS dot,
         |    qs.nrm AS n1, v.nrm AS n2
         |  FROM qs JOIN v ON qs.label = v.label AND qs.vec_id != v.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |  FROM pairs)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // Top-k via the typed Aggregator (functions.TopKAggregator) over the
    // LSH bucket candidates: the scale composition — candidate generation
    // is the bucket equi-join (not all-pairs), and the per-query top-k
    // reduction is map-side combinable (each partition reduces to k rows
    // before the shuffle). Same total order as the window form, so the
    // window-based oracle applies (k=8).
    "x_ann_topk_agg" -> ((s, dir) => {
      val scored = embs64(s, dir,
        s"""WITH $sparkQuant,
           |$sparkLshScored
           |SELECT query_id, neighbor_id AS id, cos AS score FROM scored""".stripMargin)
      import s.implicits._
      import graft.functions.{Scored, TopKAggregator}
      val ds = scored.as[(Long, Long, Double)]
      ds.groupByKey(_._1)
        .mapValues(t => Scored(t._2, t._3))
        .agg(new TopKAggregator(8).toColumn.name("top"))
        .flatMap { case (qid, top) =>
          top.zipWithIndex.map { case (sc, i) => (qid, sc.id, (i + 1).toLong, sc.score) }
        }
        .toDF("query_id", "neighbor_id", "rank", "cos")
    }),

    // LSH-banded ANN: top-5 by exact cosine within the banded candidate
    // set. The scale path: candidates come from 4 per-band hash-equi
    // joins, never the full corpus.
    "x_ann_lsh" -> ((s, dir) => embs64(s, dir,
      s"""WITH $sparkQuant,
         |$sparkLshScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // 256-dim LSH ANN: banded candidates from the block-isometric
    // 256-dim lift (16 hyperplanes x 256 terms — the plane budget and
    // projection cost of a real encoder dimension), scored by the exact
    // cosine the lift preserves. The projection pass is the shared
    // proj256 artifact (embs256) — paid once for the whole family.
    "x_ann_lsh_highdim" -> ((s, dir) => embs256(s, dir,
      s"""WITH $sparkQuant,
         |$sparkLsh256Scored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // Recall@5 of the 256-dim banded search vs the exact ground truth
    // (identical to the 64-dim truth by the isometry) — the high-dim
    // point on the ANN operating dashboard.
    "x_ann_recall_highdim" -> ((s, dir) => embs256(s, dir,
      s"""WITH $sparkQuant,
         |$sparkLsh256Scored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin)),

    // The 256-dim multiprobe point on the ANN operating dashboard:
    // recall@5 vs the exact ground truth AND the corpus fraction
    // scanned, as one value-checked row. Probes are derived from the
    // shared proj256 artifact, so this point costs no extra projection
    // pass over the single-probe 256-dim index — the recall/scan trade
    // a user consults before choosing a probe budget at encoder
    // dimensionality.
    "x_ann_multiprobe_highdim" -> ((s, dir) => embs256(s, dir,
      s"""WITH $sparkQuant,
         |$sparkMultiprobe256Scored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
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

    // Recall harness: recall@5 of the LSH-bucketed search against the
    // brute-force ground truth, as one aggregated row. Everything is
    // deterministic integer/total-order math, so the measured recall is a
    // value-checked oracle quantity, not a flaky statistic — the number a
    // user tunes plane count / band shape against before scaling out.
    "x_ann_recall" -> ((s, dir) => embs64(s, dir,
      s"""WITH $sparkQuant,
         |$sparkLshScored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin)),

    // Dimension-truncation recall (the Matryoshka question): recall@5 of
    // brute-force search over only the FIRST 16 of 64 dims vs the
    // full-dimension ground truth — the number that decides whether a
    // prefix-truncated index (4× less memory and bandwidth per vector)
    // is retrieval-safe for this corpus. Same qsel and total-order
    // discipline as the other recall rows; zero-norm prefixes rank last
    // via a coalesced sentinel, identically in both engines.
    "x_ann_recall_trunc" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant,
         |$sparkQsel,
         |tv AS (SELECT vec_id, slice(qe, 1, 16) AS te FROM v),
         |tn AS (SELECT vec_id, te, dot_i64(te, te) AS tnrm FROM tv),
         |trunc_scored AS (
         |  SELECT qs.vec_id AS query_id, t2.vec_id AS neighbor_id,
         |    coalesce(CAST(dot_i64(t1.te, t2.te) AS DOUBLE)
         |      / (sqrt(CAST(NULLIF(t1.tnrm, 0) AS DOUBLE))
         |         * sqrt(CAST(NULLIF(t2.tnrm, 0) AS DOUBLE))), CAST(-2 AS DOUBLE)) AS cos
         |  FROM qsel qs
         |  JOIN tn t1 ON t1.vec_id = qs.vec_id
         |  JOIN tn t2 ON t2.vec_id != qs.vec_id),
         |trunc_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM trunc_scored) t WHERE rank <= 5),
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
         |  FROM brute_top b LEFT JOIN trunc_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin)),

    // IVF twin of the recall harness: recall@5 when probing only the
    // query's own coarse list (nprobe=1). Quantifies what the
    // partition-bounded probe gives up vs the banded LSH — together the
    // two recall rows are the operating-point dashboard for the ANN paths.
    "x_ann_recall_ivf" -> ((s, dir) => embs(s, dir,
      s"""WITH $sparkQuant,
         |$sparkQsel,
         |ivf_scored AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    CAST(dot_i64(qs.qe, v.qe) AS DOUBLE)
         |      / (sqrt(CAST(qs.nrm AS DOUBLE)) * sqrt(CAST(v.nrm AS DOUBLE))) AS cos
         |  FROM qsel qs
         |  JOIN v ON qs.label = v.label AND qs.vec_id != v.vec_id),
         |ivf_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM ivf_scored) t WHERE rank <= 5),
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
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin)),

    // Multi-probe LSH ANN: top-5 by exact cosine within the multi-probe
    // candidate set (own band value + 4 hamming-1 probes per band).
    "x_ann_multiprobe" -> ((s, dir) => embs64(s, dir,
      s"""WITH $sparkQuant,
         |$sparkMultiprobeScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // Recall + cost row for the multi-probe search: recall@5 vs brute
    // force AND the fraction of the corpus actually scanned, as one
    // value-checked row — the third point on the ANN operating-point
    // dashboard (single-probe LSH, IVF nprobe=1, multi-probe LSH).
    "x_ann_recall_multiprobe" -> ((s, dir) => embs64(s, dir,
      s"""WITH $sparkQuant,
         |$sparkMultiprobeScored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
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

    // MinHash Jaccard ESTIMATE vs exact: the per-pair signature-agreement
    // estimate (fraction of the 16 permutations whose minima agree)
    // against the exact shingle-set Jaccard, with a 0.35 tolerance flag
    // (3-sigma for a 16-permutation sketch). Both engines compute both
    // quantities exactly, so every column is value-checked — this is the
    // calibration harness a user consults before trusting estimate-only
    // dedup at 100 TB, where the exact column is dropped and only the
    // O(perms) sketch comparison runs.
    // Asymmetric containment |S1 n S2| / |Si| over the band-gated
    // candidate pairs: catches a short document swallowed by a longer one
    // (subset duplication), which symmetric Jaccard under-scores. Same
    // cached shingle/signature views; integer milli-containment (exact
    // BIGINT division) on both sides of each pair.
    "x_containment" -> ((s, dir) => docsWithInter(s, dir,
      """SELECT i.d1, i.d2, n1.n AS n1, n2.n AS n2,
        |  (i.inter * 1000) DIV n1.n AS c12_milli,
        |  (i.inter * 1000) DIV n2.n AS c21_milli
        |FROM dedup_inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
        |WHERE (i.inter * 1000) DIV n1.n >= 500 OR (i.inter * 1000) DIV n2.n >= 500""".stripMargin)),

    // the signature-agreement pairs come from dedup_inter (the final
    // SELECT inner-joins inter and agree anyway, so candidate pairs
    // outside the intersection table could never reach the output)
    "x_jaccard_estimate" -> ((s, dir) => docsWithInter(s, dir,
      """WITH agree AS (
        |  SELECT i.d1, i.d2, sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS n_agree
        |  FROM dedup_inter i JOIN mh a ON a.doc_id = i.d1
        |              JOIN mh b ON b.doc_id = i.d2 AND b.p = a.p
        |  GROUP BY i.d1, i.d2)
         |SELECT i.d1, i.d2,
         |  CAST(g.n_agree AS DOUBLE) / 16 AS est_jaccard,
         |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS exact_jaccard,
         |  abs(CAST(g.n_agree AS DOUBLE) / 16
         |      - CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter)) <= 0.35 AS within_tol
         |FROM dedup_inter i JOIN agree g ON g.d1 = i.d1 AND g.d2 = i.d2
         |JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2""".stripMargin)),

    // INCREMENTAL dedup — the steady-state ingestion shape: a new batch
    // (doc_id % 10 = 0 stands in) checked against the already-ingested
    // corpus rather than all-vs-all. Band signatures gate the probe, so
    // at 100 TB the per-batch cost is |batch| band-key lookups against
    // the corpus signature table (the shared cached view `mh_sig`; in
    // production a bucketed table maintained across batches),
    // independent of the corpus's internal pair count. Every new doc
    // reports how many corpus docs it band-collides with and the
    // resulting drop verdict.
    "x_dedup_incremental" -> ((s, dir) => docsWithBands(s, dir,
      """WITH newd AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
        |hits AS (
        |  SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_old
        |  FROM mh_sig a JOIN mh_sig b
        |    ON a.band = b.band AND a.sig = b.sig
        |  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0)
        |SELECT nd.doc_id, CAST(count(h.d_old) AS BIGINT) AS n_corpus_dups,
        |  count(h.d_old) > 0 AS dropped
        |FROM newd nd LEFT JOIN hits h ON h.d_new = nd.doc_id
        |GROUP BY nd.doc_id""".stripMargin))
  )

  def oracle: Map[String, String] = Map(

    "x_vector_hygiene" ->
      s"""WITH $duckQuant,
         |per AS (
         |  SELECT vec_id, label, CAST(len(qe) AS BIGINT) AS n_dims,
         |    CAST(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) AS BIGINT) AS nrm2,
         |    CAST(len(list_filter(qe, x -> x = 0)) AS BIGINT) AS n_zero_dims
         |  FROM q),
         |m AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
         |    CAST(min(n_dims) AS BIGINT) AS min_dims,
         |    CAST(max(n_dims) AS BIGINT) AS max_dims,
         |    CAST(sum(CASE WHEN nrm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
         |    CAST(sum(nrm2) // count(*) AS BIGINT) AS mean_norm2,
         |    CAST(sum(n_zero_dims) AS BIGINT) AS total_zero_dims
         |  FROM per GROUP BY label)
         |SELECT m.label, m.n_vectors, m.min_dims = m.max_dims AS dims_consistent,
         |  m.n_zero_vectors, m.mean_norm2, m.total_zero_dims,
         |  CAST(sum(CASE WHEN abs(per.nrm2 - m.mean_norm2) * 10 > m.mean_norm2 * 3
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_outliers
         |FROM per JOIN m ON m.label = per.label
         |GROUP BY m.label, m.n_vectors, m.min_dims, m.max_dims, m.n_zero_vectors,
         |  m.mean_norm2, m.total_zero_dims""".stripMargin,

    "x_dedup_incremental" ->
      s"""WITH $duckShingles,
         |$duckPermsMh,
         |sig AS (
         |  SELECT doc_id, p // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY p) AS sig
         |  FROM mh GROUP BY doc_id, p // 4),
         |newd AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
         |hits AS (
         |  SELECT DISTINCT b.doc_id AS d_new, a.doc_id AS d_old
         |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
         |  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0)
         |SELECT nd.doc_id, CAST(count(h.d_old) AS BIGINT) AS n_corpus_dups,
         |  count(h.d_old) > 0 AS dropped
         |FROM newd nd LEFT JOIN hits h ON h.d_new = nd.doc_id
         |GROUP BY nd.doc_id""".stripMargin,

    "x_dedup_ngram_jaccard" ->
      s"""WITH $duckShingles,
         |$duckBandCand,
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
         |  GROUP BY c.d1, c.d2)
         |SELECT i.d1, i.d2,
         |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS jaccard,
         |  CAST(i.inter AS DOUBLE) / least(n1.n, n2.n) AS overlap
         |FROM inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
         |WHERE CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) >= 0.8""".stripMargin,

    "x_containment" ->
      s"""WITH $duckShingles,
         |$duckBandCand,
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
         |  GROUP BY c.d1, c.d2)
         |SELECT i.d1, i.d2, n1.n AS n1, n2.n AS n2,
         |  (i.inter * 1000) // n1.n AS c12_milli,
         |  (i.inter * 1000) // n2.n AS c21_milli
         |FROM inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
         |WHERE (i.inter * 1000) // n1.n >= 500 OR (i.inter * 1000) // n2.n >= 500""".stripMargin,

    "x_dedup_minhash_lsh" ->
      s"""WITH $duckShingles,
         |$duckBandCand,
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
         |  GROUP BY c.d1, c.d2)
         |SELECT i.d1, i.d2,
         |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS jaccard
         |FROM inter i JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2
         |WHERE CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) >= 0.8""".stripMargin,

    "x_dedup_clusters" -> duckClusterClosure,

    // identical truth for the large-star/small-star labeling — both
    // Spark algorithms must match this one closure
    "x_cc_largestar" -> duckClusterClosure,

    "x_dedup_survivorship" ->
      s"""WITH RECURSIVE $duckShingles,
         |$duckBandCand,
         |prs AS (
         |  SELECT p.d1, p.d2 FROM (
         |    SELECT c.d1, c.d2, count(*) AS inter
         |    FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
         |    GROUP BY c.d1, c.d2) p
         |  JOIN n n1 ON n1.doc_id = p.d1 JOIN n n2 ON n2.doc_id = p.d2
         |  WHERE CAST(inter AS DOUBLE) / (n1.n + n2.n - inter) >= 0.8),
         |edges AS (SELECT d1 AS a, d2 AS b FROM prs UNION SELECT d2, d1 FROM prs),
         |closure(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a),
         |clusters AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |  FROM closure GROUP BY a),
         |q AS (
         |  SELECT doc_id,
         |    0.5 * (CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE) / len(string_split_regex(text, '\\s+')))
         |      + 0.3 * (1.0 - CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x IN ('the','a','of','and'))) AS DOUBLE) / len(string_split_regex(text, '\\s+')))
         |      + 0.2 * least(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) / 50.0, 1.0) AS quality_score
         |  FROM documents),
         |labeled AS (
         |  SELECT q.doc_id, c.cluster_id, q.quality_score
         |  FROM q JOIN clusters c ON c.doc_id = q.doc_id),
         |ranked AS (
         |  SELECT doc_id, cluster_id, quality_score,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY cluster_id) AS sz
         |  FROM labeled)
         |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         |  CAST(sz AS BIGINT) AS cluster_size, quality_score, rk = 1 AS kept
         |FROM ranked
         |UNION ALL
         |SELECT q.doc_id, q.doc_id AS cluster_id, CAST(1 AS BIGINT) AS cluster_size,
         |  q.quality_score, TRUE AS kept
         |FROM q WHERE q.doc_id NOT IN (SELECT doc_id FROM clusters)""".stripMargin,

    // the band width mirrors the Spark side's integer-exact adaptive
    // rule (adaptiveSimhashBits: smallest b in [12,20] with n <= 2^b,
    // signature width 3*b), computed here from DuckDB's own count(*) —
    // identical at any corpus size
    "x_dedup_simhash" ->
      s"""WITH nb AS (
         |  SELECT COALESCE(MIN(b), 20) AS bits
         |  FROM (SELECT unnest(generate_series(12, 20)) AS b),
         |       (SELECT count(*) AS n FROM documents)
         |  WHERE n <= (1::BIGINT << b)),
         |w AS (SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\\s+'))) AS word FROM documents),
         |h AS (SELECT doc_id, ${duckH64("word")} AS hw FROM w),
         |bits AS (SELECT doc_id, unnest(generate_series(0, 3 * nb.bits - 1)) AS b, hw FROM h, nb),
         |s AS (SELECT doc_id, b,
         |  CASE WHEN sum(CASE WHEN (hw >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
         |  FROM bits GROUP BY doc_id, b),
         |sig AS (SELECT doc_id, CAST(sum(bit * (1::BIGINT << b)) AS BIGINT) AS simhash
         |  FROM s GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, unnest(generate_series(0, 2)) AS k FROM sig),
         |bands2 AS (SELECT doc_id, simhash, k,
         |  (simhash >> (k * nb.bits)) & ((1::BIGINT << nb.bits) - 1) AS band
         |  FROM bands, nb),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, a.simhash AS s1, b.doc_id AS d2, b.simhash AS s2
         |  FROM bands2 a JOIN bands2 b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT d1, d2, CAST(bit_count(xor(s1, s2)::BIT) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(s1, s2)::BIT) <= 2""".stripMargin,

    // the band width mirrors the Spark side's integer-exact adaptive
    // rule (smallest bits in [4,16] with n <= 64 * 2^bits), computed
    // here from DuckDB's own count(*) — identical at any corpus size
    "x_dedup_embedding" ->
      s"""WITH $duckQuant,
         |nb AS (
         |  SELECT COALESCE(MIN(b), 16) AS bits
         |  FROM (SELECT unnest(generate_series(4, 16)) AS b),
         |       (SELECT count(*) AS n FROM embeddings)
         |  WHERE n <= 64 * (1::BIGINT << b)),
         |planes AS (
         |  SELECT pp.p, dd.d, (${duckH64("pp.p::VARCHAR || '_' || dd.d::VARCHAR")} % 2001) - 1000 AS wgt
         |  FROM nb, (SELECT unnest(generate_series(0, 63)) AS p) pp
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) dd
         |  WHERE pp.p < 4 * nb.bits),
         |proj AS (
         |  SELECT v.vec_id, planes.p, sum(v.qe[planes.d + 1] * planes.wgt) AS s
         |  FROM v CROSS JOIN planes GROUP BY v.vec_id, planes.p),
         |bands AS (
         |  SELECT vec_id, p // bits AS band,
         |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << (p % bits)) ELSE 0::BIGINT END) AS BIGINT) AS bval
         |  FROM proj CROSS JOIN nb GROUP BY vec_id, p // bits),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT c.v1, c.v2,
         |    CAST(list_dot_product(a.qe::DOUBLE[], b.qe::DOUBLE[]) AS BIGINT) AS dot,
         |    a.nrm AS n1, b.nrm AS n2
         |  FROM cand c JOIN v a ON a.vec_id = c.v1 JOIN v b ON b.vec_id = c.v2)
         |SELECT v1, v2,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |FROM pairs
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) >= 0.4""".stripMargin,

    "f_array_functions" ->
      s"""WITH $duckQuant
         |SELECT vec_id,
         |  CAST(len(qe) AS BIGINT) AS dim,
         |  qe[1] AS first_q,
         |  list_max(qe) AS max_q,
         |  list_min(qe) AS min_q,
         |  CAST(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) AS BIGINT) AS sum_sq,
         |  CAST(len(list_filter(qe, x -> x > 0)) AS BIGINT) AS n_positive,
         |  CAST(list_sum(qe[1:8]) AS BIGINT) AS head8_sum
         |FROM q""".stripMargin,

    "x_ann_topk" ->
      s"""WITH $duckQuant,
         |$duckQsel,
         |qs AS (SELECT * FROM qsel),
         |pairs AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    CAST(list_dot_product(qs.qe::DOUBLE[], v.qe::DOUBLE[]) AS BIGINT) AS dot,
         |    qs.nrm AS n1, v.nrm AS n2
         |  FROM qs JOIN v ON qs.vec_id != v.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |  FROM pairs)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 10""".stripMargin,

    "x_ann_recall_trunc" ->
      s"""WITH $duckQuant,
         |$duckQsel,
         |tn AS (SELECT vec_id, qe[1:16] AS te,
         |  CAST(list_dot_product((qe[1:16])::DOUBLE[], (qe[1:16])::DOUBLE[]) AS BIGINT) AS tnrm
         |  FROM v),
         |trunc_scored AS (
         |  SELECT qs.vec_id AS query_id, t2.vec_id AS neighbor_id,
         |    coalesce(CAST(list_dot_product(t1.te::DOUBLE[], t2.te::DOUBLE[]) AS DOUBLE)
         |      / (sqrt(CAST(NULLIF(t1.tnrm, 0) AS DOUBLE))
         |         * sqrt(CAST(NULLIF(t2.tnrm, 0) AS DOUBLE))), CAST(-2 AS DOUBLE)) AS cos
         |  FROM qsel qs
         |  JOIN tn t1 ON t1.vec_id = qs.vec_id
         |  JOIN tn t2 ON t2.vec_id != qs.vec_id),
         |trunc_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM trunc_scored) t WHERE rank <= 5),
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
         |  FROM brute_top b LEFT JOIN trunc_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin,

    "x_ann_ivf" ->
      s"""WITH $duckQuant,
         |$duckQsel,
         |qs AS (SELECT * FROM qsel),
         |pairs AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    CAST(list_dot_product(qs.qe::DOUBLE[], v.qe::DOUBLE[]) AS BIGINT) AS dot,
         |    qs.nrm AS n1, v.nrm AS n2
         |  FROM qs JOIN v ON qs.label = v.label AND qs.vec_id != v.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos
         |  FROM pairs)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_ann_topk_agg" ->
      s"""WITH $duckQuant,
         |$duckLshScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 8""".stripMargin,

    "x_ann_lsh" ->
      s"""WITH $duckQuant,
         |$duckLshScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_ann_lsh_highdim" ->
      s"""WITH $duckQuant,
         |$duckLsh256Scored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_ann_recall_highdim" ->
      s"""WITH $duckQuant,
         |$duckLsh256Scored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin,

    "x_ann_multiprobe_highdim" ->
      s"""WITH $duckQuant,
         |$duckMultiprobe256Scored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
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

    "x_ann_recall" ->
      s"""WITH $duckQuant,
         |$duckLshScored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
         |    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin,

    "x_ann_recall_ivf" ->
      s"""WITH $duckQuant,
         |$duckQsel,
         |ivf_scored AS (
         |  SELECT qs.vec_id AS query_id, v.vec_id AS neighbor_id,
         |    CAST(list_dot_product(qs.qe::DOUBLE[], v.qe::DOUBLE[]) AS DOUBLE)
         |      / (sqrt(CAST(qs.nrm AS DOUBLE)) * sqrt(CAST(v.nrm AS DOUBLE))) AS cos
         |  FROM qsel qs
         |  JOIN v ON qs.label = v.label AND qs.vec_id != v.vec_id),
         |ivf_top AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM ivf_scored) t WHERE rank <= 5),
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
         |  GROUP BY b.query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / (5 * count(*)) AS recall_at_5
         |FROM hits""".stripMargin,

    "x_ann_multiprobe" ->
      s"""WITH $duckQuant,
         |$duckMultiprobeScored
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_ann_recall_multiprobe" ->
      s"""WITH $duckQuant,
         |$duckMultiprobeScored,
         |lsh_top AS (
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
         |  FROM brute_top b LEFT JOIN lsh_top l
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

    "x_jaccard_estimate" ->
      s"""WITH $duckShingles,
         |$duckBandCand,
         |agree AS (
         |  SELECT c.d1, c.d2, sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS n_agree
         |  FROM cand c JOIN mh a ON a.doc_id = c.d1
         |              JOIN mh b ON b.doc_id = c.d2 AND b.p = a.p
         |  GROUP BY c.d1, c.d2),
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.shingle_h = a.shingle_h
         |  GROUP BY c.d1, c.d2)
         |SELECT i.d1, i.d2,
         |  CAST(g.n_agree AS DOUBLE) / 16 AS est_jaccard,
         |  CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter) AS exact_jaccard,
         |  abs(CAST(g.n_agree AS DOUBLE) / 16
         |      - CAST(i.inter AS DOUBLE) / (n1.n + n2.n - i.inter)) <= 0.35 AS within_tol
         |FROM inter i JOIN agree g ON g.d1 = i.d1 AND g.d2 = i.d2
         |JOIN n n1 ON n1.doc_id = i.d1 JOIN n n2 ON n2.doc_id = i.d2""".stripMargin
  )
}
