package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the shuffle-balanced alternative to min-label
  * propagation + pointer jumping (`SimilarityQueries.connectedComponents`).
  *
  * Why a second algorithm: pointer jumping's jump step joins on the
  * LABEL column, and labels concentrate as components coalesce — on a
  * 100 TB graph with a giant component, one reducer ends up owning the
  * whole component's label. Large-star/small-star only ever shuffles on
  * NODE id (each round is a groupBy(node) + join on node), so the
  * per-round key distribution is the degree distribution of the current
  * edge set, never the component-size distribution. Each round
  * monotonically lowers every node's smallest reachable neighbor;
  * convergence (the edge set reaches a fixed point of min-rooted stars)
  * takes O(log^2 n) rounds worst-case, ~log n in practice.
  *
  * Semantics match `connectedComponents`: input is an undirected edge
  * list; output is (node, label) with label = the component's minimum
  * node id. Isolated nodes (absent from the edge list) are absent from
  * the output. Non-convergence within the round budget throws — never
  * silently returns a partial labeling (the r10 verdict discipline).
  *
  * Reference scope: the near-dup cluster labeling the reference's
  * curation layer needs downstream of banded similarity joins
  * (SURVEY §2 LLM-pipeline extension); algorithm from the public paper.
  */
object ConnectedComponents {

  /** Label every node in `pairs` (columns d1, d2 — undirected edges)
    * with its component's minimum node id. Returns (node, label).
    */
  def largeStarSmallStar(pairs: DataFrame): DataFrame = {
    // canonical undirected form: (a, b) with a > b, no self-loops
    var canon = pairs
      .select(greatest(col("d1"), col("d2")).as("a"),
        least(col("d1"), col("d2")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()

    val nodes = canon.select(col("a").as("n"))
      .unionAll(canon.select(col("b").as("n"))).distinct().count()
    val log2n = 64 - java.lang.Long.numberOfLeadingZeros(math.max(nodes, 1L))
    val maxRounds = 4 * log2n + 10

    // fixed-point detector: (edge count, bit_xor of a 64-bit pair hash)
    // — order-free, exact, no driver-side edge materialization
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)).as("x")).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(canon)
    var rounds = 0
    var stable = false
    while (!stable) {
      if (rounds >= maxRounds) throw new IllegalStateException(
        s"largeStarSmallStar: not converged after $rounds rounds " +
          s"($nodes nodes) — refusing to return partial component labels")
      val sym = canon.select(col("a").as("u"), col("b").as("v"))
        .unionAll(canon.select(col("b").as("u"), col("a").as("v")))

      // large-star: every neighbor v > u re-attaches to min(Γ(u) ∪ {u})
      val lsMin = sym.groupBy("u").agg(min(least(col("v"), col("u"))).as("m"))
      val ls = sym.filter(col("v") > col("u"))
        .join(lsMin, "u")
        .select(col("v").as("a"), col("m").as("b"))
      val afterLs = ls
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()

      // small-star: every neighbor v < u (and u itself) re-attaches to
      // min of u's strictly-smaller neighborhood
      val symS = afterLs.select(col("a").as("u"), col("b").as("v"))
        .unionAll(afterLs.select(col("b").as("u"), col("a").as("v")))
      val ssMin = symS.filter(col("v") < col("u"))
        .groupBy("u").agg(min("v").as("m"))
      val smaller = symS.filter(col("v") < col("u"))
        .join(ssMin, "u")
        .select(col("v").as("a"), col("m").as("b"))
      val self = ssMin.select(col("u").as("a"), col("m").as("b"))
      canon = smaller.unionAll(self)
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()

      val next = signature(canon)
      stable = next == sig
      sig = next
      rounds += 1
    }

    // fixed point is a set of min-rooted stars: each non-root points to
    // exactly its component min; roots label themselves
    val memberLabels = canon.groupBy(col("a").as("node")).agg(min("b").as("label"))
    val roots = canon.select(col("b").as("node")).distinct()
      .join(canon.select(col("a").as("node")), Seq("node"), "left_anti")
      .withColumn("label", col("node"))
    memberLabels.unionAll(roots)
  }
}
