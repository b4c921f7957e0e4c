package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlShim

/** Connected components over an undirected edge list — the grouping step of
  * a fuzzy-dedup pipeline: MinHash/LSH candidate generation emits PAIRS
  * (doc_a ~ doc_b), but "keep one per duplicate group" needs the transitive
  * closure of those pairs, so every group collapses to one exemplar even
  * when its members were never directly compared (a~b, b~c => {a,b,c}).
  *
  * Algorithm: min-label propagation with a STAR-SHORTCUT round (the
  * Shiloach-Vishkin hook-and-shortcut structure). Every node starts
  * labeled with its own id; each round:
  *   1. propagate:  h(v)  = min(comp(v), min over neighbors comp(u))
  *   2. star-push:  sm(m) = min over {v : comp(v) = m} of h(v)
  *   3. shortcut:   comp'(v) = min(h(v), sm(comp(v)))
  * Step 2/3 merge every node pointing at the same label in ONE round (the
  * best label discovered anywhere in a label-star reaches all its members
  * immediately), which contracts label trees geometrically instead of the
  * one-hop-per-round of plain propagation. Measured on the r6 bench graph
  * (1310 nodes, 1081 edges, diameter ~31): 31 rounds -> 8. Plain
  * single-min pointer jumping (comp(comp(v))) does NOT help here — labels
  * point at local minima whose own labels improve slowly, so there are no
  * pointer chains to halve (simulated: 31 -> 26).
  *
  * The fixpoint is unchanged: every term is a min over same-component node
  * ids, labels only ever decrease (comp' <= h <= comp), and a round that
  * changes nothing has h(v) = comp(v), i.e. plain propagation is also
  * stable — the same min-reachable-id fixpoint the oracle's recursive CTE
  * computes. Deterministic (min is order- and partitioning-free), so the
  * result stays hash-checkable.
  *
  * Scale shape: one edge equi-join + one node agg on id + one agg-plus-join
  * on the label key (sharing one exchange) per round, all shuffled on node
  * id or label; the symmetrized edge list
  * (2|E| rows) is the only state beyond the label table (|V| rows). For
  * adversarial graphs the large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond") is the documented
  * next step — not needed now that the star shortcut bounds rounds
  * logarithmically in practice.
  *
  * Iterative-loop discipline (CLAUDE.md): each round's label table is a
  * localCheckpoint — chaining plain plans would nest the optimizer tree
  * round-over-round — materialized by the convergence aggregate (ONE job
  * per round), and the previous round's checkpoint is released only after
  * the next one is materialized (a localCheckpoint's blocks are not
  * recomputable).
  *
  * Convergence test: min-propagation is MONOTONE — no label ever
  * increases, and a non-converged round strictly decreases at least one —
  * so the labeling changed iff the exact label SUM strictly decreased.
  * One scalar aggregate over the new checkpoint (partial aggs, no
  * shuffle-join) replaces a per-round labels⋈next comparison join; summed
  * as decimal(38,0) so arbitrary long ids cannot overflow (the ANSI
  * ARITHMETIC_OVERFLOW gotcha, CLAUDE.md).
  */
object Components {

  /** Components of the graph formed by `edges` (two long-castable node-id
    * columns; direction ignored, self-loops and duplicate edges harmless).
    * Returns (id, comp) for every node that appears in at least one edge —
    * isolated nodes never reach the candidate-pair stage upstream, so they
    * have no row here (each is trivially its own component).
    *
    * `maxIters` bounds the propagation; a graph whose diameter exceeds it
    * fails loudly rather than returning a half-converged labeling.
    *
    * `edgesDistinct = true` asserts the caller's edge list is already
    * duplicate-free, loop-free, and single-orientation (each undirected
    * pair appears exactly once, as (a,b) OR (b,a), never both, with
    * a != b) — then the symmetrized union cannot contain duplicates
    * either, and the setup `distinct()` (a full 2|E| shuffle + aggregate,
    * the only edge-list-wide shuffle besides the partitioning one) is
    * skipped outright (guide §2: remove shuffles the data's invariant
    * already guarantees). LSH candidate-pair outputs satisfy this by
    * construction (distinct pairs with id_a < id_b). Results are identical
    * either way (min-propagation is idempotent under duplicate edges); the
    * flag only removes wasted work. Leave it false when unsure — duplicate
    * edges then cost every ROUND their dup factor instead of one dedup.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIters: Int = 64,
                          edgesDistinct: Boolean = false): DataFrame = {
    // hash-partitioned on the per-round join key BEFORE caching: the
    // cached relation advertises that partitioning, so every propagation
    // round joins against it without re-shuffling the edge list (labels
    // arrive already hash-partitioned on the same key from the groupBy)
    val symRaw = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
    val sym = (if (edgesDistinct) symRaw else symRaw.distinct())
      .repartition(col("a"))
      .persist()
    // symmetrization puts every endpoint in column a, so nodes = distinct a
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // sum over an EMPTY label table is null (no edges at all) — map it
      // to zero so the empty graph converges on the first comparison
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(false)
    var prevSum = labelSum(labels) // materializes the checkpoint too
    var iter = 0
    var converged = false
    // One star round as a plan fragment:
    //  1. propagate: best label seen by each node (the node's OLD label
    //     rides the same aggregation as a tagged column — exactly one
    //     `own` row per id — so no join-back on id is needed);
    //  2./3. star-push + shortcut: everyone pointing at the same old label
    //     adopts the best h found anywhere in that star (half is one row
    //     per node, so no final re-agg is needed; the starMin agg and the
    //     join share one exchange on `comp`).
    def step(lbl: DataFrame): DataFrame = {
      val prop = sym.join(lbl.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      val half = lbl.select(col("id"), col("comp"), col("comp").as("own"))
        .unionByName(prop.withColumn("own", lit(null).cast("long")))
        .groupBy("id").agg(min("comp").as("h"), min("own").as("comp"))
      val starMin = half.groupBy("comp").agg(min("h").as("sm"))
      half.join(starMin, "comp")
        .select(col("id"), least(col("h"), col("sm")).as("comp"))
    }
    while (!converged && iter < maxIters) {
      // ONE round per materialization: chaining two rounds into one plan
      // was measured 3x SLOWER — the un-materialized inner round's subtree
      // feeds two consumers in the outer round and re-evaluates under AQE
      // (exchange reuse does not cover it), so keep exactly one round per
      // checkpoint + scalar-agg job.
      val next = step(labels).localCheckpoint(false)
      val nextSum = labelSum(next) // one job: materialize + converge test
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      SqlShim.unpersistLocalCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      SqlShim.unpersistLocalCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIters rounds — component " +
          "diameter exceeds the bound; raise maxIters or use a star-contraction variant")
    }
    labels
  }
}
