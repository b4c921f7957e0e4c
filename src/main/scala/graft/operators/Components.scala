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
  * Algorithm: iterated min-label propagation. Every node starts labeled with
  * its own id; each round a node's label becomes the min of its own and all
  * neighbors' labels; fixpoint = every node carries the smallest id in its
  * component. Deterministic (min is order- and partitioning-free), so the
  * result is oracle-checkable (DuckDB recursive CTE computes the same
  * min-reachable-id).
  *
  * Scale shape: one equi-join + one hash-agg per round, both shuffled on
  * node id; the symmetrized edge list (2|E| rows) is the only state beyond
  * the label table (|V| rows). Rounds = component DIAMETER, which for dedup
  * candidate graphs (near-cliques around a shared duplicate) is small by
  * construction. For adversarial high-diameter graphs the large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") converges in O(log² n) rounds — not needed for
  * the dedup shapes this serves, and the propagation loop below is where
  * that contraction would slot in.
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
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIters: Int = 64): DataFrame = {
    // hash-partitioned on the per-round join key BEFORE caching: the
    // cached relation advertises that partitioning, so every propagation
    // round joins against it without re-shuffling the edge list (labels
    // arrive already hash-partitioned on the same key from the groupBy)
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct()
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
    while (!converged && iter < maxIters) {
      val prop = sym.join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(false)
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
