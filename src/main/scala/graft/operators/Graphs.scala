package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup clustering.
  *
  * Near-duplicate detection yields PAIRS; deduplication needs CLUSTERS
  * (keep one survivor per connected component — pair-wise greedy rules
  * are not transitive: A~B and B~C must group A,B,C even when A~C fails
  * the threshold). Connected components is the bridge.
  */
object Graphs {

  /** Connected components by iterative min-label propagation: every node
    * starts labeled with its own id; each round a node takes the minimum
    * label among itself and its neighbors; at fixpoint every component is
    * labeled with its minimum member id (deterministic — no tie to break).
    *
    * Scale shape: each round is one shuffle-join of the (undirected) edge
    * list against the label table, grouped on the node — O(E) per round,
    * rounds ≤ the graph diameter (near-dup graphs are unions of small
    * cliques, diameter 2-3; `maxIter` bounds adversarial chains, and hitting
    * it raises rather than returning silently-wrong labels). Each round
    * materializes via localCheckpoint so the loop's lineage (and Catalyst
    * re-analysis cost) stays flat instead of growing exponentially.
    *
    * Returns (id, component) for every node that appears in `edges`;
    * isolated nodes never enter the edge list, so the caller left-joins
    * and coalesces to the node's own id.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = graft.CacheScope.register(
      edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
        .unionByName(
          edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
        .distinct())
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("__nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nmin"), col("component")))
            .as("component"),
          (col("__nmin") < col("component")).as("__changed"))
        .localCheckpoint(true)
      converged = next.filter(col("__changed")).isEmpty
      labels = next.drop("__changed")
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
