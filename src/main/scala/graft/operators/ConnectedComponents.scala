package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns a
  * near-duplicate PAIR list (q36/q37 output) into duplicate CLUSTERS,
  * the form a dedup pipeline actually materializes (keep one
  * representative per component).
  *
  * Each iteration: every node adopts the minimum label among itself and
  * its neighbors; converged when no label changes. Iterations are plain
  * shuffled joins + aggregations — O(component diameter) rounds, each one
  * shuffle on the node id. Near-dup graphs are overwhelmingly tiny stars
  * (diameter ≤ 2-3), so the loop converges in a handful of rounds; the
  * cap guards pathological chains. For truly adversarial graphs at 100 TB
  * scale, swap the propagation step for the alternating small-star/
  * large-star rewrite (same join shape, fewer rounds) — the driver-side
  * loop itself holds only a changed-row COUNT, never data.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges
    * @return (id, component) — component = min node id reachable
    */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20): DataFrame = {
    // materialize the edge list ONCE: `edges` may be an arbitrarily
    // expensive upstream pipeline (e.g. the full near-dup Jaccard join),
    // and the loop references it in every iteration's join AND its
    // convergence count — without the checkpoint it re-executes each time
    // (measured 200s+ vs ~4s on the 10x dedup graph)
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val neighborMin = sym
        .join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("component")).as("nmin"))
      // checkpoint BEFORE the convergence count: counting first would
      // evaluate the join once for the count and once again for the
      // checkpoint (also cuts lineage so iteration i+1 doesn't re-plan i)
      val next = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    // silent truncation would return WRONG labels with no signal —
    // diameter-heavy graphs must fail loudly, not corrupt downstream dedup
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIterations " +
          "iterations; raise maxIterations (graph diameter exceeds it)")
    labels
  }
}
