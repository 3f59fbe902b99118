package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact.davg

/** Iterated k-means (Lloyd's algorithm) over embedding vectors —
  * q246's single gated step operator-ized into the fixed-iteration
  * training loop the IVF family (q42/q63/q240) consumes centroids
  * from, and the clustering half of SemDeDup (q353).
  *
  * Determinism contract (what makes an unrolled SQL oracle replay the
  * loop bit-for-bit): initial centroids are the vectors with id < k
  * (deterministic, q246's convention); assignment argmin ties break by
  * centroid id; distances are sequential-fold doubles
  * ([[Vectors.distSq]], IEEE-identical to DuckDB's list_reduce); each
  * new centroid dimension is the DECIMAL(28,6)-exact member mean cast
  * once to double ([[graft.Exact.davg]]) — order-independent, so the
  * mean never depends on partitioning. Iteration count is FIXED
  * (training-pipeline convention: budget, not convergence detection),
  * and a converged round is a no-op, so oracle rounds past the fixed
  * point stay exact.
  *
  * Scale shape: the vector leaf is staged once; each round is one
  * broadcast of the k-row centroid table (centroids ride broadcasts —
  * the IVF convention), one corpus-sized assignment pass (k distances
  * per row, top-1 via a per-id window over k rows), and one
  * posexplode + partial-aggregated per-(cid, dim) mean; centroids are
  * re-staged per round so lineage never re-executes earlier rounds.
  * Empty clusters drop (no members → no rows), shrinking k — the
  * standard Lloyd degeneracy, documented rather than papered over.
  */
object KMeans {

  /** @param vecs (idCol, vCol: array<double>) — pre-widened
    * @return (cid, cv: array<double>) final centroids, staged (caller
    *         releases via Staging.sweep) */
  def run(vecs: DataFrame, idCol: String, vCol: String, k: Int,
      rounds: Int): DataFrame = {
    val v = Staging.stage(
      vecs.select(col(idCol).as("id"), col(vCol).as("v")), eager = true)
    var cents = Staging.stage(
      v.filter(col("id") < k)
        .select(col("id").as("cid"), col("v").as("cv")),
      eager = true)
    for (_ <- 1 to rounds) {
      val a = assign(v, cents, idCol = "id", vCol = "v")
      val m = v.join(a.withColumnRenamed("id", "__aid"),
          col("id") === col("__aid"))
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(davg(col("x")).as("c"))
      val next = Staging.stage(
        m.groupBy(col("cid"))
          .agg(transform(
            array_sort(collect_list(struct(col("i"), col("c")))),
            s => s.getField("c")).as("cv")),
        eager = true)
      Staging.release(cents)
      cents = next
    }
    Staging.release(v)
    cents
  }

  /** Nearest-centroid assignment: (idCol, cid). Ties break by cid. */
  def assign(vecs: DataFrame, cents: DataFrame, idCol: String,
      vCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("d2"), col("cid"))
    vecs.crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"),
        Vectors.distSq(col(vCol), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("cid"))
  }
}
