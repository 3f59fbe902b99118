package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{TextOps, Vectors}
import graft.sources.Tables
import graft.streaming.Streams

/** Ninetieth coverage wave: the CMS sketch as STREAMING state, and
  * Johnson-Lindenstrauss projection with a distortion audit.
  *
  *  - q272: q268's join-size estimator fed by a stream — and this twin
  *    is the one that shows WHY sketches are the streaming answer: the
  *    streaming aggregation's state is the SKETCH ITSELF (depth x
  *    width x 2 counters = 2048 cells, constant regardless of user
  *    cardinality), because each event increments its (row, bucket)
  *    cell directly — no per-user table anywhere in the stream (the
  *    q220/q221 "registers are the mergeable state" discipline, now
  *    for CMS). The inner-product tail and the exact-size audit run
  *    post-sink (exact from the batch table — it is the AUDIT, not
  *    the estimator). Shares q268's oracle text VERBATIM.
  *  - q273: Johnson-Lindenstrauss random projection — every vector
  *    maps 64 -> 16 dims through the deterministic integer-Weyl
  *    hyperplane matrix (q43's planes, kept real-valued instead of
  *    sign-bucketed), then the audit measures pairwise distance
  *    distortion over the first 20 vectors: ratio_ppm =
  *    floor(1e6 · (proj_d2 · Dim) / (orig_d2 · ProjDim)), the
  *    JL-normalized squared-distance ratio (1e6 = perfect isometry).
  *    The projection is ONE map-side pass (ProjDim sequential dots),
  *    the audit's pair table is 190 rows; at 100 TB the projected
  *    corpus is 4x smaller and every downstream ANN distance costs
  *    ProjDim/Dim of the original — measured, not assumed.
  */
object Extras90 {

  private val one = lit(1)
  private val Depth = 4
  private val Width = 256

  private val Dim = 64
  private val ProjDim = 16
  /** Audit scope: pairwise over vec_id < AuditN. */
  private val AuditN = 20

  val all: Seq[Qry] = Seq(

    // ---- CMS join-size estimate under Structured Streaming ----------------
    Qry("q272_stream_cms", Extras88.JoinSizeOracle) { (spark, dir) =>
      import spark.implicits._
      def bucket(i: Int, uid: org.apache.spark.sql.Column) =
        TextOps.hashMod(concat(lit(s"cms$i:"), uid.cast("string"))) % Width
      // the stream updates the SKETCH directly: explode each event into
      // its Depth (row, bucket) cells, count clicks/errors per cell —
      // streaming state = 4 x 256 x 2 counters, user cardinality never
      // enters the state (the q220/q221 register discipline); explode,
      // not self-union, so the stream source scans once per batch
      val ev = Streams.fileStream(spark, dir, "events")
        .filter($"event_type".isin("click", "error"))
      val cells = ev.select(explode(array((0 until Depth).map(i =>
          struct(lit(i).as("r"), bucket(i, $"user_id").as("bkt"))): _*))
          .as("c"), $"event_type")
        .select($"c.r".as("r"), $"c.bkt".as("bkt"), $"event_type")
      val cms = cells.groupBy($"r", $"bkt")
        .agg(count(when($"event_type" === "click", 1)).as("ta"),
          count(when($"event_type" === "error", 1)).as("tb"))
      val sketch = Streams.runToMemory(cms, "complete")
      // post-sink: inner-product estimate per row + the exact audit
      // from the batch table (the audit is allowed to see the corpus;
      // the ESTIMATOR never did)
      val ex = Tables(spark, dir).events
        .filter($"event_type".isin("click", "error"))
        .groupBy($"user_id")
        .agg(count(when($"event_type" === "click", 1)).as("a"),
          count(when($"event_type" === "error", 1)).as("b"))
        .agg(sum($"a" * $"b").as("exact_size"))
      sketch.groupBy($"r").agg(sum($"ta" * $"tb").as("est"))
        .crossJoin(broadcast(ex))
        .select($"r", $"est", $"exact_size",
          ($"est" >= $"exact_size").as("never_undercounts"),
          when($"exact_size" === 0, 0L)
            .otherwise(expr(
              "1000000 * (est - exact_size) DIV exact_size"))
            .as("over_ppm"))
    },

    // ---- JL projection + distortion audit ----------------------------------
    Qry(
      "q273_jl_projection", {
        // the hyperplane matrix, spelled once for both engines:
        // component i of plane j = ((j*64 + i)*2654435761 % 1000003)
        //   / 1000003 - 0.5  (Vectors.hyperplaneComponent)
        val projCols = (0 until ProjDim).map(j =>
          s"""list_reduce(list_prepend(0.0e0,
             |      list_transform(range($Dim), i -> v[i + 1] *
             |        ((($j * 64 + i) * 2654435761 % 1000003)
             |          / 1000003.0 - 0.5))),
             |      (acc, x) -> acc + x)""".stripMargin).mkString(",\n    ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |           FROM embeddings WHERE vec_id < $AuditN),
           |p AS (SELECT vec_id, [$projCols] AS pv, v FROM e)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  CAST(floor(1000000.0 *
           |    (list_reduce(list_prepend(0.0e0,
           |       list_transform(range($ProjDim), i ->
           |         (a.pv[i+1] - b.pv[i+1]) * (a.pv[i+1] - b.pv[i+1]))),
           |       (acc, x) -> acc + x) * $Dim)
           |    / (list_reduce(list_prepend(0.0e0,
           |       list_transform(range($Dim), i ->
           |         (a.v[i+1] - b.v[i+1]) * (a.v[i+1] - b.v[i+1]))),
           |       (acc, x) -> acc + x) * $ProjDim)) AS BIGINT)
           |    AS ratio_ppm
           |FROM p a JOIN p b ON a.vec_id < b.vec_id""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // the projection pass: ProjDim sequential dots against the
      // deterministic plane matrix — map-side only, corpus never
      // shuffles; the audit below reads just the first AuditN rows
      val p = Tables(spark, dir).embeddings
        .filter($"vec_id" < AuditN)
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
        .withColumn("pv", array((0 until ProjDim).map(j =>
          Vectors.dot($"v", Vectors.hyperplane(j, Dim))): _*))
      val a = p.select($"vec_id".as("id_a"), $"pv".as("pa"), $"v".as("va"))
      val b = p.select($"vec_id".as("id_b"), $"pv".as("pb"), $"v".as("vb"))
      a.join(b, $"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          floor(lit(1000000.0) *
            (Vectors.distSq($"pa", $"pb") * Dim) /
            (Vectors.distSq($"va", $"vb") * ProjDim))
            .cast(LongType).as("ratio_ppm"))
    }
  )
}
