package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{ArrowIpc, Tables}

/** Hundred-eleventh coverage wave: Arrow interchange for EMBEDDING
  * columns — the `graft-arrow` round-trip family extended to
  * `ARRAY<FLOAT>`, the one type ML dataloaders actually pull over
  * Arrow (a torch/Ray consumer reads `ListVector` of `Float4`
  * zero-copy; r11 verdict ask #3: the family stopped one type short
  * of the ML-native one).
  *
  *  - q306: the full `embeddings` fixture (vec_id BIGINT, embedding
  *    ARRAY&lt;FLOAT&gt;, label INT) writes as Arrow stream-format
  *    files task-side, reads back through the `graft-arrow` DSv2
  *    source, and a per-label aggregate over the ROUND-TRIPPED
  *    vectors — element count, exact integer micro-units
  *    (floor(1e6·x) per element: float→double widening is exact and
  *    IEEE multiply/floor are bit-identical cross-engine, the
  *    Vectors.dot contract), id sum — hash-matches an oracle computed
  *    from the ORIGINAL parquet. Any bit lost in either direction
  *    (write, list offsets, read) fails the gate; `ArrowIpcSpec` adds
  *    the null-row / empty-list / double-array properties no fixture
  *    row exercises.
  *
  *    Scale shape: q291's — write is one pass, task-side, bounded
  *    4096-row batches (list elements append to the shared child
  *    vector, so memory is one batch of vectors); read fans out one
  *    task per file; the aggregate is one explode collapsing
  *    map-side into the bounded per-label table.
  */
object Extras111 {

  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    Qry(
      "q306_arrow_embeddings",
      """WITH x AS (SELECT label, vec_id,
        |    unnest(embedding) AS e FROM embeddings)
        |SELECT label,
        |  CAST(COUNT(*) AS BIGINT) AS n_elems,
        |  CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
        |    AS BIGINT) AS sum_micro,
        |  CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
        |  CAST(SUM(CASE WHEN dup = 0 THEN vec_id ELSE 0 END) AS BIGINT)
        |    AS sum_id
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY e) - 1 AS dup FROM x) t
        |GROUP BY label""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = ArrowIpc.writeCached(s"$dir#q306",
        Tables(spark, dir).embeddings
          .select($"vec_id", $"embedding", $"label"))
      val back = spark.read.format("graft-arrow").load(out)
      // per-element micro-units ride one explode; vec_id sums once per
      // vector (the window-dedup in the oracle mirrors this exactly)
      back.select($"label", $"vec_id", posexplode($"embedding"))
        .groupBy($"label")
        .agg(count(one).as("n_elems"),
          sum(floor($"col".cast("double") * 1000000L).cast("long"))
            .as("sum_micro"),
          countDistinct($"vec_id").as("n_vecs"),
          sum(when($"pos" === 0, $"vec_id").otherwise(0L)).as("sum_id"))
    }
  )
}
