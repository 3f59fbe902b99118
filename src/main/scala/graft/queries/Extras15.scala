package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.TextOps
import graft.sources.Tables

/** Fifteenth coverage wave — training-data-pipeline operators over the
  * documents corpus plus robust time-series analytics:
  * sequence packing, test-set decontamination, per-source quality
  * quotas, character-entropy quality scoring, daily-count
  * autocorrelation, and max drawdown.
  */
object Extras15 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- sequence packing (context-window bin assignment) --------------
    // The pre-training batching step: concatenate documents in a stable
    // order (doc_id) and cut the token stream into 2048-token context
    // windows; a document belongs to the window its FIRST token lands in.
    // Continuous-fill packing (documents may straddle a boundary), so the
    // whole assignment is one running sum + an integer division — one
    // shuffle on the partition key, no iteration. Partitioned per lang:
    // packing parallelizes across corpus shards exactly like this at
    // 100 TB (global packing order is a per-shard contract, not a global
    // sort).
    Qry(
      "q106_pack_bins",
      s"""WITH ${TextOps.oracleToksCte},
         |d AS (SELECT lang, doc_id, len(tk) AS ntok FROM toks),
         |c AS (SELECT lang, doc_id, ntok,
         |    CAST(SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM d)
         |SELECT lang, CAST((cum - ntok) // 2048 AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS tok_sum,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir).documents
        .select($"lang", $"doc_id",
          size(TextOps.tokens($"text")).as("ntok"))
        .withColumn("cum", sum($"ntok").over(w))
        .withColumn("bin", expr("(cum - ntok) div 2048"))
        .groupBy($"lang", $"bin")
        .agg(count(one).as("n_docs"), sum($"ntok").as("tok_sum"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
    },

    // ---- test-set decontamination (held-out n-gram overlap) ------------
    // The eval-leakage sweep: any training document sharing an 8-token
    // chunk with the held-out set (here: doc_id % 97 == 0) is flagged.
    // Chunks are hashed (shuffle carries a long, not a string) and the
    // overlap test is a semi-join on the hash — the same bounded
    // equi-join shape as the dedup family, never an all-pairs scan.
    // Chunk-grain (not shingle-grain) keeps the per-doc key count at
    // L/8, so the candidate index stays ~8x smaller than the corpus.
    Qry(
      "q107_decontam",
      s"""WITH ${TextOps.oracleToksCte},
         |ch AS (SELECT DISTINCT doc_id, lang,
         |    ${TextOps.oracleHashSql("chunk")} AS h
         |  FROM (SELECT doc_id, lang,
         |      unnest(list_transform(range(0, len(tk) - 7, 8),
         |        i -> array_to_string(tk[i+1:i+8], ' '))) AS chunk
         |    FROM toks WHERE len(tk) >= 8)),
         |test AS (SELECT DISTINCT h FROM ch WHERE doc_id % 97 = 0),
         |contam AS (SELECT DISTINCT c.doc_id, c.lang
         |  FROM ch c JOIN test ON c.h = test.h
         |  WHERE c.doc_id % 97 <> 0),
         |cc AS (SELECT lang, COUNT(*) AS n_contam FROM contam GROUP BY 1),
         |tr AS (SELECT lang, COUNT(*) AS n_train FROM documents
         |  WHERE doc_id % 97 <> 0 GROUP BY 1)
         |SELECT tr.lang, tr.n_train,
         |  CAST(COALESCE(cc.n_contam, 0) AS BIGINT) AS n_contam
         |FROM tr LEFT JOIN cc ON tr.lang = cc.lang""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val docs = t(spark, dir).documents
        val ch = docs
          .select($"doc_id", $"lang",
            explode(TextOps.strideChunks(TextOps.tokens($"text"), 8))
              .as("chunk"))
          .select($"doc_id", $"lang", TextOps.hashMod($"chunk").as("h"))
          .distinct()
        val test = ch.filter($"doc_id" % 97 === 0).select($"h").distinct()
        val contam = ch.filter($"doc_id" % 97 =!= 0)
          .join(test, Seq("h"), "left_semi")
          .select($"doc_id", $"lang").distinct()
          .groupBy($"lang").agg(count(one).as("n_contam"))
        docs.filter($"doc_id" % 97 =!= 0)
          .groupBy($"lang").agg(count(one).as("n_train"))
          .join(contam, Seq("lang"), "left")
          .select($"lang", $"n_train",
            coalesce($"n_contam", lit(0L)).as("n_contam"))
    },

    // ---- per-source quality quota --------------------------------------
    // Domain balancing: keep the top half (by length, doc_id tiebreak) of
    // every source's documents — the quota is DYNAMIC (ceil(n/2) per
    // source), so the rank comparison rides on a window count instead of
    // a constant k. Integer comparison (rn*2 <= n+1 ⇔ rn <= ceil(n/2)):
    // no boundary row can flip on FP representation.
    Qry(
      "q108_source_quota",
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n_total
        |  FROM documents)
        |SELECT source, CAST(MAX(n_total) AS BIGINT) AS n_total,
        |  COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM r WHERE rn * 2 <= n_total + 1
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wOrd = Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id")
      val wAll = Window.partitionBy($"source")
      t(spark, dir).documents
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n_total", count(one).over(wAll))
        .filter($"rn" * 2 <= $"n_total" + 1)
        .groupBy($"source")
        .agg(max($"n_total").as("n_total"), count(one).as("n_kept"),
          sum($"n_chars").as("kept_chars"))
    },

    // ---- character-entropy quality score -------------------------------
    // Shannon entropy of the per-document character distribution — the
    // cheap gibberish/boilerplate detector (near-zero entropy = repeated
    // filler; near-log2(alphabet) = noise). H = log2(L) − (Σ c·ln c)/L/ln 2
    // so the only aggregate is Σ c·ln(c), routed through the decimal
    // accumulator (a raw double sum is partial-order-dependent). The char
    // explode is linear in corpus size and pre-aggregates map-side.
    Qry(
      "q109_char_entropy",
      s"""WITH ch AS (SELECT doc_id, lang, len(text) AS l,
         |    unnest(list_transform(range(1, len(text) + 1),
         |      i -> text[i:i])) AS c
         |  FROM documents WHERE len(text) > 0),
         |cnt AS (SELECT doc_id, lang, l, c, COUNT(*) AS n
         |  FROM ch GROUP BY 1, 2, 3, 4),
         |e AS (SELECT doc_id, lang, l,
         |    ${dsumSql("CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))")} AS s
         |  FROM cnt GROUP BY 1, 2, 3)
         |SELECT doc_id, lang, CAST(l AS BIGINT) AS n_chars_text,
         |  round((ln(CAST(l AS DOUBLE)) - s / l) / ln(2.0e0), 6) AS entropy
         |FROM e""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .filter(length($"text") > 0)
        .select($"doc_id", $"lang", length($"text").cast("long").as("l"),
          explode(expr(
            "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
            .as("c"))
        .groupBy($"doc_id", $"lang", $"l", $"c").agg(count(one).as("n"))
        .groupBy($"doc_id", $"lang", $"l")
        .agg(dsum($"n".cast("double") * log($"n".cast("double"))).as("s"))
        .select($"doc_id", $"lang", $"l".as("n_chars_text"),
          round((log($"l".cast("double")) - $"s" / $"l") / log(lit(2.0e0)), 6)
            .as("entropy"))
    },

    // ---- lag-1 autocorrelation of daily event counts -------------------
    // Day-over-day persistence per event type. Counts are integers, so
    // ALL five regression moments stay exact BIGINT sums — the Pearson
    // closed form is then row-local double math on identical inputs in
    // both engines (the same trick as q81; built-in corr would accumulate
    // doubles in engine-specific partial order).
    Qry(
      "q110_daily_autocorr",
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM daily),
        |m AS (SELECT event_type, COUNT(*) AS np,
        |    CAST(SUM(prev) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sy,
        |    CAST(SUM(prev * prev) AS BIGINT) AS sxx,
        |    CAST(SUM(n * n) AS BIGINT) AS syy,
        |    CAST(SUM(prev * n) AS BIGINT) AS sxy
        |  FROM p WHERE prev IS NOT NULL GROUP BY 1)
        |SELECT event_type, np AS n_pairs,
        |  round(CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
        |    THEN CAST(np * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(np * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(np * syy - sy * sy AS DOUBLE)))
        |    END, 6) AS autocorr
        |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val daily = t(spark, dir).events
        .groupBy($"event_type",
          to_date(date_trunc("day", $"ts")).as("day"))
        .agg(count(one).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val m = daily
        .withColumn("prev", lag($"n", 1).over(w))
        .filter($"prev".isNotNull)
        .groupBy($"event_type")
        .agg(count(one).as("np"), sum($"prev").as("sx"),
          sum($"n").as("sy"), sum($"prev" * $"prev").as("sxx"),
          sum($"n" * $"n").as("syy"), sum($"prev" * $"n").as("sxy"))
      val denx = $"np" * $"sxx" - $"sx" * $"sx"
      val deny = $"np" * $"syy" - $"sy" * $"sy"
      m.select($"event_type", $"np".as("n_pairs"),
        round(when(denx > 0 && deny > 0,
          ($"np" * $"sxy" - $"sx" * $"sy").cast("double") /
            (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))), 6)
          .as("autocorr"))
    },

    // ---- max drawdown per supplier price series ------------------------
    // The classic risk metric on the reference's price-stream shape:
    // running max minus current value, maximized per series. Pure window
    // arithmetic on unsummed doubles (max/subtract only — both engines
    // see bit-identical values), one shuffle on the series key. The
    // trailing price tiebreak makes the order TOTAL (the fixtures carry
    // one (suppkey, shipdate, orderkey, linenumber) collision).
    Qry(
      "q111_drawdown",
      """WITH r AS (SELECT l_suppkey, l_extendedprice,
        |    MAX(l_extendedprice) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM lineitem)
        |SELECT l_suppkey, MAX(runmax - l_extendedprice) AS max_drawdown,
        |  COUNT(*) AS n_trades
        |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir).lineitem
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey",
          $"l_linenumber", $"l_extendedprice")
        .withColumn("runmax", max($"l_extendedprice").over(w))
        .groupBy($"l_suppkey")
        .agg(max($"runmax" - $"l_extendedprice").as("max_drawdown"),
          count(one).as("n_trades"))
    }
  )
}
