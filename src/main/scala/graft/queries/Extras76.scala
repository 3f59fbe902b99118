package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Seventy-sixth coverage wave: tokenizer lifecycle completion, lexical
  * retrieval, crawl URL hygiene, and the OHLC stream twin.
  *
  *  - q241: unigram-LM vocabulary PRUNE step — SentencePiece's shrink
  *    phase on q239's model: each multi-char piece's likelihood
  *    contribution if kept vs re-segmented to its characters
  *    (cnt x (wt(piece) - Σ wt(chars)), exact BIGINT), ranked; the
  *    lowest-gain pieces are marked 'prune'. Completes the unigram
  *    lifecycle (step → shrink) the way q162→q187 completed BPE.
  *  - q242: BM25 top-k lexical retrieval — the ranking function every
  *    RAG/curation pipeline runs against its corpus index. Exact
  *    integer tf/df/dl; the float factors (ln idf, length
  *    normalization) are written as the identical expression text on
  *    both engines and the per-document sum routes through the
  *    DECIMAL(28,6) accumulator so addition order cannot matter.
  *  - q243: URL normalization + registered-domain extraction — crawl
  *    curation's first join key. Spark PARSES synthesized raw URLs
  *    (parse_url + regex: case-folding, default-port stripping,
  *    fragment drop, trailing-slash collapse); the oracle predicts the
  *    normalized form from the synthesis PARAMETERS (the q192
  *    pattern), so the parser is checked against ground truth, never
  *    against itself.
  *  - q244: OHLC resampling under Structured Streaming — q29's bars as
  *    a streaming aggregation (min_by/max_by on the (event-time,
  *    event_id) key replaces the batch row_number, same deterministic
  *    tie-break), sharing q29's oracle semantics so stream/batch
  *    equivalence is inside the gate hash (the q44/q193 pattern).
  */
object Extras76 {

  private val one = lit(1)
  private val KeepPieces = 8
  private val Bm25Terms = Seq("stream", "window", "join")
  private val Bm25K = 10

  val all: Seq[Qry] = Seq(

    // ---- unigram vocabulary prune step ----------------------------------
    Qry(
      "q241_unigram_prune",
      s"""${Extras75.EmOraclePrefix},
         |bgp AS (SELECT p, cnt FROM mstep WHERE length(p) = 2),
         |gains AS (SELECT b.p, b.cnt,
         |    CAST(b.cnt * (wp.wt - w1.wt - w2.wt) AS BIGINT) AS gain
         |  FROM bgp b
         |  JOIN wts wp ON wp.p = b.p
         |  JOIN wts w1 ON w1.p = substring(b.p, 1, 1)
         |  JOIN wts w2 ON w2.p = substring(b.p, 2, 1))
         |SELECT p AS piece, cnt, gain, CAST(rn AS INT) AS rank,
         |  CASE WHEN rn <= $KeepPieces THEN 'keep' ELSE 'prune' END
         |    AS verdict
         |FROM (SELECT *, row_number() OVER (ORDER BY gain DESC, p) AS rn
         |      FROM gains)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (wts, mstep) = Extras75.emModel(spark, dir)
      // gain of KEEPING a piece = its Viterbi count x (its log-weight
      // minus the char fallback's) — exact BIGINT; the piece table is
      // vocabulary-bounded, so all three weight lookups broadcast
      mstep.filter(length($"p") === 2)
        .join(broadcast(wts.select($"p".as("__wp"), $"wt".as("__wtp"))),
          $"p" === $"__wp")
        .join(broadcast(wts.select($"p".as("__w1"), $"wt".as("__wt1"))),
          substring($"p", 1, 1) === $"__w1")
        .join(broadcast(wts.select($"p".as("__w2"), $"wt".as("__wt2"))),
          substring($"p", 2, 1) === $"__w2")
        .select($"p", $"cnt".cast(LongType).as("cnt"),
          ($"cnt" * ($"__wtp" - $"__wt1" - $"__wt2")).cast(LongType)
            .as("gain"))
        .withColumn("rank",
          row_number().over(Window.orderBy($"gain".desc, $"p")))
        .select($"p".as("piece"), $"cnt", $"gain", $"rank",
          when($"rank" <= KeepPieces, "keep").otherwise("prune")
            .as("verdict"))
    },

    // ---- BM25 top-k retrieval --------------------------------------------
    Qry(
      "q242_bm25_topk", {
        val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
        s"""WITH ${TextOps.oracleToksCte},
           |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
           |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
           |  WHERE tok IN ($inList) GROUP BY 1, 2),
           |dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           |  FROM tf GROUP BY 1),
           |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
           |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
           |ts AS (SELECT tf.doc_id,
           |    ln((nn - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)
           |      / (tf + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
           |        / avgdl)) AS s
           |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
           |  CROSS JOIN nd),
           |scored AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
           |    ${dsumSql("s")} AS score
           |  FROM ts GROUP BY 1)
           |SELECT CAST(rn AS INT) AS rank, doc_id, n_terms, score
           |FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)
           |        AS rn FROM scored)
           |WHERE rn <= $Bm25K""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // staged: the doc-length side AND the term-frequency side both
      // read the tokenized table — unstaged, the corpus tokenizes twice
      val toks = graft.operators.Staging.stage(
        Tables(spark, dir).documents
          .select($"doc_id", TextOps.tokens($"text").as("tk")),
        eager = false)
      val dl = toks.select($"doc_id", size($"tk").cast(LongType).as("dl"))
      val tf = toks.select($"doc_id", explode($"tk").as("tok"))
        .filter($"tok".isin(Bm25Terms: _*))
        .groupBy($"doc_id", $"tok").agg(count(one).as("tf"))
      val dft = tf.groupBy($"tok".as("__t"))
        .agg(countDistinct($"doc_id").as("df"))
      // corpus stats ride as a broadcast single-row aggregate
      val nd = dl.agg(count(one).cast("double").as("nn"),
        (sum($"dl").cast("double") / count(one)).as("avgdl"))
      // the float factors spell the oracle's expression VERBATIM; the
      // per-document sum is decimal so term order cannot matter
      val termScore = expr(
        "ln((nn - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)" +
          " / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))")
      tf.join(broadcast(dft), $"tok" === $"__t")
        .join(dl, "doc_id")
        .crossJoin(broadcast(nd))
        .select($"doc_id", termScore.as("s"))
        .groupBy($"doc_id")
        .agg(count(one).as("n_terms"), dsum($"s").as("score"))
        .withColumn("rank",
          row_number().over(Window.orderBy($"score".desc, $"doc_id")))
        .filter($"rank" <= Bm25K)
        .select($"rank", $"doc_id", $"n_terms", $"score")
    },

    // ---- URL normalization + registered domain ---------------------------
    Qry(
      "q243_url_normalize",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    h % 2 AS sch, (h // 4) % 3 AS pv, (h // 48) % 2 AS qs,
         |    (h // 96) % 20 AS hk, (h // 1920) % 5 AS hm,
         |    (h // 9600) % 1000 AS pn
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN sch = 1 THEN 'https' ELSE 'http' END || '://cdn'
         |    || hk || '.example' || hm || '.org'
         |    || CASE WHEN pv = 2 THEN ':8080' ELSE '' END
         |    || '/docs/item' || pn
         |    || CASE WHEN qs = 1 THEN '?q=' || pn ELSE '' END AS norm_url,
         |  'example' || hm || '.org' AS domain,
         |  CAST(sch AS INT) AS https
         |FROM p""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // ---- synthesis: a RAW url with hash-chosen denormalizations ----
      // (mixed-case host, default vs explicit port, trailing slash,
      // fragment, optional query) — the forms a crawl frontier actually
      // contains
      val raw = concat(
        when($"sch" === 1, "https").otherwise("http"), lit("://"),
        when($"hcase" === 1,
          upper(concat(lit("cdn"), $"hk", lit(".example"), $"hm",
            lit(".org"))))
          .otherwise(concat(lit("cdn"), $"hk", lit(".example"), $"hm",
            lit(".org"))),
        when($"pv" === 1,
          when($"sch" === 1, ":443").otherwise(":80"))
          .when($"pv" === 2, ":8080").otherwise(""),
        lit("/docs/item"), $"pn",
        when($"tsl" === 1, "/").otherwise(""),
        when($"qs" === 1, concat(lit("?q="), $"pn")).otherwise(""),
        when($"frag" === 1, "#top").otherwise(""))
      // ---- normalization: the REAL parse, verified against the
      // parameter-level oracle — lower-cased scheme+host, default port
      // stripped (non-default kept), one trailing slash collapsed,
      // fragment dropped, query preserved
      val proto = lower(parse_url($"raw", lit("PROTOCOL")))
      val host = lower(parse_url($"raw", lit("HOST")))
      val port = regexp_extract(parse_url($"raw", lit("AUTHORITY")),
        ":(\\d+)$", 1)
      val path = parse_url($"raw", lit("PATH"))
      val query = parse_url($"raw", lit("QUERY"))
      val keepPort = port =!= "" &&
        !(proto === "http" && port === "80") &&
        !(proto === "https" && port === "443")
      val normUrl = concat(proto, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(""),
        when(path === "/", "/").otherwise(regexp_replace(path, "/$", "")),
        when(query.isNotNull, concat(lit("?"), query)).otherwise(""))
      Tables(spark, dir).documents
        .select($"doc_id", TextOps.md5Long($"text").as("h"))
        // integer `div`, never `/`: Spark's `/` is double division and
        // silently rounds the parameter derivation (the q219 lesson)
        .withColumn("sch", expr("h % 2"))
        .withColumn("hcase", expr("(h div 2) % 2"))
        .withColumn("pv", expr("(h div 4) % 3"))
        .withColumn("tsl", expr("(h div 12) % 2"))
        .withColumn("frag", expr("(h div 24) % 2"))
        .withColumn("qs", expr("(h div 48) % 2"))
        .withColumn("hk", expr("(h div 96) % 20"))
        .withColumn("hm", expr("(h div 1920) % 5"))
        .withColumn("pn", expr("(h div 9600) % 1000"))
        .withColumn("raw", raw)
        .select($"doc_id", normUrl.as("norm_url"),
          regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1).as("domain"),
          $"sch".cast("int").as("https"))
    },

    // ---- OHLC bars under Structured Streaming -----------------------------
    // q29's oracle text (15-minute bars, (event-time, event_id)
    // tie-break); the streaming side replaces the batch row_number with
    // min_by/max_by on the same composite key — identical determinism,
    // and legal inside a streaming aggregation.
    Qry(
      "q244_stream_ohlc",
      s"""WITH b AS (
         |  SELECT event_type,
         |    time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      AS bucket,
         |    value,
         |    row_number() OVER (PARTITION BY event_type,
         |        time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rna,
         |    row_number() OVER (PARTITION BY event_type,
         |        time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rnd
         |  FROM events)
         |SELECT event_type, bucket,
         |  MAX(CASE WHEN rna = 1 THEN value END) AS open,
         |  MAX(CASE WHEN rnd = 1 THEN value END) AS close,
         |  MAX(value) AS high, MIN(value) AS low,
         |  COUNT(*) AS n, ${dsumSql("value")} AS val_sum
         |FROM b GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStream(spark, dir, "events")
        .withColumn("us", unix_micros($"ts"))
      val agg = src
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "15 minutes"), $"event_type")
        .agg(
          min_by($"value", struct($"us", $"event_id")).as("open"),
          max_by($"value", struct($"us", $"event_id")).as("close"),
          max($"value").as("high"), min($"value").as("low"),
          count(one).as("n"), dsum($"value").as("val_sum"))
      Streams.runToMemory(agg, "complete")
        .select($"window.start".as("bucket"), $"event_type",
          $"open", $"close", $"high", $"low", $"n", $"val_sum")
    }
  )
}
