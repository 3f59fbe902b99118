package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Unigram
import graft.sources.Tables

/** Eighty-third coverage wave: the unigram-LM tokenizer lifecycle
  * closes — from single steps (q239 E/M, q241 prune) to the iterated
  * in-engine TRAINER, the parity BPE reached in q187.
  *
  *  - q258: `Unigram.train` runs TWO full hard-EM rounds in-engine:
  *    round 1 segments under the char+top-bigram inventory weights,
  *    then the q241 gain criterion prunes to the top-8 bigrams (chars
  *    kept unconditionally — SentencePiece's coverage rule), counts are
  *    add-one smoothed (a char Viterbi never chose must keep a finite
  *    log-weight) and reweighted, and round 2 re-segments the corpus
  *    under the TRAINED weights. The oracle re-derives BOTH rounds from
  *    scratch — the round-2 Viterbi DP + recursive backward walk are
  *    the same machinery text as round 1, parameterized over the
  *    trained weight map (Extras75.emRoundCtes) — so one diverging
  *    gain, smoothing term or weight anywhere in round 1 reshapes the
  *    round-2 segmentation corpus-wide and hash-fails (q187's proof
  *    shape). Scale shape: each round is ONE vocabulary-collapsed job
  *    over the staged word table; prune/reweight are
  *    |alphabet|+16-bounded; weights ride as one broadcast map row;
  *    per-round staging releases the previous round's blocks
  *    (Bpe.trainMerges' discipline), so driver state is zero and
  *    executor state is one piece table per live round.
  */
object Extras83 {

  private val Rounds = 2
  private val Keep = 8

  val all: Seq[Qry] = Seq(

    Qry(
      "q258_unigram_train",
      s"""${Extras75.EmOraclePrefix},
         |bgp2 AS (SELECT p, cnt FROM mstep WHERE length(p) = 2),
         |gains2 AS (SELECT b.p, b.cnt,
         |    CAST(b.cnt * (wp.wt - w1.wt - w2.wt) AS BIGINT) AS gain
         |  FROM bgp2 b
         |  JOIN wts wp ON wp.p = b.p
         |  JOIN wts w1 ON w1.p = substring(b.p, 1, 1)
         |  JOIN wts w2 ON w2.p = substring(b.p, 2, 1)),
         |keepbg AS (SELECT p, cnt FROM (SELECT p, cnt,
         |    row_number() OVER (ORDER BY gain DESC, p) AS rn
         |  FROM gains2) WHERE rn <= $Keep),
         |cnt1 AS (SELECT c.p, COALESCE(m.cnt, 0) + 1 AS n
         |    FROM chars c LEFT JOIN mstep m ON m.p = c.p
         |  UNION ALL SELECT p, cnt + 1 AS n FROM keepbg),
         |tot1 AS (SELECT SUM(n) AS t FROM cnt1),
         |wts1 AS (SELECT p,
         |    CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE) / t)) AS BIGINT)
         |      AS wt
         |  FROM cnt1, tot1),
         |wm1 AS (SELECT map(list(p ORDER BY p), list(wt ORDER BY p)) AS m
         |  FROM wts1),
         |${Extras75.emRoundCtes("2", "wm1")}
         |SELECT p AS piece, CAST(length(p) AS INT) AS piece_len, cnt,
         |  CAST(1000000 * cnt // SUM(cnt) OVER () AS BIGINT) AS ppm
         |FROM mstep2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val trained = Unigram.train(Tables(spark, dir).documents, "text",
        rounds = Rounds, keep = Keep)
      trained
        .withColumn("tot2", sum($"cnt").over(Window.partitionBy()))
        .select($"p".as("piece"), length($"p").as("piece_len"),
          $"cnt".cast(LongType).as("cnt"),
          expr("1000000 * cnt DIV tot2").as("ppm"))
    }
  )
}
