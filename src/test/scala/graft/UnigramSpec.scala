package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** The iterated unigram-LM trainer beyond the oracle-gated 2-round
  * shape: the 3+-round path exercises the loop's staging/release dance
  * (a round's weights read the PREVIOUS round's released mstep blocks
  * if the release discipline is wrong — this suite would die with a
  * missing-block error, not just mis-count).
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is the cat hat",
    "rats chat in the attic")
    .toDF("text")

  test("segmentation conservation: pieces exactly tile every word") {
    // Viterbi segmentation of each word covers its characters exactly
    // once, so sum(cnt * len(piece)) == total frequency-weighted chars
    // — for ANY round count. Checked at 1 and 3 rounds.
    val totalChars = docs
      .select(explode(graft.operators.TextOps.tokens($"text")).as("w"))
      .agg(sum(length($"w"))).head().getLong(0)
    for (r <- Seq(1, 3)) {
      val m = Unigram.train(docs, "text", rounds = r, keep = 2)
      val covered = m.agg(sum($"cnt" * length($"p"))).head().getLong(0)
      assert(covered == totalChars,
        s"rounds=$r: pieces cover $covered of $totalChars chars")
      graft.operators.Staging.release(m)
    }
  }

  test("prune bound holds: at most `keep` multi-char pieces survive") {
    val m = Unigram.train(docs, "text", rounds = 3, keep = 2)
    val multi = m.filter(length($"p") >= 2).count()
    assert(multi <= 2, s"prune leaked $multi multi-char pieces (keep=2)")
    // chars are never pruned: every corpus character that round 3's
    // Viterbi used is present with a positive count
    assert(m.filter(length($"p") === 1 && $"cnt" <= 0).count() == 0)
    graft.operators.Staging.release(m)
  }

  test("training moves mass into the kept bigrams") {
    // after a round of reweighting, the kept bigrams (cheaper than
    // their two chars by construction of the gain criterion on this
    // corpus) should win segmentations: at least one bigram piece has
    // a positive round-2 count
    val m = Unigram.train(docs, "text", rounds = 2, keep = 4)
    assert(m.filter(length($"p") === 2 && $"cnt" > 0).count() >= 1)
    graft.operators.Staging.release(m)
  }
}
