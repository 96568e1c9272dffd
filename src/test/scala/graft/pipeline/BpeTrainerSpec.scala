package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BpeTrainer against the classic hand-worked BPE example and the
  * encoding's boundary-sharing trap. */
class BpeTrainerSpec extends SparkSuite {
  import spark.implicits._

  test("encode wraps each character") {
    val e = Seq("abc").toDF("t")
      .select(BpeTrainer.encode(col("t"))).as[String].head()
    assert(e === "(a)(b)(c)")
  }

  test("merges follow pair frequency with deterministic tie-break") {
    // freq-weighted vocab: "aa"×5, "ab"×3 → round 1 merges (a,a) (count 5),
    // round 2 merges (a,b) (count 3)
    val vocab = Seq(("aa", 5L), ("ab", 3L)).toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    val m = BpeTrainer.train(vocab, 2)
      .select("merge_rank", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) === ((1, "a", "a", 5L)))
    assert(m(1) === ((2, "a", "b", 3L)))
  }

  test("greedy left-to-right merge never shares boundary characters") {
    // "aaa": pair (a,a) occurs twice overlapping; greedy BPE fuses the
    // LEFT pair only → (aa)(a), and the round counts it at freq 2
    val vocab = Seq(("aaa", 1L)).toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    val m = BpeTrainer.train(vocab, 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) === ((1, "a", "a", 2L)))
    // after (a)(a)→(aa) greedy-left: enc = (aa)(a) → round 2 fuses (aa, a)
    assert(m(1) === ((2, "aa", "a", 1L)))
  }

  test("merged symbols survive as atomic units in later rounds") {
    // "abab"×4: round1 (a,b)=8 → (ab)(ab); round2 (ab,ab)=4
    val vocab = Seq(("abab", 4L)).toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    val m = BpeTrainer.train(vocab, 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) === ((1, "a", "b", 8L)))
    assert(m(1) === ((2, "ab", "ab", 4L)))
  }
}
