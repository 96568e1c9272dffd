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

  test("trainSampled with a full-vocab sample learns the IDENTICAL merge table") {
    val vocab = Seq(("banana", 3L), ("bandana", 2L), ("aaa", 5L), ("abab", 4L))
      .toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    def tab(df: org.apache.spark.sql.DataFrame) = df
      .select("merge_rank", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val full = tab(BpeTrainer.train(vocab, 6))
    val sampled = tab(BpeTrainer.trainSampled(vocab, 6, sampleSize = 100))
    assert(sampled === full,
      "sample ⊇ vocab must reproduce the distributed decisions exactly")
  }

  test("trainSampled stops cleanly when the vocab is fully merged") {
    val vocab = Seq(("ab", 1L)).toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    // only one merge is possible; asking for 10 rounds returns 1 row
    val m = BpeTrainer.trainSampled(vocab, 10, sampleSize = 10)
      .as[(Int, String, String, Long)].collect()
    assert(m.toSeq === Seq((1, "a", "b", 1L)))
    // the distributed trainer stops identically (advice-pinned)
    val d = BpeTrainer.train(vocab, 10)
      .as[(Int, String, String, Long)].collect()
    assert(d.toSeq === m.toSeq)
  }

  test("trainSampled truncated to the weighted head still learns head merges") {
    // head by freq: "aa"×9 dominates; the tail word is outside the sample
    val vocab = Seq(("aa", 9L), ("zz", 1L)).toDF("term", "freq")
      .select(BpeTrainer.encode(col("term")).as("enc"), col("freq"))
    val m = BpeTrainer.trainSampled(vocab, 2, sampleSize = 1)
      .as[(Int, String, String, Long)].collect()
    assert(m.toSeq === Seq((1, "a", "a", 9L)),
      "only the sampled head's pairs are visible to the fit")
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
