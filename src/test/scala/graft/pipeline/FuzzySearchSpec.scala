package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** TextAnalysis.deletionKeys — the edit-distance-1 blocking contract:
  * COMPLETE for every d≤1 pair (substitution / insertion / deletion /
  * equality all share a key), and only a candidate generator (d=2 pairs
  * CAN collide — the exact-levenshtein verify is load-bearing). */
class FuzzySearchSpec extends SparkSuite {
  import spark.implicits._

  private def keysOf(term: String): Set[String] =
    Seq(term).toDF("t")
      .select(TextAnalysis.deletionKeys(col("t")).as("ks"))
      .as[Seq[String]].head().toSet

  test("neighborhood = the term plus every single-char deletion") {
    assert(keysOf("abc") === Set("abc", "bc", "ac", "ab"))
    assert(keysOf("a") === Set("a", ""))
  }

  test("every edit-distance-1 pair shares a key (fuzzed)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    (1 to 300).foreach { _ =>
      val t = (1 to (3 + rnd.nextInt(6)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val mutated = rnd.nextInt(3) match {
        case 0 => // substitution
          val i = rnd.nextInt(t.length)
          t.updated(i, (if (t(i) == 'z') 'y' else 'z'))
        case 1 => // insertion
          val i = rnd.nextInt(t.length + 1)
          t.substring(0, i) + "z" + t.substring(i)
        case _ => // deletion
          val i = rnd.nextInt(t.length)
          t.substring(0, i) + t.substring(i + 1)
      }
      assert(keysOf(t).intersect(keysOf(mutated)).nonEmpty,
        s"d<=1 pair ($t, $mutated) shares no deletion key")
    }
  }

  test("distance-2 collisions exist and the levenshtein verify kills them") {
    // "xa" and "ay" share deletion key "a" but are distance 2 apart
    assert(keysOf("xa").intersect(keysOf("ay")).nonEmpty)
    val d = Seq(("xa", "ay")).toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("d")).as[Int].head()
    assert(d === 2)
  }
}
