package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${seed}_$i").mkString(" ")

  // corpus: doc 1 copies benchmark doc 100's opening 10 words (contaminated),
  // doc 2 shares nothing, doc 3 is too short to produce an 8-gram, doc 4
  // embeds a benchmark 8-gram mid-document.
  private def corpus = Seq(
    (1L, words(100, 10) + " " + words(1, 20)),
    (2L, words(2, 30)),
    (3L, "a b c"),
    (4L, words(4, 12) + " " + words(100, 8) + " " + words(4, 12))
  ).toDF("doc_id", "text")

  private def bench = Seq((100L, words(100, 40))).toDF("doc_id", "text")

  test("flag marks docs sharing >= 1 benchmark 8-gram and counts distinct overlap") {
    val out = Decontaminate.flag(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "overlap_grams", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: 10 shared words -> 3 shared 8-grams (positions 0,1,2)
    assert(out(0) == ((1L, 23L, 3L, true)))
    assert(out(1) == ((2L, 23L, 0L, false)))
    assert(out(2) == ((3L, 0L, 0L, false)))
    // doc 4: exactly one complete benchmark 8-gram; its two identical
    // words(4, 12) runs repeat 5 grams, so 25 raw grams dedup to 20
    assert(out(3) == ((4L, 20L, 1L, true)))
  }

  test("minOverlap raises the bar") {
    val out = Decontaminate.flag(corpus, bench, "doc_id", "text", n = 8, minOverlap = 2)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("clean removes exactly the contaminated rows") {
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("benchmark side is broadcast (no shuffle on the corpus gram join)") {
    val plan = Decontaminate.flag(corpus, bench, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join, got:\n$plan")
  }
}
