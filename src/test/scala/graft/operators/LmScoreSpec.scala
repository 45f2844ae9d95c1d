package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // 8 docs of very common tokens, 1 of rare tokens, 1 mixed
  private val docs = (
    (1L to 8L).map(i => (i, "the cat sat on the mat and the dog sat too")) ++
    Seq((9L, "zyx wvu tsr qpo nml kji hgf edc ba9 876"),
        (10L, "the cat zyx wvu sat on nml kji the mat"))
  ).toDF("doc_id", "text")

  test("self-trained LM: common-token docs bucket head, rare-token doc tails") {
    val lm = LmScore.unigramLm(docs, "text")
    val out = LmScore.qualityBuckets(
        LmScore.surprise(docs, "doc_id", "text", lm))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out(1L) == "head" && out(8L) == "head")
    assert(out(9L) == "tail")
    // the mixed doc sits strictly between the two extremes
    val avg = LmScore.qualityBuckets(LmScore.surprise(docs, "doc_id", "text", lm))
      .select("doc_id", "avg_surprise").as[(Long, Double)].collect().toMap
    assert(avg(1L) < avg(10L) && avg(10L) < avg(9L))
  }

  test("surprise is an exact integer sum; n_tokens counts every token") {
    val lm = LmScore.unigramLm(docs, "text")
    val row = LmScore.surprise(docs, "doc_id", "text", lm)
      .filter($"doc_id" === 9L).collect().head
    assert(row.getAs[Long]("n_tokens") == 10L)
    // each of the 10 rare tokens appears exactly twice in the corpus
    // (docs 9 and 10 share none — doc 10 reuses 4 of them): recompute
    val counts = docs.select(explode(split($"text", "\\s+")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    val expected = "zyx wvu tsr qpo nml kji hgf edc ba9 876".split(" ")
      .map(t => -math.floor(math.log(counts(t).toDouble / total.toDouble) * 1e6).toLong)
      .sum
    assert(row.getAs[Long]("sum_surprise") == expected)
  }

  test("external LM: OOV tokens score as count 1, no dropped rows") {
    val lm = Seq(("the", 100L), ("cat", 50L)).toDF("token", "c")
    val out = LmScore.surprise(docs, "doc_id", "text", lm)
    assert(out.count() == 10) // every doc survives
    val row9 = out.filter($"doc_id" === 9L).collect().head
    // all-OOV doc: 10 tokens each at -floor(1e6 * ln(1/150))
    assert(row9.getAs[Long]("sum_surprise") ==
      10L * -math.floor(math.log(1.0 / 150.0) * 1e6).toLong)
  }
}
