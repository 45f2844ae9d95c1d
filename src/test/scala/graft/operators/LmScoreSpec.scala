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

  test("bigram surprise: exact add-one value; predictable transitions score lower") {
    val uni = LmScore.unigramLm(docs, "text")
    val bi = LmScore.bigramLm(docs, "text")
    val out = LmScore.bigramSurprise(docs, "doc_id", "text", uni, bi)
      .select("doc_id", "sum_surprise", "n_tokens").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1's 11 tokens -> 10 transitions
    assert(out(1L)._2 == 10L)
    // recompute doc 9's exact sum from independently-derived corpus counts
    // (doc 10 shares two of doc 9's bigrams and four of its tokens, so the
    // counts genuinely vary per transition)
    val toks = docs.select(explode(split($"text", "\\s+")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val bgs = docs.filter($"doc_id" === 9L).select($"text").as[String].collect().head
      .split(" ").sliding(2).map(a => (a(0), a(1))).toSeq
    val allBgs = docs.select($"text").as[String].collect()
      .flatMap(_.split(" ").sliding(2).map(a => a(0) + " " + a(1)).toSeq)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val v = toks.size.toLong
    val expected = bgs.map { case (w1, w2) =>
      -math.floor(math.log((allBgs(w1 + " " + w2) + 1).toDouble / (toks(w1) + v).toDouble) * 1e6).toLong
    }.sum
    assert(out(9L)._1 == expected)
    // the repeated template doc transitions are highly predictable:
    // its mean bigram surprise is below the rare doc's
    val avg1 = out(1L)._1.toDouble / out(1L)._2
    val avg9 = out(9L)._1.toDouble / out(9L)._2
    assert(avg1 < avg9)
  }

  test("approx thresholds bucket identically to exact on a small frame") {
    val lm = LmScore.unigramLm(docs, "text")
    val scored = LmScore.surprise(docs, "doc_id", "text", lm)
    val exact = LmScore.qualityBuckets(scored)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = LmScore.qualityBuckets(scored, approx = true)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(exact == approx)
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
