package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null text must degrade to empty results in every kernel UDF — Spark
  * adds no null-check wrapper for String-typed UDF args, so before the
  * tokenize guard a single null corpus row NPE'd the whole stage. */
class NullKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, null: String), (2L, "a b c d e f g h i j"))
    .toDF("id", "text")

  test("shingle/repetition/winnow kernels return empty results for null text") {
    val sh = df.select(Kernels.shinglesUdf(3)($"text")).as[Seq[String]].collect()
    assert(sh(0).isEmpty && sh(1).nonEmpty)
    val rs = df.select(Kernels.repStatsUdf(2, 5)($"text").as("s"))
      .select("s._1", "s._2", "s._3").as[(String, Long, Long)].collect()
    assert(rs(0) == (("", 0L, 0L)))
    assert(df.select(Kernels.shingleCountUdf(3)($"text")).as[Int].collect().toSeq
      == Seq(0, 8))
    assert(df.select(Kernels.winnowUdf(3, 4)($"text")).as[Seq[Long]].collect()
      .head.isEmpty)
  }

  test("dedup signature paths survive null text end-to-end") {
    val pairs = graft.operators.Dedup.minhashPairs(df, "id", "text")
    assert(pairs.count() == 0) // no crash; null doc simply has no signature
    val decon = graft.operators.Decontaminate.flag(
      df, df.filter($"id" === 2), "id", "text", n = 3)
    val row = decon.orderBy("id").select("n_grams", "contaminated")
      .as[(Long, Boolean)].collect()
    assert(row(0) == ((0L, false)) && row(1)._2)
  }
}
