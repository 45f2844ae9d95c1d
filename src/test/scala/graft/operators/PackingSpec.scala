package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(n: Int): org.apache.spark.sql.DataFrame =
    (1L to n.toLong).map { i =>
      (i, Seq.fill(10 + (i % 40).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("greedy: every doc assigned once; multi-doc packs never exceed the budget") {
    val out = Packing.greedy(mkDocs(300), "doc_id", "text", budget = 100, shards = 4)
    assert(out.count() == 300)
    assert(out.select("doc_id").distinct().count() == 300)
    val over = Packing.packStats(out, 100)
      .filter(col("tok_sum") > 100 && col("n_docs") > 1).count()
    assert(over == 0)
  }

  test("greedy: slots are consecutive from 0 within each (shard, pack)") {
    val out = Packing.greedy(mkDocs(200), "doc_id", "text", budget = 120, shards = 3)
    val bad = out.groupBy("shard", "pack")
      .agg(min("slot").as("mn"), max("slot").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count()
    assert(bad == 0)
  }

  test("greedy is deterministic across reruns") {
    val a = Packing.greedy(mkDocs(150), "doc_id", "text", 100, 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = Packing.greedy(mkDocs(150), "doc_id", "text", 100, 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("a doc over the budget gets a pack of its own") {
    val docs = Seq(
      (1L, Seq.fill(500)("w").mkString(" ")), // oversized
      (2L, "a b c"), (3L, "d e f"), (4L, "g h i")
    ).toDF("doc_id", "text")
    val out = Packing.greedy(docs, "doc_id", "text", budget = 100, shards = 1)
    val big = out.filter(col("doc_id") === 1).select("pack").as[Long].head()
    assert(out.filter(col("pack") === big).count() == 1)
  }

  test("null text packs as one empty token; string ids are rejected up front") {
    val docs = Seq((1L, null: String), (2L, "a b c")).toDF("doc_id", "text")
    val out = Packing.greedy(docs, "doc_id", "text", budget = 10, shards = 1)
      .orderBy("doc_id").select("doc_id", "tok").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 3L)))
    val strIds = Seq(("doc-1", "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Packing.greedy(strIds, "doc_id", "text", 10, 1))
    assert(e.getMessage.contains("integral"))
  }

  test("packStats: waste is budget minus fill, floored at zero") {
    val docs = Seq((1L, Seq.fill(30)("w").mkString(" "))).toDF("doc_id", "text")
    val st = Packing.packStats(Packing.greedy(docs, "doc_id", "text", 100, 1), 100)
      .select("n_docs", "tok_sum", "waste").as[(Long, Long, Long)].head()
    assert(st == ((1L, 30L, 70L)))
  }
}
