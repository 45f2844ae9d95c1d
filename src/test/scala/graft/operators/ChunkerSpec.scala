package graft.operators

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private val doc = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("strideChunks: windows overlap by window - stride tokens and cover every token") {
    val out = Chunker.strideChunks(doc, "doc_id", "text", windowTokens = 48, stride = 32)
      .orderBy("chunk_index")
      .select("chunk_index", "chunks_count", "token_len", "chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(out.map(_._2).distinct == Seq(4)) // ceil(100/32)
    assert(out.map(_._3) == Seq(48, 48, 36, 4)) // starts 0,32,64,96; ends clip at 100
    // consecutive windows share the last 16 tokens of the previous window
    val first = out(0)._4.split(" ").toSeq
    val second = out(1)._4.split(" ").toSeq
    assert(first.takeRight(16) == second.take(16))
    assert(second.head == "t33")
    // every token appears in at least one window
    assert(out.flatMap(_._4.split(" ")).toSet.size == 100)
  }

  test("strideChunks with stride == window equals fixedTokenChunks") {
    val a = Chunker.strideChunks(doc, "doc_id", "text", 30, 30)
      .select("chunk_index", "chunk_sha").as[(Int, String)].collect().toSet
    val b = Chunker.fixedTokenChunks(doc, "doc_id", "text", 30)
      .select("chunk_index", "chunk_sha").as[(Int, String)].collect().toSet
    assert(a == b)
  }
}
