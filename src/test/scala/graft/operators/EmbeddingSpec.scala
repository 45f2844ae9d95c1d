package graft.operators

import graft.SparkSpec
import graft.contracts.Chunk
import Embedding._

class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private val chunks = Seq(
    Chunk("# Head\n\nsome text with https://a.b/c link", "k", "u1",
      Map("chunk_index" -> "0", "chunks_count" -> "2", "source_sha256_hash" -> "s1")),
    Chunk("second *chunk* text", "k", "u1",
      Map("chunk_index" -> "1", "chunks_count" -> "2", "source_sha256_hash" -> "s1")),
    Chunk("other doc body", "k2", "u2",
      Map("chunk_index" -> "0", "chunks_count" -> "1", "source_sha256_hash" -> "s2")))

  test("clean strips markdown and masks urls (reference step.py:123-140, 214-233)") {
    val c = clean("# Head\n\nsee https://x.y/z and *bold* `code`")
    assert(!c.contains("#") && !c.contains("*") && !c.contains("`"))
    assert(c.contains("LINK") && !c.contains("https://"))
  }

  test("prefix map: e5 models get 'query: ' prefix (reference huggingface.py:155-192)") {
    assert(prefixFor("intfloat/e5-large", DefaultPrefixMap) == "query: ")
    assert(prefixFor("mock-e5-small", DefaultPrefixMap) == "query: ")
    assert(prefixFor("bge-base", DefaultPrefixMap) == "")
  }

  test("embedChunks: batched, deterministic vectors, embedding_input_text recorded (E1)") {
    val rows = embedChunks(chunks.toDS(), MockEmbeddingClient(dim = 4), batchSize = 2)
      .collect().sortBy(_.url)
    assert(rows.length == 3)
    assert(rows.forall(_.vector.length == 4))
    assert(rows.forall(r => r.embedding_input_text.startsWith("query: ")))
    // determinism: same text -> same vector
    val again = embedChunks(chunks.toDS(), MockEmbeddingClient(dim = 4), batchSize = 1)
      .collect().sortBy(_.url)
    assert(rows.map(_.vector.toSeq).toSeq == again.map(_.vector.toSeq).toSeq)
  }

  test("embedding fail-if-all: all-failing client throws after the action; partial failure skips") {
    object FailingClient extends EmbeddingClient {
      val modelName = "broken"
      def embed(texts: Seq[String]): Seq[Array[Float]] = throw new RuntimeException("api down")
    }
    val step = new EmbeddingStep(FailingClient, batchSize = 2)
    val out = step.embed(chunks.toDS())
    assert(out.count() == 0)
    val e = intercept[IllegalStateException](step.assertNotAllSkipped())
    assert(e.getMessage.contains("failed to embed"))
    // healthy client: no throw
    val ok = new EmbeddingStep(MockEmbeddingClient(4))
    assert(ok.embed(chunks.toDS()).count() == 3)
    ok.assertNotAllSkipped()
    assert(ok.skipStats == ((3L, 0L)))
  }

  test("embedTruncated cuts to max tokens before embedding (E2)") {
    val long = Chunk((1 to 100).map("w" + _).mkString(" "), "k", "u", Map.empty)
    val row = embedTruncated(Seq(long).toDS(), MockEmbeddingClient(4), maxTokens = 10).collect()(0)
    assert(row.text.split(" ").length == 10)
  }

  test("embedMultiVector groups per source doc in chunk order (E3)") {
    val rows = embedChunks(chunks.toDS(), MockEmbeddingClient(4))
    val mv = embedMultiVector(rows).collect()
    assert(mv.length == 2)
    val u1 = mv.find(_.getAs[String]("url") == "u1").get
    assert(u1.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("vectors").length == 2)
    assert(u1.getAs[scala.collection.Seq[String]]("splits").length == 2)
  }
}
