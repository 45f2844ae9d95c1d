package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.contracts.{Chunk, EmbeddingRow}
import graft.split.Tokenizer
import graft.split.WhitespaceTokenizer

/** Embedding stage (SURVEY.md §2.11 E1-E4; reference
  * wurzel/steps/embedding/step.py + huggingface.py).
  *
  * The reference embeds one text per HTTP request (huggingface.py:117-122);
  * the engine batches per partition — `mapPartitions` with a per-executor
  * client, `batchSize` texts per call. Skip-on-failure with fail-if-all
  * mirrors step.py:263-272. The model-name-driven prefix injection ("e5-"
  * models get "query: " prepended, huggingface.py:155-192) happens before
  * the call; `embedding_input_text` records the cleaned+prefixed text.
  */
object Embedding {

  /** Executor-side embedding backend. Real deployments implement this with
    * an HTTP TEI client (pooled connection per executor); tests and the
    * corpus oracle use [[MockEmbeddingClient]]. */
  trait EmbeddingClient extends Serializable {
    def modelName: String
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic md5-derived embedding — same math as
    * graft.functions.vectors.mockEmbedQ scaled to [0, 1): dim i of text t is
    * (first 8 md5 hex chars of t || '#e' || i) % 1000 / 1000f. */
  final case class MockEmbeddingClient(dim: Int = 8, modelName: String = "mock-e5-small")
      extends EmbeddingClient {
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        Array.tabulate(dim) { i =>
          val h = graft.functions.Kernels.md5Hex(t + "#e" + i).substring(0, 8)
          (java.lang.Long.parseLong(h, 16) % 1000L) / 1000f
        }
      }
  }

  /** Prefix map (reference settings PREFIX_MAP,
    * wurzel/steps/embedding/settings.py:57-59): first regex matching the
    * model name wins. */
  val DefaultPrefixMap: Seq[(String, String)] = Seq("(^|/)e5-|-e5-" -> "query: ")

  def prefixFor(modelName: String, prefixMap: Seq[(String, String)]): String =
    prefixMap.collectFirst {
      case (re, p) if re.r.findFirstIn(modelName).isDefined => p
    }.getOrElse("")

  /** Text cleaning before embedding (reference step.py:123-140, 214-233):
    * a structural markdown walk — fence bodies verbatim, link text kept,
    * images dropped, URLs masked (graft.split.MarkdownText, F2). Identity
    * on plain single-line text, so the q51 oracle's 'query: ' || text
    * replication holds unchanged. */
  def clean(md: String): String = graft.split.MarkdownText.toPlain(md)

  /** Chunk -> EmbeddingRow with partition-batched client calls; failed
    * batches skip their rows (counted), fail-if-all via accumulator check
    * after the action. */
  def embedChunks(ds: Dataset[Chunk], client: EmbeddingClient,
                  batchSize: Int = 32,
                  prefixMap: Seq[(String, String)] = DefaultPrefixMap): Dataset[EmbeddingRow] =
    new EmbeddingStep(client, batchSize, prefixMap).embed(ds)

  /** Stateful wrapper carrying the reference's error-containment contract
    * (step.py:263-272: skip failed rows, fail only when ALL rows failed).
    * Call `assertNotAllSkipped()` after the terminal action. */
  final class EmbeddingStep(client: EmbeddingClient, batchSize: Int = 32,
                            prefixMap: Seq[(String, String)] = DefaultPrefixMap)
      extends Serializable {
    @transient private var total: org.apache.spark.util.LongAccumulator = _
    @transient private var skipped: org.apache.spark.util.LongAccumulator = _

    def embed(ds: Dataset[Chunk]): Dataset[EmbeddingRow] = {
      val sp = ds.sparkSession
      import sp.implicits._
      val tot = sp.sparkContext.longAccumulator("embed_total")
      val skp = sp.sparkContext.longAccumulator("embed_skipped")
      total = tot; skipped = skp
      val prefix = prefixFor(client.modelName, prefixMap)
      val cl = client
      val bs = batchSize
      ds.mapPartitions { it =>
        it.grouped(bs).flatMap { batch =>
          tot.add(batch.size)
          val inputs = batch.map(c => prefix + clean(c.md))
          try {
            val vecs = cl.embed(inputs)
            // reuse `inputs` — clean() is a multi-regex markdown walk per
            // chunk; recomputing it per row doubled the hot-path cost
            batch.lazyZip(inputs).lazyZip(vecs).map { (c, in, v) =>
              EmbeddingRow(c.md, c.url, v, c.keywords, in, c.metadata)
            }
          } catch { case _: Exception => skp.add(batch.size); Seq.empty[EmbeddingRow] }
        }
      }
    }

    def assertNotAllSkipped(): Unit =
      if (total != null && total.value > 0 && skipped.value == total.value)
        throw new IllegalStateException(
          s"all ${total.value} chunks failed to embed (reference fail-all, embedding/step.py:271-272)")

    def skipStats: (Long, Long) =
      (if (total == null) 0L else total.value, if (skipped == null) 0L else skipped.value)
  }

  /** E2: no split — clean then token-truncate to maxTokens, then embed. */
  def embedTruncated(ds: Dataset[Chunk], client: EmbeddingClient, maxTokens: Int,
                     tk: Tokenizer = WhitespaceTokenizer): Dataset[EmbeddingRow] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val truncated = ds.map(c => c.copy(md = tk.truncate(c.md, maxTokens)))
    embedChunks(truncated, client)
  }

  /** E3: multi-vector — group chunk embeddings back per source doc. */
  def embedMultiVector(rows: Dataset[EmbeddingRow]): DataFrame =
    rows.toDF()
      .withColumn("src", col("metadata").getItem("source_sha256_hash"))
      .withColumn("ci", col("metadata").getItem("chunk_index").cast("int"))
      .groupBy(col("src"), col("url"), col("keywords"))
      .agg(
        sort_array(collect_list(struct(col("ci"), col("vector")))).as("ordered"),
        sort_array(collect_list(struct(col("ci"), col("text")))).as("orderedTexts"))
      .select(
        col("src"), col("url"), col("keywords"),
        transform(col("ordered"), x => x.getField("vector")).as("vectors"),
        transform(col("orderedTexts"), x => x.getField("text")).as("splits"))
}
