package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text._

/** Token-window chunker — the SQL-expressible core of the reference's
  * splitting pipeline (SURVEY.md §2.10 stage 2 "hard cut" + §2.5 W1 chunk
  * indexing: semantic_splitter.py:583-599, 763-798). The full
  * structure-aware semantic splitter lives in `graft.split`; this operator is
  * the flat token-bounded cut used when no block structure remains, and it is
  * what the 100 TB path wants: one generate (posexplode) per doc, no window
  * functions, chunk_index/chunks_count computed inside the row like the
  * reference does per-doc.
  */
object Chunker {

  /** Split `textCol` into fixed `chunkTokens`-token chunks. Output columns:
    * idCol, chunk_index, chunks_count, token_len, chunk_sha (sha256 of chunk
    * text), chunk_text. */
  def fixedTokenChunks(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val nChunks = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    val chunksArr = transform(sequence(lit(0), nChunks - 1), k =>
      concat_ws(" ", slice(toks, k * chunkTokens + 1, lit(chunkTokens))))
    df.withColumn("chunks_count", nChunks)
      .select(col(idCol), col("chunks_count"), posexplode(chunksArr).as(Seq("chunk_index", "chunk_text")))
      .withColumn("token_len", tokenCount(col("chunk_text")))
      .withColumn("chunk_sha", sha2(col("chunk_text"), 256))
      .select(col(idCol), col("chunk_index"), col("chunks_count"),
        col("token_len"), col("chunk_sha"), col("chunk_text"))
  }

  /** Sliding-window chunker with overlap — the LM-pretraining stride
    * window (each training sequence carries `windowTokens - stride` tokens
    * of left context). Window k covers tokens [k*stride, k*stride +
    * windowTokens); windows start while k*stride < n, so every token is
    * covered and `stride == windowTokens` degenerates to
    * [[fixedTokenChunks]]. Same map-side shape: one posexplode per doc,
    * indices computed in-row, no window functions. */
  def strideChunks(df: DataFrame, idCol: String, textCol: String,
                   windowTokens: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= windowTokens,
      s"stride must be in [1, windowTokens], got $stride/$windowTokens")
    // chunk texts come from a JVM kernel: the equivalent per-chunk
    // slice+concat_ws transform is interpreted and measured ~10x slower on
    // long docs (Kernels.strideChunkTexts is byte-identical). The count
    // rides in each struct, so text tokenizes once and the count cannot
    // disagree with the exploded rows.
    val chunksArr = graft.functions.Kernels.strideChunksUdf(windowTokens, stride)(col(textCol))
    df.select(col(idCol), posexplode(chunksArr).as(Seq("chunk_index", "__c")))
      .select(col(idCol), col("chunk_index"), col("__c._1").as("chunks_count"),
        col("__c._2").as("chunk_text"))
      .withColumn("token_len", tokenCount(col("chunk_text")))
      .withColumn("chunk_sha", sha2(col("chunk_text"), 256))
      .select(col(idCol), col("chunk_index"), col("chunks_count"),
        col("token_len"), col("chunk_sha"), col("chunk_text"))
  }

  /** Splitter metrics (reference markdown_table_splitter.py:404-425 /
    * SURVEY.md A3): chunk_count, total/avg/min/max tokens per group. */
  def chunkMetrics(chunks: DataFrame, groupCol: String): DataFrame =
    chunks.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("chunk_count"),
        sum(col("token_len")).as("total_tokens"),
        min(col("token_len")).as("min_tokens"),
        max(col("token_len")).as("max_tokens"),
        (sum(col("token_len")).cast("double") / count(lit(1))).as("avg_tokens"))
}
