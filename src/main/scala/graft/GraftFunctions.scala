package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Kernels
import graft.plans.TokenCountExpr
import graft.split.SemanticSplitter

/** SQL surface registration: after `GraftFunctions.register(spark)`, every
  * engine function is callable from `spark.sql(...)` — the reference's
  * "write a TypedStep subclass" extension point becomes "call a function"
  * (SURVEY.md §2.14). `token_count_native` is a codegen'd Catalyst
  * Expression; the rest are JVM-kernel UDFs.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count_native", exprs => TokenCountExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_long", exprs => graft.plans.DotLongExpr(exprs(0), exprs(1)), "scala_udf")
    // table-generating function (§2.14 UDTF shape): LATERAL VIEW splitter
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "semantic_split_rows", exprs => graft.plans.SemanticSplitGen(exprs.head), "scala_udf")

    spark.udf.register("minhash_sig12",
      (text: String) => Kernels.minhashSig(text, 12, 3))
    spark.udf.register("simhash48",
      (text: String) => Kernels.simhashFp(text, 48))
    spark.udf.register("shingles3",
      (text: String) => Kernels.shingleArr(text, 3))
    spark.udf.register("md5_hash60",
      (text: String) => Kernels.hash60(text))
    // TLSH payload hash + distance (reference qdrant/step.py:259-283; null
    // for sub-50-byte or low-variation input, like the library's TNULL)
    spark.udf.register("tlsh_hash", graft.functions.Tlsh.hashUdf)
    spark.udf.register("tlsh_diff",
      (a: String, b: String) =>
        if (a == null || b == null) null
        else Integer.valueOf(graft.functions.Tlsh.diff(a, b)))
    val splitter = new SemanticSplitter()
    spark.udf.register("semantic_split",
      (md: String) => splitter.splitMarkdown(md))
    // reference-equivalent mode: BPE counting + mdformat + sentence leaves
    val refSplitter = SemanticSplitter.referenceDefault()
    spark.udf.register("semantic_split_ref",
      (md: String) => refSplitter.splitMarkdown(md))
    spark.udf.register("html_to_md",
      (html: String) => graft.functions.HtmlToMd.convert(html))
    spark.udf.register("sentences",
      (text: String) => graft.functions.Sentences.split(text))
    spark.udf.register("md_to_plain",
      (md: String) => graft.split.MarkdownText.toPlain(md))
    spark.udf.register("mdformat",
      (md: String) => graft.split.MdFormatLite.normalize(md))
    // mdformat --wrap surface (r14): mode "keep" | "no" | a positive
    // integer column width, mirroring the CLI flag's accepted values
    spark.udf.register("mdformat_wrap",
      (md: String, mode: String) => {
        val w = mode.trim.toLowerCase match {
          case "keep" => graft.split.MdFormatLite.Wrap.Keep
          case "no"   => graft.split.MdFormatLite.Wrap.No
          // toIntOption (not an all-digits check) so '0' and overflowing
          // digit strings get the clear message instead of leaking a
          // require/NumberFormatException from deeper down
          case n if n.toIntOption.exists(_ >= 1) =>
            graft.split.MdFormatLite.Wrap.Width(n.toInt)
          case bad => throw new IllegalArgumentException(
            s"mdformat_wrap: mode must be 'keep', 'no', or a positive integer width, got '$bad'")
        }
        graft.split.MdFormatLite.normalize(md, w)
      })
    // BPE surface (split/Bpe.scala): executor-side vocab loads lazily from
    // the classpath resource, so the closures serialize as plain config.
    // Counting/truncation are BUDGET contexts — they use the full trained
    // table (lowest drift), not the splitter's fixture-parity prefix
    // (FIXTURES.md §1.5 documents the per-context granularity split).
    val bpe = graft.split.BpeTokenizer.counting()
    spark.udf.register("token_count_bpe", (text: String) => bpe.count(text))
    spark.udf.register("truncate_bpe", (text: String, n: Int) => bpe.truncate(text, n))
    spark.udf.register("bpe_encode", (text: String) => bpe.encode(text))
    // typed UDAF (§2.14 many-rows -> aggregate): group-level minhash union
    spark.udf.register("minhash_union12",
      org.apache.spark.sql.functions.udaf(new graft.functions.MinhashUnionAgg(12)))
    // round-5 corpus-hygiene surface: PII redaction (same Java regexes as
    // the Column chain in text.maskPii) and the Gopher gate's one-pass
    // stat kernel as a SQL struct (fields _1.._8: tokens, non-ws chars,
    // alpha tokens, stopword tokens, distinct tokens, lines, bullet
    // lines, '...'-suffixed lines)
    val piiPats = Seq(
      graft.functions.text.EmailRe -> "<EMAIL>",
      graft.functions.text.Ipv4Re -> "<IP>",
      graft.functions.text.PhoneRe -> "<PHONE>"
    ).map { case (re, tag) => java.util.regex.Pattern.compile(re) -> tag }
    spark.udf.register("mask_pii", (s: String) =>
      if (s == null) null
      else piiPats.foldLeft(s) { case (acc, (p, tag)) =>
        p.matcher(acc).replaceAll(tag)
      })
    spark.udf.register("gopher_stats",
      Kernels.gopherStatsUdf(graft.functions.text.EnStop))
    // ExactSubstr building blocks (Dedup.stripDupSpans is the table-level
    // op; these expose the per-row kernels for ad-hoc SQL analysis). Arg
    // checks mirror the table operators' requires — without them a bad
    // literal kills the stage with an opaque executor ArrayIndex/divide
    // error instead of failing fast with a message
    spark.udf.register("window_hashes", (text: String, w: Int) => {
      require(w >= 2, s"window_hashes: window must be >= 2 tokens, got $w")
      Kernels.windowHashes(text, w)
    })
    spark.udf.register("stride_chunks", (text: String, w: Int, s: Int) => {
      require(s >= 1 && s <= w, s"stride_chunks: stride must be in [1, window], got $s/$w")
      Kernels.strideChunkTexts(text, w, s)
    })
  }
}
