package graft

import graft.split.WhitespaceTokenizer

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token_count_native: codegen Expression matches WhitespaceTokenizer.count") {
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "a b  c", "  lead", "trail  ", "\ttab\nnl  x", "one",
      "\u0001 a", "b \u0002", "a\u0001b") // boundary C0 controls: String.trim strips them
    val out = samples.toDF("t")
      .selectExpr("t", "token_count_native(t) AS n")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach { s =>
      assert(out(s) == WhitespaceTokenizer.count(s), s"for '$s'")
    }
  }

  test("token_count_native participates in whole-stage codegen over a real scan") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "token_count_native(text) AS n")
    // "*(1)" is the WholeStageCodegen marker in the compact plan string —
    // the projection containing the expression is inside the codegen span.
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [doc_id"))
    val viaExpr = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n")
    assert(df.orderBy("doc_id").collect().map(_.getInt(1)).toSeq ==
      viaExpr.orderBy("doc_id").collect().map(_.getInt(1)).toSeq)
  }

  test("SQL surface: minhash/simhash/shingles/semantic_split callable from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("doc one text here", 1L)).toDF("text", "id").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT size(minhash_sig12(text)) AS k, simhash48(text) AS fp,
        |size(shingles3(text)) AS sh, size(semantic_split(text)) AS chunks FROM t""".stripMargin)
      .collect()(0)
    assert(row.getAs[Int]("k") == 12)
    assert(row.getAs[Long]("fp") >= 0L)
    assert(row.getAs[Int]("sh") == 2)
    assert(row.getAs[Int]("chunks") == 1)
  }

  test("SQL surface: BPE + markdown functions (token_count_bpe, truncate_bpe, md_to_plain, mdformat)") {
    GraftFunctions.register(spark)
    Seq(("# Head\n\nsome body text here with words", 1L)).toDF("md", "id")
      .createOrReplaceTempView("m")
    val row = spark.sql(
      """SELECT token_count_bpe(md) AS n, truncate_bpe(md, 3) AS t3,
        |md_to_plain(md) AS plain, mdformat(md) AS canon,
        |size(bpe_encode(md)) AS ids FROM m""".stripMargin)
      .collect()(0)
    assert(row.getAs[Int]("n") > 0)
    assert(row.getAs[Int]("ids") == row.getAs[Int]("n"))
    val t3 = row.getAs[String]("t3")
    assert("# Head\n\nsome body text here with words".startsWith(t3), "truncate must be a prefix")
    assert(row.getAs[String]("plain") == "Head\nsome body text here with words")
    assert(row.getAs[String]("canon") == "# Head\n\nsome body text here with words")
    // r14 --wrap surface: keep/no/width accepted, width counts columns
    val w = spark.sql(
      """SELECT mdformat_wrap('a b\nc d', 'no') AS joined,
        |mdformat_wrap('aaa bbb ccc', '7') AS filled,
        |mdformat_wrap('a b\nc d', 'keep') AS kept FROM m""".stripMargin)
      .collect()(0)
    assert(w.getAs[String]("joined") == "a b c d")
    assert(w.getAs[String]("filled") == "aaa bbb\nccc")
    assert(w.getAs[String]("kept") == "a b\nc d")
    // malformed widths all get the clear message: '0' (fails the >= 1
    // floor, not a deep require) and a digit string beyond Int.MaxValue
    // (toIntOption, not NumberFormatException)
    for (bad <- Seq("0", "9999999999", "-3", "wide")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT mdformat_wrap('a b', '$bad') FROM m").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("must be 'keep', 'no', or a positive integer width")),
        s"'$bad': ${msgs(e)}")
    }
  }

  test("SQL surface: semantic_split_rows generator via LATERAL VIEW") {
    GraftFunctions.register(spark)
    val longDoc = (1 to 700).map(i => s"w$i").mkString(" ") // > 288 tokens
    Seq((1L, longDoc), (2L, "tiny doc")).toDF("id", "md").createOrReplaceTempView("docs_g")
    val rows = spark.sql(
      """SELECT id, c.chunk_index, c.chunks_count, c.chunk
        |FROM docs_g LATERAL VIEW semantic_split_rows(md) c
        |ORDER BY id, c.chunk_index""".stripMargin).collect()
    val byId = rows.groupBy(_.getLong(0))
    assert(byId(1L).length > 1, "long doc must generate multiple rows")
    assert(byId(1L).map(_.getInt(1)).toSeq == byId(1L).indices.toSeq) // dense chunk_index
    assert(byId(1L).forall(_.getInt(2) == byId(1L).length))
    assert(byId(2L).map(_.getString(3)).toSeq == Seq("tiny doc"))
    // chunks reassemble the original tokens in order
    val tokens = byId(1L).flatMap(_.getString(3).split("\\s+"))
    assert(tokens.toSeq == (1 to 700).map(i => s"w$i"))
  }

  test("repStats: top-gram tie breaks lexicographically; dup-gram chars are exact") {
    import graft.functions.Kernels
    // "b c" and "a b" both occur twice -> lexicographic tie-break picks "a b"
    val (g, c, _) = Kernels.repStats("a b c a b c", 2, 5)
    assert((g, c) == ("a b", 2L))
    // one duplicated 5-gram "x x x x x": 6 tokens give positions 1-2, both
    // the same gram (9 chars) occurring twice -> 18 duplicate chars
    val (_, _, d) = Kernels.repStats("x x x x x x", 2, 5)
    assert(d == 18L)
    // no repetition: zero duplicate chars, every 2-gram count 1
    val (_, c1, d0) = Kernels.repStats("one two three four five six", 2, 5)
    assert(c1 == 1L && d0 == 0L)
    // fewer tokens than the gram width: empty top gram, zero everywhere
    assert(Kernels.repStats("solo", 2, 5) == ("", 0L, 0L))
  }

  test("SQL surface: minhash_union12 UDAF aggregates elementwise minima per group") {
    GraftFunctions.register(spark)
    Seq(("g1", Seq(5L, 9L)), ("g1", Seq(3L, 20L)), ("g2", Seq(7L, 1L)))
      .toDF("g", "sig").createOrReplaceTempView("sigs")
    val rows = spark.sql(
      "SELECT g, minhash_union12(sig) AS u FROM sigs GROUP BY g ORDER BY g").collect()
    assert(rows(0).getSeq[Long](1).take(2) == Seq(3L, 9L))
    assert(rows(1).getSeq[Long](1).take(2) == Seq(7L, 1L))
  }

  test("SQL surface: mask_pii and gopher_stats match their Column/kernel forms") {
    GraftFunctions.register(spark)
    Seq(("bob@x.io at 10.1.1.1 via +49 30 123456", 1))
      .toDF("t", "i").createOrReplaceTempView("pii")
    val m = spark.sql("SELECT mask_pii(t) AS m FROM pii").head().getString(0)
    assert(m == "<EMAIL> at <IP> via <PHONE>")
    val st = spark.sql("SELECT gopher_stats('the a quick fox') AS s FROM pii")
      .select("s._1", "s._4").head()
    assert(st.getLong(0) == 4L && st.getLong(1) == 2L)
    // native codegen dot product on the SQL surface
    assert(spark.sql("SELECT dot_long(array(1L, 2L), array(3L, 4L)) AS d")
      .head().getLong(0) == 11L)
  }

  test("SQL surface: window_hashes and stride_chunks match their kernels") {
    GraftFunctions.register(spark)
    val wh = spark.sql("SELECT window_hashes('a b c d', 3) AS h").head().getSeq[Long](0)
    assert(wh == graft.functions.Kernels.windowHashes("a b c d", 3).toSeq)
    assert(wh.length == 2)
    val ch = spark.sql("SELECT stride_chunks('a b c d e', 3, 2) AS c").head().getSeq[String](0)
    assert(ch == Seq("a b c", "c d e", "e"))
  }

  test("canonicalizeUrl: scheme/host case, ports, fragments, tracking params, slash") {
    import graft.functions.text
    def canon(s: String): String = Seq(s).toDF("u")
      .select(text.canonicalizeUrl($"u").as("c")).head().getString(0)
    assert(canon("HTTPS://Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      == "https://example.com/A/b?a=1&b=2")
    assert(canon("http://Host.io:80/") == "http://host.io")
    assert(canon("https://x.io/p?fbclid=abc&gclid=1") == "https://x.io/p")
    assert(canon("https://x.io/p?utm_medium") == "https://x.io/p")
    // path case preserved; non-default port preserved
    assert(canon("https://X.io:8080/Path") == "https://x.io:8080/Path")
    // default-port strip is scheme-specific: :443 on http is a REAL port
    assert(canon("http://Host.io:443/a") == "http://host.io:443/a")
    assert(canon("ftp://Host.io:80/a") == "ftp://host.io:80/a")
    // userinfo keeps its case; only the host lowercases
    assert(canon("https://TokenA@Api.X.io/r") == "https://TokenA@api.x.io/r")
    // non-URLs pass through untouched
    assert(canon("not a url #tag") == "not a url #tag")
  }

  test("normalizeText: NFC composes accents, strips controls, keeps tab/newline") {
    import graft.functions.text
    def norm(s: String): String = Seq(s).toDF("t")
      .select(text.normalizeText($"t").as("n")).head().getString(0)
    assert(norm("Café") == "Café")           // e + combining acute -> é
    assert(norm("a\u0007b\u0000c") == "abc")            // BEL and NUL stripped
    assert(norm("a\u0085b\u0092c") == "abc")            // C1 (NEL, cp1252 band) stripped
    assert(norm("a\tb\nc\rd") == "a\tb\nc\rd")          // whitespace controls kept
    assert(norm("plain ascii") == "plain ascii")
  }

  test("maskPii: email -> IPv4 -> phone, typed placeholders, URLs untouched") {
    import graft.functions.text
    def mask(s: String): String = Seq(s).toDF("t")
      .select(text.maskPii($"t").as("m")).head().getString(0)
    assert(mask("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(mask("host 192.168.0.1 up") == "host <IP> up")
    assert(mask("call +49-170-12345 or +1 800 5551234") == "call <PHONE> or <PHONE>")
    // an IPv4 is masked before the phone pass can see its digits
    assert(mask("10.0.3.17") == "<IP>")
    // version strings that aren't 4 dotted octets survive
    assert(mask("v1.2.3 released") == "v1.2.3 released")
    // plain URLs are left for maskUrls — separate concern
    assert(mask("see https://x.io/a") == "see https://x.io/a")
    assert(mask("both bob@x.io at 10.1.1.1 via +49 30 123456") ==
      "both <EMAIL> at <IP> via <PHONE>")
  }
}
