package graft

import graft.split.WhitespaceTokenizer

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token_count_native: codegen Expression matches WhitespaceTokenizer.count") {
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "a b  c", "  lead", "trail  ", "\ttab\nnl  x", "one")
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
}
