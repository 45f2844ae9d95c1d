object QProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s  ($n rows)")
    }
    val docs = graft.Tables.load(spark, d, "documents")
    val md = graft.functions.text.bindOnce(
      split(trim(repeat(concat(trim(col("text")), lit(" ")), 31)), "\\s+")) { rep =>
      val c1 = concat_ws(" ", slice(rep, 1, 119))
      val c2 = concat_ws(" ", slice(rep, 120, 119))
      val c3 = concat_ws(" ", slice(rep, 239, 59))
      val tr = concat_ws("\n", (1 to 8).map(i =>
        concat(lit(s"| r$i | "), element_at(rep, 297 + i), lit(" |"))): _*)
      concat(lit("# Doc "), col("doc_id").cast("string"), lit("\n\n## Section A\n\npA "), c1,
        lit("\n\npB "), c2, lit("\n\n## Section B\n\n| k | v |\n| --- | --- |\n"), tr, lit("\n\npC "), c3)
    }
    // warmup
    docs.select(md.as("md")).queryExecution.toRdd.count()
    time("md construction")(docs.select(col("doc_id"), md.as("md")).queryExecution.toRdd.count())
    val ds = docs.select(col("doc_id"), md.as("md")).as[(Long, String)]
    time("md + encode to tuples")(ds.queryExecution.toRdd.count())
    val splitter = new graft.split.SemanticSplitter()
    val chunks = ds.flatMap { case (id, m) =>
      splitter.splitDoc(graft.contracts.MarkdownDoc(m, "", "", Map("doc_id" -> id.toString))) }
    time("+ splitDoc flatMap")(chunks.queryExecution.toRdd.count())
    time("+ splitDoc again")(chunks.queryExecution.toRdd.count())
    val fin = chunks.select(col("metadata").getItem("doc_id").cast("long").as("doc_id"),
      col("metadata").getItem("chunk_index").cast("long").as("chunk_index"),
      col("metadata").getItem("chunks_count").cast("long").as("chunks_count"),
      col("metadata").getItem("token_len").cast("long").as("token_len"),
      sha2(col("md"), 256).as("chunk_sha")).orderBy(col("doc_id"), col("chunk_index"))
    time("full q54")(fin.queryExecution.toRdd.count())
    spark.stop()
  }
}
