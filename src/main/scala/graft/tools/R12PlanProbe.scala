package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-12 rows: l86 must broadcast the benchmark
  * side and fold the max in a partial aggregate; l88 must be one hash
  * aggregate pair on the group key (no window/sort); l84's warc scan
  * must prune unprojected columns. Prints the formatted plans.
  */
object R12PlanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    println("===== l86 semantic decontamination =====")
    val emb = graft.Tables.embeddings(spark, d)
    val l86 = graft.ops.Decontaminate.semanticDecontaminate(
      emb, emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", 0.8)
    println(l86.queryExecution.executedPlan.toString.take(3000))

    println("===== l88 quota sample =====")
    val l88 = graft.ops.Sampling.quotaSample(
      graft.Tables.documents(spark, d), "lang", "doc_id", 50)
    println(l88.queryExecution.executedPlan.toString.take(2500))

    println("===== warc scan column pruning =====")
    val p = new java.io.File(sys.props("java.io.tmpdir"), "graft_planprobe.warc.gz")
    val out = new java.io.FileOutputStream(p)
    try graft.kernel.WarcCodec.write(out, (1 to 3).iterator.map(i =>
      (Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> s"u://$i"),
        ("z" * 50).getBytes)), gzipPerRecord = true)
    finally out.close()
    val pruned = spark.read.format("warc").load(p.getAbsolutePath)
      .select("target_uri", "record_index")
    println(pruned.queryExecution.executedPlan.toString.take(1200))
    spark.stop()
  }
}
