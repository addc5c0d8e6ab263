package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the r8 dedupSegments rewrite, on REAL document text
  * (the x05 synthetic corpus derives ~15-char lines from doc_id, so
  * the text-sized exchanges the rewrite removes are invisible there).
  * OLD = the r7 shape (posexplode, (doc_id,key) distinct, anti-join,
  * collect_list reassembly — inlined here verbatim for the A/B only);
  * NEW = ops.CorpusStats.dedupLines (keys-only shuffles, map-side
  * filter reassembly). Also value-compares the two outputs.
  *
  * Usage: runMain graft.tools.LineDedupAB [sfDir] [factor]
  */
object LineDedupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val f = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_linededup_docs_x$f.parquet")
    if (!dir.exists())
      Amplify.documents(graft.Tables.documents(spark, sfDir), f)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val docs = spark.read.parquet(dir.getAbsolutePath)
    println(s"[ab] corpus: ${docs.count()} docs")

    def oldShape(minDocs: Int): DataFrame = {
      val sep = "\n"
      val sepRe = java.util.regex.Pattern.quote(sep)
      val lines = docs.select(col("doc_id"),
          posexplode(split(col("text"), sepRe, -1)).as(Seq("line_idx", "line")))
        .withColumn("key", trim(col("line")))
      val common = lines.filter(col("key") =!= "")
        .select(col("doc_id"), col("key")).distinct()
        .groupBy(col("key"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDocs)
        .select(col("key"))
      val kept = lines.join(common, Seq("key"), "left_anti")
      val reassembled = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
              x => x("line")),
            sep).as("clean_text"))
      docs.select(col("doc_id"),
          size(split(col("text"), sepRe, -1)).cast("long").as("n_lines"))
        .join(reassembled, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          (col("n_lines") - coalesce(col("n_kept"), lit(0))).as("n_removed"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    }
    def newShape(minDocs: Int): DataFrame =
      graft.ops.CorpusStats.dedupLines(docs, "doc_id", "text", minDocs)

    def time(name: String)(mk: => DataFrame): Double = {
      def run(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = (1 to 3).map(_ => run()).min
      println(f"[ab] $name best=$best%.3f s")
      best
    }

    // equality first (cheap at f=1 semantics — run on the same corpus)
    val diff = oldShape(3).unionByName(newShape(3))
      .groupBy("doc_id", "n_lines", "n_removed", "clean_text")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 2).count()
    println(s"[ab] old-vs-new differing rows: $diff")

    time("old_r7")(oldShape(3))
    time("new_r8")(newShape(3))
    spark.stop()
  }
}
