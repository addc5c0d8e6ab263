package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the gopher gate forms (r14): legacy
  * HOF-expression cascade vs the one-pass kernel UDF, counted to the
  * noop-equivalent (count of kept docs — both must agree) over the
  * x15 amplified 500k-doc corpus. Interleaved cycles so the box band
  * hits both symmetrically.
  */
object GateAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val f = 100
    val docs = spark.read.parquet(
      s"${sys.props("java.io.tmpdir")}/graft_bench_documents_x$f" +
        new java.io.File(sfDir).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_") +
        ".parquet")
    docs.persist(); println("docs=" + docs.count())
    val stop = Seq("the", "a", "and", "of", "to", "in")
    def legacyReason = {
      val gs = graft.ops.Curation.gopherStatsExprLegacy(col("text"), stop)
      val n = gs.getField("_1"); val sc = gs.getField("_2")
      val na = gs.getField("_3"); val hs = gs.getField("_4")
      val mean = when(n > 0, sc.cast("double") / n)
      val af = when(n > 0, na.cast("double") / n)
      when(n < 40, "too_short").when(n > 100000, "too_long")
        .when(mean < 3.0 || mean > 10.0, "token_len")
        .when(af < 0.8, "alpha").when(!hs, "stopwords")
        .when(!col("lang").isin("en", "es", "de", "fr"), "lang")
    }
    def kernelReason =
      graft.ops.Curation.gopherReason(col("text"), col("lang"), minTokens = 40)
    def time(c: org.apache.spark.sql.Column): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = docs.filter(c.isNull).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    time(legacyReason); time(kernelReason) // warm
    for (cyc <- 1 to 4) {
      val (tl, nl) = time(legacyReason)
      val (tk, nk) = time(kernelReason)
      println(f"[gateab] cycle $cyc legacy=$tl%.3f kernel=$tk%.3f " +
        s"kept_legacy=$nl kept_kernel=$nk agree=${nl == nk}")
    }
    spark.stop()
  }
}
