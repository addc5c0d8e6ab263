package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Aho–Corasick claim: one O(|text|) scan for the whole
  * term list vs a per-term indexOf pass (the regex-per-term shape).
  * Terms are two-word vocab combinations so hits are realistic.
  * Not part of the driver contract; SCALE.md records the numbers.
  */
object KeywordProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nTerms = args.lift(0).map(_.toInt).getOrElse(500)
    val amp = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Array("table", "spark", "window", "fast", "slow", "scan",
      "row", "key", "value", "part", "hash", "merge", "batch", "line",
      "sort", "agg", "join", "query", "order", "group", "stream", "filter",
      "column", "vector", "data", "big", "small", "the", "customer")
    val terms = (for (a <- vocab; b <- vocab if a != b) yield s"$a $b").take(nTerms).toSeq
    val docs = Amplify.documents(
      spark.read.parquet(s"$sfDir/documents.parquet").repartition(32), amp)
      .select("doc_id", "text").cache()
    val n = docs.count()
    println(s"[kw] $n docs, ${terms.length} terms")

    def time(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[kw] $name: min=${runs.min}%.2f s")
    }

    time("aho_corasick (one scan, all terms)") {
      graft.ops.KeywordTag.tagKeywords(docs, "doc_id", "text", terms)
        .groupBy(col("term")).agg(sum(col("n")))
        .write.format("noop").mode("overwrite").save()
    }

    time("per_term_indexOf (the regex-per-term shape)") {
      val termsArr = terms.toArray
      val perTerm = udf((t: String) => {
        val lower = t.toLowerCase
        termsArr.zipWithIndex.flatMap { case (term, i) =>
          var c = 0L; var p = lower.indexOf(term)
          while (p >= 0) { c += 1; p = lower.indexOf(term, p + 1) }
          if (c > 0) Some((i, c)) else None
        }
      })
      docs.select(explode(perTerm(col("text"))).as("h"))
        .groupBy(col("h._1")).agg(sum(col("h._2")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
