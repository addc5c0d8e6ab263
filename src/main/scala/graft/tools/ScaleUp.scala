package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only data amplifier: replicates the driver's sf0.1 tables N×
  * into a derived directory, shifting every join/partition key by
  * `rep * KEY_OFFSET` so each replica is a disjoint key universe —
  * the same linear scaling TPC-H itself uses (customer/orders/lineitem
  * grow with SF; group-key domains like returnflag/linestatus stay
  * fixed). Join fan-outs, window partition counts and self-join pair
  * expansions all scale exactly 10×, so a bench at the derived sf1 is
  * a faithful 10× workload, not 10 copies of the same answer.
  *
  * This exists ONLY to demonstrate the Spark-vs-DuckDB crossover at a
  * scale where per-query fixed overhead stops dominating (VERDICT r4,
  * Next #6). Correctness testing still runs exclusively on the
  * driver-generated /root/testdata parquet.
  */
object ScaleUp {
  /** Above every key in sf0.1 (max l_orderkey ~ 6e5) and big enough
    * that 1000 replicas stay far from Long overflow. */
  val KeyOffset: Long = Amplify.KeyOffset

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/tmp/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset (skip re-deriving
    // the multi-GB fact tables when only adding new ones)
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    deriveTables(spark, src, dst, n, only)
    spark.stop()
  }

  /** Callable core of the derivation (r11 verdict #8: `graft.Bench`
    * derives its sf1 Layer-A tier in-process — it must not spin or
    * stop a SparkSession of its own).
    */
  def deriveTables(spark: SparkSession, src: String, dst: String, n: Int,
      only: Option[Set[String]]): Unit = {
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val reps = spark.range(n).toDF("rep")
    // The sf0.1 files are single-row-group = ONE scan partition, so an
    // un-repartitioned crossJoin expands the whole n× replica set in a
    // single task (measured: the first sf100 attempt ran 600M rows on
    // one core). Repartitioning the SOURCE (a cheap ~600k-row shuffle)
    // parallelizes the expansion 32 ways, and since crossJoin preserves
    // the child's partitioning, each task writes its own file directly —
    // no post-expansion shuffle of the full derived table at all. The
    // 32 output files also give downstream scans real task parallelism
    // (see SCALE.md "Local-mode honesty").
    def scale(name: String, keys: Set[String]): Unit = if (wanted(name)) {
      val df = spark.read.parquet(s"$src/$name.parquet").repartition(32)
      val out = df
        .crossJoin(broadcast(reps))
        .select(df.columns.map { c =>
          if (keys(c)) (col(c) + col("rep") * KeyOffset).as(c) else col(c)
        }: _*)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> $dst/$name.parquet (x$n)")
    }

    scale("customer", Set("c_custkey"))
    scale("orders", Set("o_orderkey", "o_custkey"))
    scale("lineitem", Set("l_orderkey", "l_partkey", "l_suppkey"))

    // events: ids/users shift like join keys; ts stays (windowed aggs
    // then see n× density per window, the realistic way event volume
    // grows). ts is TIMESTAMP(NANOS) → builder needs nanosAsLong, but
    // this session reads it as long transparently for a copy.
    scale("events", Set("event_id", "user_id"))

    // documents: shifting doc_id alone would make every replica a
    // byte-identical near-dup of the original — LSH/minhash candidate
    // pairs would grow QUADRATICALLY in n and the derived bench would
    // measure a different (pathologically dense) workload. Injecting a
    // replica-specific character every 8 chars rewrites ~half of all
    // 5-gram shingles, pushing cross-replica Jaccard far below any
    // dedup threshold: replicas become disjoint near-dup universes and
    // the workload scales linearly, like the TPC-H tables above.
    if (wanted("documents")) {
      val df = spark.read.parquet(s"$src/documents.parquet").repartition(32)
      Amplify.documents(df, n)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      println(s"[scaleup] documents -> $dst/documents.parquet (x$n, salted)")
    }

    // embeddings: identical vectors across replicas would put every
    // replica pair at cosine 1.0 — same quadratic blow-up. A circular
    // shift by rep positions is norm-preserving and near-orthogonal
    // for these synthetic vectors, so replicas stay disjoint for ANN /
    // near-dup purposes while the value distribution is unchanged.
    // `label` is a BLOCKING key (blockedNearDupPairs blocks on it), so
    // it must shift per replica like every other key: carrying it
    // unchanged made block sizes grow ×n and the within-block dot
    // count grow ×n² even though the rotation kept output pairs linear
    // (measured: l20 2.2 s at sf1 → 184 s at sf10). Realistic corpora
    // grow the blocking-key domain with corpus size, exactly like
    // TPC-H grows key domains but not group domains.
    if (wanted("embeddings")) {
      val df = spark.read.parquet(s"$src/embeddings.parquet").repartition(32)
      Amplify.embeddings(df, n)
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scaleup] embeddings -> $dst/embeddings.parquet (x$n, rotated+label-shifted)")
    }
  }
}
