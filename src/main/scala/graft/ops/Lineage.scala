package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage truncation for the iterative operators (connected
  * components, PageRank/PPR/HITS, BPE training, k-means): each round
  * must cut the logical plan AND the RDD lineage or both grow one
  * join-tree per iteration (analysis time, stack depth, and re-compute
  * cost all compound).
  *
  * Two modes:
  *
  *  - '''Default — eager `localCheckpoint`''': blocks live on the
  *    executors, no extra I/O. The right call on local[32] and on any
  *    cluster where the job can simply be re-run on failure. The
  *    caveat (r13 verdict #5): local-checkpoint blocks die WITH an
  *    executor, and because the lineage is gone Spark cannot recompute
  *    them — on a 1000-executor / 100 TB run an executor loss kills
  *    the whole job.
  *  - '''Reliable — `spark.graft.checkpoint.dir`''': when the session
  *    conf (or a `--conf` at spark-submit) sets this to a
  *    fault-tolerant path (HDFS/S3), every truncation becomes a
  *    reliable `Dataset.checkpoint(eager = true)` there: blocks
  *    survive executor loss and the job keeps going. The frames the
  *    iterative ops truncate are id-sized (labels, ranks, vocab —
  *    never the corpus), so the per-round write is small relative to
  *    the shuffles the round already pays. Set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
  *    the ContextCleaner reap superseded rounds' files.
  *
  * A hybrid ("reliable every N rounds, local in between") does NOT
  * restore fault tolerance and is deliberately not offered: a
  * localCheckpoint between reliable ones re-severs the lineage, so an
  * executor loss still strands the rounds since the last reliable
  * write with no recompute path. Interleaving `persist` (which keeps
  * lineage) would instead re-grow the plan the truncation exists to
  * cut. One switch, two honest contracts.
  */
object Lineage {

  val DirKey = "spark.graft.checkpoint.dir"

  // Last DirKey value WE applied to a context (appId -> dir).
  // setCheckpointDir appends a per-set UUID subdir, so the context's
  // own getCheckpointDir never equals the configured value — without
  // this memo a DirKey CHANGE mid-session would be silently ignored
  // (checkpoints keep landing in the first dir; r14 review finding).
  @volatile private var applied: Map[String, String] = Map.empty

  /** Truncate `ds`'s plan + lineage, eagerly materializing it.
    * Default: executor-local blocks; with [[DirKey]] set: reliable
    * checkpoint files under that directory.
    */
  def truncate[T](ds: Dataset[T]): Dataset[T] =
    ds.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = ds.sparkSession.sparkContext
        this.synchronized {
          if (!applied.get(sc.applicationId).contains(dir)) {
            sc.setCheckpointDir(dir)
            applied += sc.applicationId -> dir
          }
        }
        ds.checkpoint(eager = true)
      case None => ds.localCheckpoint(eager = true)
    }

  /** `.truncateLineage()` chaining sugar for the call sites. */
  implicit class TruncateOps[T](private val ds: Dataset[T]) extends AnyVal {
    def truncateLineage(): Dataset[T] = Lineage.truncate(ds)
  }
}
