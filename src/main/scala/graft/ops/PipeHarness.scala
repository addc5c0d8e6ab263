package graft.ops

/** External-aligner pipe harness (reference: src/Bowtie2Aligner.hpp's
  * pipe-deadlock-avoidant design). Three OS pipes connect parent and
  * child, each with a small bounded kernel buffer (~64 KB); a
  * single-threaded feed-all-then-read-all parent deadlocks as soon as
  * the child's stdout fills while the parent is still writing stdin —
  * and, subtler, a child that logs more than one pipe buffer to
  * STDERR blocks even a two-threaded parent that never drains it.
  * So: stdin is fed from a dedicated writer thread, stderr is drained
  * concurrently (tail retained for diagnostics), and the calling
  * thread streams stdout. All three legs make progress independently;
  * no pipe can wedge the pipeline regardless of the child's
  * read/write interleaving or verbosity.
  */
object PipeHarness {

  final case class PipeResult(exitCode: Int, stderrTail: String)

  /** Stream `records` (read_id, sequence) as FASTA into `cmd`'s stdin
    * while forwarding its stdout lines to `onLine`. Returns exit code
    * and the retained stderr tail. Throws nothing on nonzero exit —
    * the caller decides (bowtie2 exits 1 on some warning classes the
    * reference tolerates).
    */
  def pipeFasta(cmd: Seq[String], records: Iterator[(String, String)],
      onLine: String => Unit, stderrTailBytes: Int = 8192): PipeResult =
    pipe(cmd, w => records.foreach { case (id, seq) =>
      w.write('>'); w.write(id); w.write('\n'); w.write(seq); w.write('\n')
    }, onLine, stderrTailBytes)

  /** General form: `feed` writes the child's whole stdin (FASTA,
    * FASTQ, interleaved pairs — the caller picks the record format,
    * matching the reference's write_queries_* family in
    * src/Bowtie2Aligner.cpp:389-455). Same three-legged deadlock-free
    * structure as pipeFasta.
    */
  def pipe(cmd: Seq[String], feed: java.io.Writer => Unit,
      onLine: String => Unit, stderrTailBytes: Int = 8192): PipeResult = {
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()

    // Writer leg: feeds stdin independently of stdout consumption.
    // IOExceptions (child died early, pipe closed) end the feed quietly
    // — the exit code tells the real story.
    val writer = new Thread(() => {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(proc.getOutputStream,
          java.nio.charset.StandardCharsets.US_ASCII))
      try {
        feed(w)
        w.close()
      } catch { case _: java.io.IOException => () }
    }, "graft-pipe-writer")
    writer.setDaemon(true)

    // Stderr leg: drain continuously, keep only the tail. Without this
    // a chatty child (verbose logging, warning storms) fills the
    // 64 KB stderr pipe and freezes mid-write — the deadlock the
    // harness exists to prevent.
    val errTail = new java.util.ArrayDeque[String]()
    var errBytes = 0
    val errReader = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream))
      try {
        var line = r.readLine()
        while (line != null) {
          errTail.synchronized {
            errTail.addLast(line); errBytes += line.length + 1
            while (errBytes > stderrTailBytes && errTail.size > 1) {
              errBytes -= errTail.removeFirst().length + 1
            }
          }
          line = r.readLine()
        }
      } catch { case _: java.io.IOException => () }
    }, "graft-pipe-stderr")
    errReader.setDaemon(true)

    writer.start(); errReader.start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = out.readLine()
    while (line != null) { onLine(line); line = out.readLine() }
    val exit = proc.waitFor()
    writer.join(); errReader.join()
    PipeResult(exit, errTail.synchronized(
      scala.jdk.CollectionConverters.IteratorHasAsScala(errTail.iterator).asScala.mkString("\n")))
  }
}
