package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Deadlock-avoidance tests for the external-aligner pipe harness
  * (VERDICT r6 #8): fake binaries engineered to wedge a naive parent —
  * each scenario pushes more than one 64 KB pipe buffer through the
  * leg under test, so a missing drain thread hangs the test instead of
  * passing slowly. Timeouts guard the suite against regression-as-hang.
  */
class PipeHarnessSpec extends AnyFunSuite {

  private def script(body: String): Seq[String] = {
    val f = java.nio.file.Files.createTempFile("graft_fakebin", ".sh")
    java.nio.file.Files.write(f, s"#!/bin/bash\n$body\n".getBytes)
    f.toFile.setExecutable(true)
    Seq("/bin/bash", f.toString)
  }

  private def timed[T](maxMs: Long)(f: => T): T = {
    // run on a scratch thread so a deadlock fails the test rather than
    // hanging the JVM
    var out: Option[T] = None
    var err: Option[Throwable] = None
    val t = new Thread(() => try out = Some(f) catch { case e: Throwable => err = Some(e) })
    t.setDaemon(true); t.start(); t.join(maxMs)
    err.foreach(throw _)
    out.getOrElse(fail(s"pipe harness did not complete within ${maxMs}ms (deadlock)"))
  }

  private def records(n: Int, seqLen: Int = 120): Iterator[(String, String)] =
    (1 to n).iterator.map(i => (s"r$i", "ACGT" * (seqLen / 4)))

  test("slow consumer: child reads stdin at a trickle while parent has >64KB queued") {
    // The child sleeps before consuming ANY input; 2,000 × ~130-byte
    // records ≈ 260 KB of stdin must queue behind a full pipe. A
    // parent writing on the calling thread would block forever before
    // reaching its read loop.
    val cmd = script("""sleep 1; while read -r line; do case "$line" in ">"*) echo "${line#>}";; esac; done""")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val res = timed(30000)(PipeHarness.pipeFasta(cmd, records(2000), got += _))
    assert(res.exitCode === 0)
    assert(got.size === 2000)
    assert(got.head === "r1" && got.last === "r2000")
  }

  test("amplifying child: >64KB of stdout per input line while stdin still feeding") {
    // Each record triggers ~50 output lines; total stdout ≈ 100 KB × N.
    // If stdin were fed AFTER reading stdout (or vice versa on one
    // thread), both pipes fill and the pair deadlocks.
    val cmd = script(
      """while read -r line; do
        |  case "$line" in ">"*)
        |    for i in $(seq 1 50); do echo "${line#>}_hit$i"; done;;
        |  esac
        |done""".stripMargin)
    var n = 0
    val res = timed(30000)(PipeHarness.pipeFasta(cmd, records(200), _ => n += 1))
    assert(res.exitCode === 0)
    assert(n === 200 * 50)
  }

  test("chatty stderr: child logs >64KB to stderr — undrained, this deadlocks") {
    // ~200 bytes of stderr per record × 1,000 records ≈ 200 KB: a
    // parent that never reads stderr freezes the child mid-log. This
    // is the exact gap the r6 harness had (redirectErrorStream(false)
    // with no drain thread).
    val cmd = script(
      """while read -r line; do
        |  case "$line" in ">"*)
        |    echo "$line" | sed 's/>//' ;
        |    printf 'WARN %s: this aligner is extremely talkative and pads its logs with details %s\n' "$line" "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx" >&2 ;;
        |  esac
        |done
        |echo "done with all reads" >&2""".stripMargin)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val res = timed(30000)(PipeHarness.pipeFasta(cmd, records(1000), got += _))
    assert(res.exitCode === 0)
    assert(got.size === 1000)
    // tail retention: bounded, keeps the LAST lines
    assert(res.stderrTail.length <= 8192 + 200)
    assert(res.stderrTail.endsWith("done with all reads"))
    assert(res.stderrTail.contains("WARN"))
  }

  test("child dies mid-stream: writer leg ends quietly, exit code surfaces") {
    // Child exits 3 after consuming 10 lines; the writer thread's pipe
    // breaks (EPIPE) with thousands of records still queued. The
    // harness must not hang or throw from the writer — the caller sees
    // the exit code and stderr tail.
    val cmd = script(
      """n=0
        |while read -r line; do
        |  n=$((n+1))
        |  if [ $n -ge 10 ]; then echo "giving up" >&2; exit 3; fi
        |done""".stripMargin)
    val res = timed(30000)(PipeHarness.pipeFasta(cmd, records(5000), _ => ()))
    assert(res.exitCode === 3)
    assert(res.stderrTail.contains("giving up"))
  }

  test("empty input: zero records still runs the child to clean exit") {
    val cmd = script("""cat > /dev/null; echo ok""")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val res = timed(10000)(PipeHarness.pipeFasta(cmd, Iterator.empty, got += _))
    assert(res.exitCode === 0)
    assert(got.toSeq === Seq("ok"))
  }
}
