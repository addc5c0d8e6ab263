package graft.kernel

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** FASTA/FASTQ codec — no Spark dependencies.
  *
  * Semantics ported from the reference's kseq++-based reader
  * (reference: src/read_fastx.cpp:1-271, src/SequenceReader.cpp:1-178):
  * FASTA headers `>` with multi-line sequences (qual NULL), FASTQ `@`
  * 4-line records with Phred+offset qual decode, read_id = header up
  * to first whitespace with the remainder as `comment` (NULL when
  * absent), paired-end R1/R2 matched by position with an ID sanity
  * check (strip `/1`,`/2` suffixes), FASTA/FASTQ mix across a pair is
  * an error, gzip by magic-byte sniff (kseq++ behavior: a gzipped
  * stream is decompressed whatever the path says — this is what makes
  * `cat x.fq.gz | … read_fastx('-')` work, where the snapshot path has
  * no .gz extension).
  */
object FastxCodec {

  final case class FastxRecord(
      readId: String,
      comment: Option[String],
      sequence: String,
      qual: Option[Array[Short]])

  final class FastxParseException(msg: String) extends IllegalArgumentException(msg)

  def open(path: String, in: InputStream): BufferedReader = {
    // Sniff the 2-byte gzip magic instead of trusting the extension —
    // text formats can never start with 0x1f 0x8b, so this is safe and
    // covers gzipped bytes arriving via stdin. GZIPInputStream handles
    // concatenated members (incl. BGZF blocks).
    val buf = new java.io.BufferedInputStream(in)
    buf.mark(2)
    val b0 = buf.read(); val b1 = buf.read()
    buf.reset()
    val stream =
      if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(buf) else buf
    new BufferedReader(new InputStreamReader(stream, StandardCharsets.UTF_8))
  }

  /** Streaming parser over one FASTA or FASTQ file. */
  final class RecordIterator(reader: BufferedReader, qualOffset: Int)
      extends Iterator[FastxRecord] {
    private var pushback: String = null
    private var nextRec: FastxRecord = null
    private var finished = false
    /** Format is locked by the first record: Some(true)=FASTQ. */
    private var isFastq: Option[Boolean] = None

    private def readLine(): String =
      if (pushback != null) { val l = pushback; pushback = null; l }
      else reader.readLine()

    private def splitHeader(h: String): (String, Option[String]) = {
      val sp = h.indexWhere(Character.isWhitespace)
      if (sp < 0) (h, None)
      else (h.substring(0, sp), Some(h.substring(sp + 1)))
    }

    private def advance(): Unit = {
      if (finished) return
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { finished = true; return }
      if (line.startsWith("@")) {
        if (isFastq.contains(false))
          throw new FastxParseException("FASTA/FASTQ mix within one file")
        isFastq = Some(true)
        val (id, comment) = splitHeader(line.substring(1))
        val seq = readLine()
        val plus = readLine()
        val qual = readLine()
        if (seq == null || plus == null || qual == null || !plus.startsWith("+"))
          throw new FastxParseException(s"Truncated FASTQ record: $id")
        if (qual.length != seq.length)
          throw new FastxParseException(s"Qual length != seq length for: $id")
        nextRec = FastxRecord(id, comment, seq,
          Some(qual.map(c => (c - qualOffset).toShort).toArray))
      } else if (line.startsWith(">")) {
        if (isFastq.contains(true))
          throw new FastxParseException("FASTA/FASTQ mix within one file")
        isFastq = Some(false)
        val (id, comment) = splitHeader(line.substring(1))
        val sb = new StringBuilder
        var l = readLine()
        while (l != null && !l.startsWith(">") && !l.startsWith("@")) {
          sb.append(l.trim)
          l = readLine()
        }
        pushback = l
        nextRec = FastxRecord(id, comment, sb.toString, None)
      } else {
        throw new FastxParseException(s"Unexpected line: ${line.take(40)}")
      }
    }

    def hasNext: Boolean = {
      if (nextRec == null && !finished) advance()
      nextRec != null
    }

    def next(): FastxRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }

    def fastq: Boolean = isFastq.getOrElse(false)
  }

  /** Strip a trailing /1 or /2 pair suffix (reference
    * SequenceReader.cpp:6-35 id sanity check).
    */
  def stripPairSuffix(id: String): String =
    if (id.length > 2 && id.charAt(id.length - 2) == '/'
      && (id.last == '1' || id.last == '2')) id.substring(0, id.length - 2)
    else id

  /** Zip R1/R2 iterators into paired records; IDs must match after
    * suffix-stripping, formats must agree, lengths must agree.
    */
  def paired(
      r1: RecordIterator,
      r2: RecordIterator): Iterator[(FastxRecord, FastxRecord)] =
    new Iterator[(FastxRecord, FastxRecord)] {
      def hasNext: Boolean = {
        val (h1, h2) = (r1.hasNext, r2.hasNext)
        if (h1 != h2)
          throw new FastxParseException("Paired files have different record counts")
        h1
      }
      def next(): (FastxRecord, FastxRecord) = {
        val (a, b) = (r1.next(), r2.next())
        if (stripPairSuffix(a.readId) != stripPairSuffix(b.readId))
          throw new FastxParseException(
            s"Paired read ids do not match: ${a.readId} vs ${b.readId}")
        if (r1.fastq != r2.fastq)
          throw new FastxParseException("FASTA/FASTQ mix across R1/R2")
        (a, b)
      }
    }

  /** Serialize to FASTQ (4-line) with the given Phred offset. */
  def toFastq(r: FastxRecord, qualOffset: Int, includeComment: Boolean): String = {
    val header = r.readId + (if (includeComment) r.comment.map(" " + _).getOrElse("") else "")
    val qual = r.qual
      .map(_.map(q => (q + qualOffset).toChar).mkString)
      .getOrElse(throw new FastxParseException(s"FASTQ output requires qual: ${r.readId}"))
    if (qual.length != r.sequence.length)
      throw new FastxParseException(s"Qual length != seq length for: ${r.readId}")
    s"@$header\n${r.sequence}\n+\n$qual"
  }

  /** Serialize to FASTA (2-line). */
  def toFasta(r: FastxRecord, includeComment: Boolean): String = {
    val header = r.readId + (if (includeComment) r.comment.map(" " + _).getOrElse("") else "")
    s">$header\n${r.sequence}"
  }
}
