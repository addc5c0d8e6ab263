package graft.ops

import graft.kernel.TextKernel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the published BPE recipe
  * (iteratively merge the most frequent adjacent symbol pair) run in
  * its distributed form: all corpus-sized work happens ONCE (the word
  * count), every merge iteration runs over the vocabulary-sized
  * (word, freq) table only, and the driver holds nothing bigger than
  * the merge list itself. Part of the LLM-pipeline extension surface
  * (the reference engine ships no tokenizer trainer).
  *
  * Determinism contract: the merge chosen each round is the pair with
  * the highest frequency, ties broken by (left symbol, right symbol)
  * byte order — a total order, so training is reproducible bit-for-bit
  * regardless of partitioning. Words are split into Unicode CODE
  * POINTS (not UTF-16 units), matching codepoint-indexed substr
  * semantics in SQL engines.
  *
  * Scale shape: wordCounts is one map-side-combined aggregate (output
  * = |vocab| rows, however big the corpus). Each of the M iterations
  * is one aggregate over the vocab table (pair counts, output ≤
  * |pairs| rows) plus a 1-row deterministic top-1 collect and a
  * map-only re-symbolization; the vocab table is cached and replaced
  * per iteration, so lineage stays one step deep. Applying a trained
  * merge table ([[encode]]) is map-only with the M-row merge list
  * broadcast.
  */
object BpeTrainer {

  /** Split into Unicode code points. */
  private[ops] def symbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** (word, freq) over the tokenizer's standard token stream. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(udf((t: String) =>
        if (t == null) Array.empty[String] else TextKernel.tokens(t))
        .apply(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** (syms, freq): the symbolized initial vocabulary — one row per
    * distinct word, symbols = code points.
    */
  def initialVocab(docs: DataFrame, textCol: String): DataFrame = {
    val symsUdf = udf((w: String) => symbols(w))
    wordCounts(docs, textCol)
      .select(symsUdf(col("word")).as("syms"), col("freq"))
  }

  /** Adjacent-symbol pair counts over a symbolized vocabulary
    * (syms: array of current symbols, freq: word frequency) — the
    * kernel of one training iteration, exposed for the oracle row.
    * Output: (a, b, cnt) where cnt counts occurrences weighted by word
    * frequency (a word containing the pair k times contributes
    * k · freq).
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val pairsUdf = udf((syms: Seq[String]) =>
      if (syms == null || syms.length < 2) Array.empty[(String, String)]
      else syms.iterator.zip(syms.iterator.drop(1)).toArray)
    vocab.select(explode(pairsUdf(col("syms"))).as("p"), col("freq"))
      .groupBy(col("p._1").as("a"), col("p._2").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Left-to-right, non-overlapping merge of every (a, b) occurrence —
    * the standard BPE application order ("aaa" with merge (a,a) →
    * ["aa", "a"]).
    */
  private[ops] def applyMerge(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` merges over the corpus. Returns the ordered
    * merge list. Stops early if no adjacent pair remains.
    *
    * Each iteration TRUNCATES lineage with an eager `localCheckpoint`
    * rather than `cache()`: a cached plan still nests the previous
    * iteration's full plan inside its `InMemoryRelation` argString, so
    * plan *text* (built by Spark for the SQL tab / error rendering)
    * grows geometrically with iterations — measured as a driver OOM in
    * `QueryExecution.explainString` at merge ~18 on a 500k-doc corpus.
    * `localCheckpoint` replaces the logical plan with a constant-size
    * `LogicalRDD`, making per-iteration plan cost flat. The vocab table
    * is |distinct words| rows (≪ corpus), so executor-local checkpoint
    * storage is cheap; on a real cluster executor loss just re-fails
    * the training job, which is acceptable for an offline trainer.
    */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = initialVocab(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)].collect()
      top.headOption match {
        case None => done = true
        case Some((a, b, _)) =>
          merges += ((a, b))
          val mergeUdf = udf((syms: Seq[String]) => applyMerge(syms, a, b))
          val next = vocab.select(mergeUdf(col("syms")).as("syms"),
            col("freq")).localCheckpoint(true)
          vocab.unpersist()
          vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Per-document BPE token counts via the vocabulary, not the corpus:
    * the merge loop runs ONCE per distinct word (|vocab| rows, ≪
    * corpus), and documents get their counts back through a broadcast
    * join on the word — the only corpus-sized passes are the tokenize
    * explode and the final doc-keyed sum. This is the shape a 100 TB
    * tokenize-and-pack job must use: re-encoding every occurrence
    * (as [[encode]] does per row) multiplies the merge-loop cost by
    * corpus/vocab, which is ~10^4 on real text. Output: (doc_id,
    * n_bpe) with n_bpe = 0 for empty/NULL docs.
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val nSymsUdf = udf((w: String) => {
      var syms: Seq[String] = symbols(w).toSeq
      for ((a, b) <- merges) syms = applyMerge(syms, a, b)
      syms.length.toLong
    })
    val docWords = docs.select(col(idCol).as("doc_id"),
        explode(udf((t: String) =>
          if (t == null) Array.empty[String] else TextKernel.tokens(t))
          .apply(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val encodedVocab = docWords.select(col("word")).distinct()
      .select(col("word"), nSymsUdf(col("word")).as("n_syms"))
    val counted = docWords.join(broadcast(encodedVocab), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("n_syms")).as("n_bpe"))
    // Re-attach zero-token documents (no words ⇒ absent from the
    // explode) so the output covers every input id.
    docs.select(col(idCol).as("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** Tokenize documents with a trained merge list (applied in training
    * order, the standard BPE encode): (doc_id, bpe_tokens, n_bpe).
    * The merge table is driver-bounded by construction (M entries) and
    * ships inside the UDF closure — map-only, no shuffle.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val encodeUdf = udf((t: String) => {
      if (t == null) Array.empty[String]
      else TextKernel.tokens(t).flatMap { w =>
        var syms: Seq[String] = symbols(w).toSeq
        for ((a, b) <- merges) syms = applyMerge(syms, a, b)
        syms
      }
    })
    docs.select(col(idCol).as("doc_id"),
        encodeUdf(col(textCol)).as("bpe_tokens"))
      .select(col("doc_id"), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("n_bpe"))
  }
}
