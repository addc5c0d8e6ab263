package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.kernel.TextKernel

/** The repo-wide tokenizer as a CODEGEN'D column expression — the
  * exact `TextKernel.tokens` contract (lowercase, `WsPlus` whitespace
  * split, empties dropped) with no UDF barrier, so tokenization stays
  * inside whole-stage codegen on corpus-scan hot paths. Null text
  * yields a null array (downstream `explode` drops the row; `size`
  * returns -1) instead of the NPE a naive String-typed UDF throws.
  * One definition pins the contract for every consumer (LmScore,
  * Retrieval, CorpusStats) AND for the DuckDB oracles' mirrored
  * `string_split_regex(lower(text), '[WsChars]+')`.
  */
object TextCols {
  def toks(text: Column): Column =
    filter(split(lower(text), TextKernel.WsPlus), t => t =!= "")
}
