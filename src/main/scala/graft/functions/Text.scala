package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the knowledge and text-analysis operators.
  *
  * Everything is a Column-expression composition (narrow, per-row, no
  * shuffle, no UDF) and has an exact DuckDB-SQL counterpart so oracle
  * results hash-match. Tokenization convention: split on single space,
  * drop empties — mirrors `string_split(text, ' ')` + filter.
  */
object Text {
  /** Non-empty space-separated tokens. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Reference chunker semantics (TextProcessor.py:34-48): slide a
    * `size`-token window advancing by `size - overlap`; emit every window
    * whose start is inside the token array. Returns array<string> of
    * chunk texts, in order. Fused single-pass codegen kernel
    * ([[graft.plans.Chunks]]) — the composed HOF form below is kept only
    * as the property-spec reference. */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    val step = size - overlap
    require(step > 0, "overlap must be < chunk size")
    call_function("graft_chunks", text, lit(size), lit(step))
  }

  /** The pre-kernel composed form of [[chunks]] (transform + sequence +
    * slice + array_join over a pre-tokenized column). CodegenFallback —
    * kept solely as the differential reference for KernelPropertySpec. */
  def chunksComposed(toks: Column, size: Int, overlap: Int): Column = {
    val step = size - overlap
    require(step > 0, "overlap must be < chunk size")
    val nToks = org.apache.spark.sql.functions.size(toks)
    // empty token array → empty chunk array (sequence(0, -1) would throw);
    // matches the reference while-loop, which never enters for empty input
    when(nToks > 0,
      transform(
        sequence(lit(0), nToks - 1, lit(step)),
        start => array_join(slice(toks, start + 1, lit(size)), " ")))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
  }

  /** Extract `#KNOWLEDGE ... #END` block bodies (KnowledgeBot.py:497). */
  def knowledgeBlocks(c: Column): Column =
    regexp_extract_all(c, lit("#KNOWLEDGE(.*?)#END"), lit(1))

  /** Extract numeric ids from `<@U123>`-style mentions (KnowledgeBot.py:327). */
  def mentionIds(c: Column): Column =
    transform(regexp_extract_all(c, lit("<@U(\\d+)>"), lit(1)), _.cast("long"))

  /** First `n` tokens re-joined — the deterministic "summary" analog of
    * LLMService.get_summary's ≤25-word contract. */
  def leadingWords(c: Column, n: Int): Column =
    array_join(slice(split(c, " "), 1, n), " ")

  /** English-ish stopword list used by keywords/quality scoring. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def isStopword(t: Column): Column = t.isInCollection(stopwords)

  /** SQL literal list for the DuckDB oracle: `('the', 'a', ...)`. */
  val stopwordsSql: String = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
}
