package graft.operators

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KnowledgeBot-core operators (SURVEY §2 A1–A11).
  *
  * The reference extracts `#KNOWLEDGE … #END` blocks from Slack messages,
  * enriches them with channel/user metadata and LLM keywords/summaries,
  * and renders header+body export files (KnowledgeBot.py:425-527,
  * 382-422). Here the same semantics run as declarative Spark plans over
  * the events/documents/customer/nation tables. The test corpus has no
  * literal `#KNOWLEDGE` markers, so queries synthesize tagged messages
  * from table columns deterministically — the DuckDB oracle synthesizes
  * the identical strings, so extraction logic is exercised end-to-end.
  */
object Knowledge {

  /** Message text synthesized from a document row: two tagged blocks. */
  private def docMsg: Column =
    concat(lit("#KNOWLEDGE "), col("text"),
      lit(" #END untagged chatter #KNOWLEDGE src="), col("source"), lit(" #END"))

  private val docMsgSql =
    "'#KNOWLEDGE ' || text || ' #END untagged chatter #KNOWLEDGE src=' || source || ' #END'"

  /** A1: block extraction with per-message ordinal (KnowledgeBot.py:497). */
  def kbBlocks(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(Text.knowledgeBlocks(docMsg)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("ordinal"),
        trim(col("col")).as("block"))
      .orderBy("doc_id", "ordinal")
  }

  val kbBlocksSql: String = s"""
    SELECT doc_id, generate_subscripts(blocks, 1) AS ordinal,
           trim(unnest(blocks)) AS block
    FROM (SELECT doc_id,
            regexp_extract_all($docMsgSql, '#KNOWLEDGE(.*?)#END', 1) AS blocks
          FROM documents)
    ORDER BY doc_id, ordinal"""

  /** A2: `<@U…>` mention extraction + resolution against the user dim
    * (KnowledgeBot.py:317-330). Mentions are synthesized from event rows;
    * the dim join is a broadcast. */
  def kbMentions(s: SparkSession, dir: String): DataFrame = {
    val msg = concat(lit("ping <@U"), col("user_id"),
      lit("> and <@U"), col("user_id") + 50, lit("> re "), col("event_type"))
    val mentions = Tables.events(s, dir)
      .select(col("event_id"), posexplode(Text.mentionIds(msg)))
      .select(col("event_id"), (col("pos") + 1).cast("long").as("mention_pos"),
        col("col").as("mention_id"))
    val users = Tables.customer(s, dir).select("c_custkey", "c_name")
    mentions.join(broadcast(users), mentions("mention_id") + 1 === users("c_custkey"))
      .select(col("event_id"), col("mention_pos"), col("c_name").as("mention_name"))
      .orderBy("event_id", "mention_pos")
  }

  val kbMentionsSql: String = """
    WITH m AS (
      SELECT event_id, generate_subscripts(ids, 1) AS mention_pos,
             CAST(unnest(ids) AS BIGINT) AS mention_id
      FROM (SELECT event_id,
              regexp_extract_all('ping <@U' || user_id || '> and <@U' || (user_id + 50) || '> re ' || event_type,
                                 '<@U(\d+)>', 1) AS ids
            FROM events))
    SELECT event_id, mention_pos, c_name AS mention_name
    FROM m JOIN customer ON mention_id + 1 = c_custkey
    ORDER BY event_id, mention_pos"""

  /** A3: incremental watermark filter with thread-age look-back
    * (KnowledgeBot.py:446-453): last_run − max_age_days, prunable at the
    * scan. Aggregated so the check is compact. */
  def kbIncremental(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .filter(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp") - expr("INTERVAL 7 DAYS"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_new"),
        min(unix_timestamp(col("ts"))).as("min_epoch"),
        max(unix_timestamp(col("ts"))).as("max_epoch"))
      .orderBy("event_type")
  }

  val kbIncrementalSql: String = """
    SELECT event_type, COUNT(*) AS n_new,
      MIN(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS min_epoch,
      MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS max_epoch
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 7 DAY
    GROUP BY event_type ORDER BY event_type"""

  /** A4: keep-latest-version-per-key — the #EDIT delete+re-export
    * semantics (KnowledgeBot.py:351-379) as one ranking window. */
  def kbEditLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("epoch"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("latest_event_id"), col("epoch").as("latest_epoch"))
      .orderBy("user_id", "event_type")
  }

  val kbEditLatestSql: String = """
    SELECT user_id, event_type, event_id AS latest_event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS latest_epoch
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rk
          FROM events)
    WHERE rk = 1 ORDER BY user_id, event_type"""

  /** A5: channel-metadata enrichment — member roster per channel
    * (KnowledgeBot.py:333-348). nation = channel dim, customer = members. */
  def kbEnrich(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    Tables.customer(s, dir).select("c_nationkey", "c_name")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("channel"))
      .agg(array_join(array_sort(collect_set(col("c_name"))), ", ").as("members"),
        countDistinct(col("c_name")).as("member_count"))
      .orderBy("channel")
  }

  val kbEnrichSql: String = """
    SELECT n_name AS channel,
           string_agg(DISTINCT c_name, ', ' ORDER BY c_name) AS members,
           COUNT(DISTINCT c_name) AS member_count
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY channel"""

  /** A6: deterministic top-5 TF keywords per document — the engine-side
    * analog of LLMService.get_keywords (ties broken alphabetically). */
  def kbKeywords(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .filter(!Text.isStopword(col("token")))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("token"))
    tf.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rk"), col("token")))),
          x => x.getField("token")), " ").as("keywords"))
      .orderBy("doc_id")
  }

  val kbKeywordsSql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        x -> len(x) > 0 AND x NOT IN ${Text.stopwordsSql})) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token),
    ranked AS (
      SELECT doc_id, token,
        row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, token) AS rk
      FROM tf)
    SELECT doc_id, string_agg(token, ' ' ORDER BY rk) AS keywords
    FROM ranked WHERE rk <= 5 GROUP BY doc_id ORDER BY doc_id"""

  /** A7: ≤25-word deterministic summary (LLMService.get_summary contract). */
  def kbSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.leadingWords(col("text"), 25).as("summary"),
        size(Text.tokens(col("text"))).cast("long").as("n_words"))
      .orderBy("doc_id")
  }

  val kbSummarySql: String = """
    SELECT doc_id, array_to_string(string_split(text, ' ')[1:25], ' ') AS summary,
           len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_words
    FROM documents ORDER BY doc_id"""

  /** A8: export filename scheme `<channel>_YYYYMMDD_<ts-with-underscore>_NN`
    * (KnowledgeBot.py:382-403); event_type plays the channel. */
  def kbFilename(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), date_format(col("ts"), "yyyyMMdd"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("ts"),
        expr("unix_micros(ts) div 1000000").as("sec"),
        expr("unix_micros(ts) % 1000000").as("frac"))
      .withColumn("rk", row_number().over(w))
      .select(col("event_id"),
        concat(col("event_type"), lit("_"), date_format(col("ts"), "yyyyMMdd"),
          lit("_"), col("sec"), lit("_"), lpad(col("frac"), 6, "0"),
          lit("_"), lpad(col("rk"), 2, "0"), lit(".txt")).as("fname"))
      .orderBy("event_id")
  }

  val kbFilenameSql: String = """
    SELECT event_id,
      event_type || '_' || strftime(ts, '%Y%m%d') || '_' ||
      (epoch_us(ts) // 1000000) || '_' ||
      lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || '_' ||
      lpad(CAST(row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y%m%d')
                                   ORDER BY ts, event_id) AS VARCHAR), 2, '0')
      || '.txt' AS fname
    FROM events ORDER BY event_id"""

  /** A9: header/body parse — `Key: value` lines, `---` separator
    * (TextProcessor.py:21-31). Raw files synthesized from documents. */
  def kbParse(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("Channel Name: "), col("source"), lit("\n"),
      lit("Message Author: user"), col("doc_id") % 50, lit("\n\n---\n\n"),
      col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), split(raw, "---", 2).as("parts"))
      .select(col("doc_id"),
        explode(filter(split(element_at(col("parts"), 1), "\n"),
          l => l.contains(":"))).as("line"),
        length(trim(element_at(col("parts"), 2))).cast("long").as("body_len"))
      .select(col("doc_id"),
        trim(element_at(split(col("line"), ":", 2), 1)).as("key"),
        trim(element_at(split(col("line"), ":", 2), 2)).as("value"),
        col("body_len"))
      .orderBy("doc_id", "key")
  }

  val kbParseSql: String = """
    WITH raw AS (
      SELECT doc_id,
        'Channel Name: ' || source || chr(10) || 'Message Author: user' ||
        (doc_id % 50) || chr(10) || chr(10) || '---' || chr(10) || chr(10) || text AS raw
      FROM documents),
    parts AS (
      -- limit-2 split semantics (matches Spark's split(raw,'---',2)): the
      -- body is the FULL remainder after the first '---', so a body that
      -- itself contains '---' parses identically in both engines
      SELECT doc_id, split_part(raw, '---', 1) AS header,
             length(trim(substr(raw, position('---' IN raw) + 3))) AS body_len
      FROM raw),
    lines AS (
      SELECT doc_id, body_len,
        unnest(list_filter(string_split(header, chr(10)), l -> contains(l, ':'))) AS line
      FROM parts)
    SELECT doc_id, trim(split_part(line, ':', 1)) AS key,
           trim(substr(line, position(':' IN line) + 1)) AS value, body_len
    FROM lines ORDER BY doc_id, key"""

  /** A10: token-window chunking, size 20 / overlap 5
    * (TextProcessor.py:34-48) — pure narrow transform, zero shuffle. */
  def kbChunks(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(Text.chunks(col("text"), 20, 5)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_ix"),
        col("col").as("chunk"))
      .orderBy("doc_id", "chunk_ix")
  }

  val kbChunksSql: String = """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
      FROM documents)
    SELECT doc_id, (start // 15) + 1 AS chunk_ix,
           array_to_string(toks[start + 1:start + 20], ' ') AS chunk
    FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, 15)) AS start
          FROM t)
    ORDER BY doc_id, chunk_ix"""

  /** A11: flagship end-to-end ingest — extract blocks, enrich with
    * doc-level keywords, render filename + export header
    * (KnowledgeBot.process_channel composed as one declarative plan). */
  def kbPipeline(s: SparkSession, dir: String): DataFrame = {
    val blocks = kbBlocks(s, dir)
    val keywords = kbKeywords(s, dir).withColumnRenamed("doc_id", "kw_doc_id")
    val docs = Tables.documents(s, dir).select("doc_id", "source", "lang")
    blocks
      .join(docs, "doc_id")
      .join(keywords, col("doc_id") === col("kw_doc_id"))
      .select(col("doc_id"), col("ordinal"),
        concat(col("source"), lit("_20240115_"), col("doc_id"), lit("_"),
          lpad(col("ordinal"), 2, "0"), lit(".txt")).as("fname"),
        Text.leadingWords(col("block"), 10).as("block_summary"),
        concat(lit("Channel Name: "), col("source"), lit("\n"),
          lit("Language: "), col("lang"), lit("\n"),
          lit("Keywords: "), col("keywords"), lit("\n\n---\n\n"),
          col("block")).as("rendered"))
      .orderBy("doc_id", "ordinal")
  }

  val kbPipelineSql: String = s"""
    WITH blocks AS (
      SELECT doc_id, generate_subscripts(blocks, 1) AS ordinal,
             trim(unnest(blocks)) AS block
      FROM (SELECT doc_id,
              regexp_extract_all($docMsgSql, '#KNOWLEDGE(.*?)#END', 1) AS blocks
            FROM documents)),
    tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        x -> len(x) > 0 AND x NOT IN ${Text.stopwordsSql})) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token),
    ranked AS (
      SELECT doc_id, token,
        row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, token) AS rk
      FROM tf),
    kw AS (SELECT doc_id, string_agg(token, ' ' ORDER BY rk) AS keywords
           FROM ranked WHERE rk <= 5 GROUP BY doc_id)
    SELECT b.doc_id, b.ordinal,
      d.source || '_20240115_' || b.doc_id || '_' ||
        lpad(CAST(b.ordinal AS VARCHAR), 2, '0') || '.txt' AS fname,
      array_to_string(string_split(b.block, ' ')[1:10], ' ') AS block_summary,
      'Channel Name: ' || d.source || chr(10) || 'Language: ' || d.lang || chr(10)
        || 'Keywords: ' || k.keywords || chr(10) || chr(10) || '---'
        || chr(10) || chr(10) || b.block AS rendered
    FROM blocks b
    JOIN documents d ON b.doc_id = d.doc_id
    JOIN kw k ON b.doc_id = k.doc_id
    ORDER BY b.doc_id, b.ordinal"""

  /** A14: #EDIT thread resolution (KnowledgeBot.py:571-612
    * _handle_edit_flags): an #EDIT tag counts only in a genuine thread
    * REPLY (thread root ≠ itself); each resolves to its parent message,
    * which is reprocessed once no matter how many replies flagged it.
    * Threads are synthesized from events: root id = event_id rounded to
    * 10, replies are the rest; #EDIT appears when event_id % 7 == 0. The
    * parent lookup is an equi-join on the root id; output is the distinct
    * parent set with its edit-request count. */
  def kbEditResolve(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
      concat(when(pmod(col("event_id"), lit(7)) === 0, lit("#EDIT please "))
        .otherwise(lit("note ")), col("event_type")).as("text"),
      (col("event_id") - pmod(col("event_id"), lit(10))).as("thread_ts"))
    val edits = ev
      .filter(col("text").contains("#EDIT") && col("thread_ts") =!= col("event_id"))
      .select(col("thread_ts").as("parent_id"), col("event_id").as("edit_id"))
    val parents = ev.select(col("event_id").as("parent_id"),
      col("user_id").as("parent_user"))
    edits.join(parents, "parent_id")
      .groupBy("parent_id", "parent_user")
      .agg(count(lit(1)).as("n_edit_requests"), min("edit_id").as("first_edit_id"))
      .orderBy("parent_id")
  }

  val kbEditResolveSql: String = """
    WITH ev AS (
      SELECT event_id, user_id,
        (CASE WHEN event_id % 7 = 0 THEN '#EDIT please ' ELSE 'note ' END)
          || event_type AS text,
        event_id - (event_id % 10) AS thread_ts
      FROM events),
    edits AS (
      SELECT thread_ts AS parent_id, event_id AS edit_id
      FROM ev WHERE contains(text, '#EDIT') AND thread_ts <> event_id)
    SELECT e.parent_id, p.user_id AS parent_user,
           COUNT(*) AS n_edit_requests, MIN(e.edit_id) AS first_edit_id
    FROM edits e JOIN ev p ON e.parent_id = p.event_id
    GROUP BY e.parent_id, p.user_id
    ORDER BY e.parent_id"""

  /** A12: metadata field-name normalization (TextProcessor.py:51-59
    * map_field_name/process_meta): header keys are made GraphQL-safe by
    * collapsing whitespace runs to `_`. Reuses the A9 header synthesis —
    * pure narrow transform, zero shuffle. */
  def kbMetaNorm(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("Channel Name: "), col("source"), lit("\n"),
      lit("Message Author: user"), col("doc_id") % 50, lit("\n"),
      lit("Thread  Reply Count: "), col("doc_id") % 7, lit("\n\n---\n\n"),
      col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(filter(split(element_at(split(raw, "---", 2), 1), "\n"),
          l => l.contains(":"))).as("line"))
      .select(col("doc_id"),
        regexp_replace(trim(element_at(split(col("line"), ":", 2), 1)),
          "\\s+", "_").as("field"),
        trim(element_at(split(col("line"), ":", 2), 2)).as("value"))
      .orderBy("doc_id", "field")
  }

  val kbMetaNormSql: String = """
    WITH raw AS (
      SELECT doc_id,
        'Channel Name: ' || source || chr(10) || 'Message Author: user' ||
        (doc_id % 50) || chr(10) || 'Thread  Reply Count: ' || (doc_id % 7) ||
        chr(10) || chr(10) || '---' || chr(10) || chr(10) || text AS raw
      FROM documents),
    lines AS (
      SELECT doc_id,
        unnest(list_filter(string_split(split_part(raw, '---', 1), chr(10)),
                           l -> contains(l, ':'))) AS line
      FROM raw)
    SELECT doc_id,
           regexp_replace(trim(split_part(line, ':', 1)), '\s+', '_', 'g') AS field,
           trim(substr(line, position(':' IN line) + 1)) AS value
    FROM lines ORDER BY doc_id, field"""

  /** A13: deterministic prompt rendering (PromptTemplates.py:4-22) — the
    * exact keyword/summary prompt strings the reference sends to the LLM,
    * rendered per document as a narrow column expression. Two rows per
    * doc (kind ∈ {keywords, summary}). */
  def kbPrompts(s: SparkSession, dir: String): DataFrame = {
    val kwPrompt = concat(
      lit("Extract up to 10 concise, relevant semantic keywords or short keyphrases from the text below.\n" +
        "Order them with the most relevant first.\n" +
        "Return only a JSON list of strings. No formatting. No commentary. No numbering.\n\n" +
        "Text:\n\"\"\""), col("text"), lit("\"\"\""))
    val smPrompt = concat(
      lit("You must summarise the following text in exactly one sentence of no more than 25 words.\n" +
        "Do not write multiple sentences.\n" +
        "Use passive voice.\n" +
        "Exclude all opinions, reasoning, commentary, or extra phrasing.\n" +
        "Output only the sentence. Nothing else. No titles. No formatting. No quotes.\n" +
        "Ensure the sentence ends with a full stop.\n\n" +
        "Text:\n\"\"\""), col("text"), lit("\"\"\""))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(array(
        struct(lit("keywords").as("kind"), kwPrompt.as("prompt")),
        struct(lit("summary").as("kind"), smPrompt.as("prompt")))).as("p"))
      .select(col("doc_id"), col("p.kind").as("kind"),
        col("p.prompt").as("prompt"),
        length(col("p.prompt")).cast("long").as("prompt_len"))
      .orderBy("doc_id", "kind")
  }

  // `tq` = the literal three-double-quote fence around the text in both
  // templates (built from chr(34) so it survives Scala triple-quoting)
  val kbPromptsSql: String = """
    WITH p AS (
      SELECT doc_id, 'keywords' AS kind,
        'Extract up to 10 concise, relevant semantic keywords or short keyphrases from the text below.'
        || chr(10) || 'Order them with the most relevant first.' || chr(10) ||
        'Return only a JSON list of strings. No formatting. No commentary. No numbering.'
        || chr(10) || chr(10) || 'Text:' || chr(10) || repeat(chr(34), 3) || text || repeat(chr(34), 3) AS prompt
      FROM documents
      UNION ALL
      SELECT doc_id, 'summary' AS kind,
        'You must summarise the following text in exactly one sentence of no more than 25 words.'
        || chr(10) || 'Do not write multiple sentences.' || chr(10) ||
        'Use passive voice.' || chr(10) ||
        'Exclude all opinions, reasoning, commentary, or extra phrasing.' || chr(10) ||
        'Output only the sentence. Nothing else. No titles. No formatting. No quotes.'
        || chr(10) || 'Ensure the sentence ends with a full stop.'
        || chr(10) || chr(10) || 'Text:' || chr(10) || repeat(chr(34), 3) || text || repeat(chr(34), 3) AS prompt
      FROM documents)
    SELECT doc_id, kind, prompt, length(prompt) AS prompt_len
    FROM p ORDER BY doc_id, kind"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kb_blocks"      -> (kbBlocks _),
    "kb_mentions"    -> (kbMentions _),
    "kb_incremental" -> (kbIncremental _),
    "kb_edit_latest" -> (kbEditLatest _),
    "kb_enrich"      -> (kbEnrich _),
    "kb_keywords"    -> (kbKeywords _),
    "kb_summary"     -> (kbSummary _),
    "kb_filename"    -> (kbFilename _),
    "kb_parse"       -> (kbParse _),
    "kb_chunks"      -> (kbChunks _),
    "kb_meta_norm"   -> (kbMetaNorm _),
    "kb_prompts"     -> (kbPrompts _),
    "kb_edit_resolve" -> (kbEditResolve _),
    "kb_pipeline"    -> (kbPipeline _))

  val oracle: Map[String, String] = Map(
    "kb_blocks"      -> kbBlocksSql,
    "kb_mentions"    -> kbMentionsSql,
    "kb_incremental" -> kbIncrementalSql,
    "kb_edit_latest" -> kbEditLatestSql,
    "kb_enrich"      -> kbEnrichSql,
    "kb_keywords"    -> kbKeywordsSql,
    "kb_summary"     -> kbSummarySql,
    "kb_filename"    -> kbFilenameSql,
    "kb_parse"       -> kbParseSql,
    "kb_chunks"      -> kbChunksSql,
    "kb_meta_norm"   -> kbMetaNormSql,
    "kb_prompts"     -> kbPromptsSql,
    "kb_edit_resolve" -> kbEditResolveSql,
    "kb_pipeline"    -> kbPipelineSql)
}
