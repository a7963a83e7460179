package graft

import java.nio.file.{Files, Path, Paths}

/** Config resolution with the reference's priority chain
  * (Config/Resolver.py: Docker secrets > environment > defaults) —
  * secrets become a secrets directory (one file per key, as Docker mounts
  * them), environment stays environment, defaults are code. */
final case class GraftConfig(
    exportFolder: String,
    stateFile: String,
    knowledgeTag: String,
    endTag: String,
    chunkSize: Int,
    chunkOverlap: Int,
    threadMaxAgeDays: Int,
    knowledgeChannels: Seq[String] = Seq("test_knowledge"),
    enableEnrich: Boolean = false,
    storeProvider: String = "parquet",
    storeServer: String = "localhost",
    storePort: Int = 8080) {
  /** Schema.to_dict analog — the full resolved config as a flat map. */
  def toMap: Map[String, String] = Map(
    "exportFolder" -> exportFolder,
    "stateFile" -> stateFile,
    "knowledgeTag" -> knowledgeTag,
    "endTag" -> endTag,
    "chunkSize" -> chunkSize.toString,
    "chunkOverlap" -> chunkOverlap.toString,
    "threadMaxAgeDays" -> threadMaxAgeDays.toString,
    "knowledgeChannels" -> knowledgeChannels.mkString(","),
    "enableEnrich" -> enableEnrich.toString,
    "storeProvider" -> storeProvider,
    "storeServer" -> storeServer,
    "storePort" -> storePort.toString)
}

object GraftConfig {
  val defaults: Map[String, String] = Map(
    "GRAFT_EXPORT_FOLDER" -> "data/knowledge",
    "GRAFT_STATE_FILE" -> "data/state.json",
    "GRAFT_KNOWLEDGE_TAG" -> "#KNOWLEDGE",
    "GRAFT_END_TAG" -> "#END",
    "GRAFT_CHUNK_SIZE" -> "20",
    "GRAFT_CHUNK_OVERLAP" -> "5",
    "GRAFT_THREAD_MAX_AGE_DAYS" -> "7",
    "GRAFT_KNOWLEDGE_CHANNELS" -> "test_knowledge",
    // Schema.py's ENABLE_LLM / VECTOR_DB_{PROVIDER,SERVER,PORT} analogs —
    // deployment knobs for the store, typed and validated like the
    // reference's BotConfig fields (Config/Schema.py:9-36)
    "GRAFT_ENABLE_ENRICH" -> "false",
    "GRAFT_STORE_PROVIDER" -> "parquet",
    "GRAFT_STORE_SERVER" -> "localhost",
    "GRAFT_STORE_PORT" -> "8080")

  /** Providers the engine can actually serve (enum check, the
    * reference's provider-field analog). */
  val storeProviders: Set[String] = Set("parquet", "memory")

  /** Typed int parse with the offending key and value in the error —
    * Schema.py's `int(resolver.get(...))` with a diagnosable failure. */
  def parseInt(key: String, value: String): Int =
    try value.trim.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"config $key must be an integer, got '$value'") }

  /** Schema.py's truthy set, verbatim: lower(value) ∈ (true, 1, yes, on)
    * (Config/Schema.py:86). Anything else is false — matching the
    * reference, which never rejects a bool. */
  def parseBool(value: String): Boolean =
    Set("true", "1", "yes", "on")(value.trim.toLowerCase)

  /** Port-range check: TCP ports are 1–65535. */
  def parsePort(key: String, value: String): Int = {
    val p = parseInt(key, value)
    require(p >= 1 && p <= 65535,
      s"config $key must be a port in [1, 65535], got $p")
    p
  }

  /** Schema._parse_list analog: comma list, whitespace-tolerant, empties
    * dropped. */
  def parseList(value: String): Seq[String] =
    value.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** secretsDir > env > defaults, like the reference resolver. */
  def resolve(key: String,
      env: Map[String, String] = sys.env,
      secretsDir: Option[Path] = None): Option[String] = {
    val fromSecret = secretsDir.map(_.resolve(key.toLowerCase))
      .filter(Files.isReadable(_))
      .map(p => new String(Files.readAllBytes(p), "UTF-8").trim)
    fromSecret.orElse(env.get(key)).orElse(defaults.get(key))
  }

  def load(env: Map[String, String] = sys.env,
      secretsDir: Option[Path] = None): GraftConfig = {
    def get(k: String) = resolve(k, env, secretsDir).getOrElse(
      throw new IllegalArgumentException(s"missing config $k"))
    val cfg = GraftConfig(
      exportFolder = get("GRAFT_EXPORT_FOLDER"),
      stateFile = get("GRAFT_STATE_FILE"),
      knowledgeTag = get("GRAFT_KNOWLEDGE_TAG"),
      endTag = get("GRAFT_END_TAG"),
      chunkSize = parseInt("GRAFT_CHUNK_SIZE", get("GRAFT_CHUNK_SIZE")),
      chunkOverlap = parseInt("GRAFT_CHUNK_OVERLAP", get("GRAFT_CHUNK_OVERLAP")),
      threadMaxAgeDays =
        parseInt("GRAFT_THREAD_MAX_AGE_DAYS", get("GRAFT_THREAD_MAX_AGE_DAYS")),
      knowledgeChannels = parseList(get("GRAFT_KNOWLEDGE_CHANNELS")),
      enableEnrich = parseBool(get("GRAFT_ENABLE_ENRICH")),
      storeProvider = get("GRAFT_STORE_PROVIDER").trim.toLowerCase,
      storeServer = get("GRAFT_STORE_SERVER"),
      storePort = parsePort("GRAFT_STORE_PORT", get("GRAFT_STORE_PORT")))
    // field validation (the reference's typed dataclass contract):
    // range/order checks on the chunker geometry, non-empty tags that
    // must differ (a block can't open and close on the same marker),
    // enum check on the provider, at least one source channel
    require(cfg.chunkSize >= 1,
      s"config GRAFT_CHUNK_SIZE must be >= 1, got ${cfg.chunkSize}")
    require(cfg.chunkOverlap >= 0,
      s"config GRAFT_CHUNK_OVERLAP must be >= 0, got ${cfg.chunkOverlap}")
    require(cfg.chunkOverlap < cfg.chunkSize,
      "chunk overlap must be smaller than chunk size")
    require(cfg.threadMaxAgeDays >= 0,
      s"config GRAFT_THREAD_MAX_AGE_DAYS must be >= 0, got ${cfg.threadMaxAgeDays}")
    require(cfg.knowledgeTag.nonEmpty && cfg.endTag.nonEmpty,
      "knowledge/end tags must be non-empty")
    require(cfg.knowledgeTag != cfg.endTag,
      "knowledge tag and end tag must differ")
    require(storeProviders(cfg.storeProvider),
      s"config GRAFT_STORE_PROVIDER must be one of " +
        s"${storeProviders.toSeq.sorted.mkString(", ")}, got '${cfg.storeProvider}'")
    require(cfg.storeServer.trim.nonEmpty,
      "config GRAFT_STORE_SERVER must be non-empty")
    require(cfg.knowledgeChannels.nonEmpty,
      "config GRAFT_KNOWLEDGE_CHANNELS must name at least one channel")
    cfg
  }

  /** Incremental-run state (KnowledgeBot.load_bot_state/save_bot_state):
    * corrupt or missing state degrades to epoch 0, never fails. */
  def loadLastRun(stateFile: String): Long = {
    val p = Paths.get(stateFile)
    if (!Files.isReadable(p)) 0L
    else {
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      """"last_run_timestamp"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(0L)
    }
  }

  def saveLastRun(stateFile: String, epoch: Long): Unit = {
    val p = Paths.get(stateFile)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, s"""{"last_run_timestamp": $epoch}""".getBytes("UTF-8"))
  }
}
