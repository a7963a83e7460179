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
    knowledgeChannels: Seq[String] = Seq("test_knowledge")) {
  /** Schema.to_dict analog — the full resolved config as a flat map. */
  def toMap: Map[String, String] = Map(
    "exportFolder" -> exportFolder,
    "stateFile" -> stateFile,
    "knowledgeTag" -> knowledgeTag,
    "endTag" -> endTag,
    "chunkSize" -> chunkSize.toString,
    "chunkOverlap" -> chunkOverlap.toString,
    "threadMaxAgeDays" -> threadMaxAgeDays.toString,
    "knowledgeChannels" -> knowledgeChannels.mkString(","))
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
    "GRAFT_KNOWLEDGE_CHANNELS" -> "test_knowledge")

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
      chunkSize = get("GRAFT_CHUNK_SIZE").toInt,
      chunkOverlap = get("GRAFT_CHUNK_OVERLAP").toInt,
      threadMaxAgeDays = get("GRAFT_THREAD_MAX_AGE_DAYS").toInt,
      knowledgeChannels = parseList(get("GRAFT_KNOWLEDGE_CHANNELS")))
    require(cfg.chunkOverlap < cfg.chunkSize,
      "chunk overlap must be smaller than chunk size")
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
