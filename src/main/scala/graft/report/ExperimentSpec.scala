package graft.report

/** Experiment/report configuration, mirroring the reference's
  * `defaultExperiment` (test/faas_runner.py:34-64) — defaults are
  * semantics (e.g. randomSeed=42, removeDuplicateContainers=false).
  * Invocation-side fields (callWithCLI, memorySettings, sleepTime,
  * endpoints) are out of engine scope; everything the report engine
  * honors is here.
  */
case class ExperimentSpec(
    runs: Int = 10,
    threads: Int = 10,
    iterations: Int = 1,
    randomSeed: Long = 42L,
    shufflePayloads: Boolean = false,
    outputGroups: Seq[String] = Nil,
    outputRawOfGroup: Seq[String] = Nil,
    showAsList: Set[String] = Set.empty,
    showAsSum: Set[String] = Set.empty,
    ignoreFromAll: Set[String] = Set.empty,
    ignoreFromGroups: Set[String] = Set.empty,
    ignoreByGroup: Map[String, Set[String]] = Map.empty,
    invalidators: Map[String, String] = Map.empty,
    removeDuplicateContainers: Boolean = false,
    overlapFilter: Option[String] = None,
    combineSheets: Boolean = false,
    warmupBuffer: Int = 0,
    experimentName: String = "DEFAULT-EXP",
    passPayloads: Boolean = false,
    transitions: Map[String, String] = Map.empty) {

  /** P17 category auto-repair (reference report_generator.py:62-71):
    * drop weak ids from the group list when better ones exist in the
    * data — vmuptime is superseded by vmID, uuid by containerID. */
  def normalizedGroups(availableCols: Set[String]): Seq[String] =
    outputGroups.filterNot(g =>
      (g == "vmuptime" && availableCols.contains("vmID")) ||
        (g == "uuid" && availableCols.contains("containerID")))

  def groupConfig(category: String): Groups.GroupConfig =
    Groups.GroupConfig(
      category = category,
      showAsSum = showAsSum,
      showAsList = showAsList,
      ignore = ignoreFromAll ++ ignoreFromGroups ++
        ignoreByGroup.getOrElse(category, Set.empty))
}

object ExperimentSpec {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import scala.jdk.CollectionConverters._

  /** Parse the reference's experiment JSON files (the user-facing
    * config format under test/experiments/, loaded with
    * missing-key defaults exactly like compile_results.py:64-66 /
    * faas_runner.py). Invocation-side keys (callWithCLI, sleepTime,
    * memorySettings, endpoints, openCSV, …) are accepted and
    * ignored; everything the report engine honors maps onto the
    * case class. `""` for overlapFilter means none, and an
    * `ignoreByGroup` given as a list (the blank template's shape)
    * reads as empty. */
  def fromJson(json: String): ExperimentSpec = {
    val n = new ObjectMapper().readTree(json)
    val d = ExperimentSpec()
    def node(f: String): Option[JsonNode] = Option(n.get(f))
    def int(f: String, dv: Int): Int = node(f).map(_.asInt(dv)).getOrElse(dv)
    def bool(f: String, dv: Boolean): Boolean =
      node(f).map(_.asBoolean(dv)).getOrElse(dv)
    def str(f: String, dv: String): String =
      node(f).map(_.asText(dv)).getOrElse(dv)
    def seq(f: String): Seq[String] =
      node(f).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    def strMap(f: String): Map[String, String] =
      node(f).filter(_.isObject).map(o =>
        o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
    ExperimentSpec(
      runs = int("runs", d.runs),
      threads = int("threads", d.threads),
      iterations = int("iterations", d.iterations),
      randomSeed = node("randomSeed").map(_.asLong(d.randomSeed))
        .getOrElse(d.randomSeed),
      shufflePayloads = bool("shufflePayloads", d.shufflePayloads),
      outputGroups = seq("outputGroups"),
      outputRawOfGroup = seq("outputRawOfGroup"),
      showAsList = seq("showAsList").toSet,
      showAsSum = seq("showAsSum").toSet,
      ignoreFromAll = seq("ignoreFromAll").toSet,
      ignoreFromGroups = seq("ignoreFromGroups").toSet,
      ignoreByGroup = node("ignoreByGroup").filter(_.isObject).map(o =>
        o.properties().asScala.map(e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSet)
          .toMap).getOrElse(Map.empty),
      invalidators = strMap("invalidators"),
      removeDuplicateContainers =
        bool("removeDuplicateContainers", d.removeDuplicateContainers),
      overlapFilter = Some(str("overlapFilter", "")).filter(_.nonEmpty),
      combineSheets = bool("combineSheets", d.combineSheets),
      warmupBuffer = int("warmupBuffer", d.warmupBuffer),
      experimentName = str("experimentName", d.experimentName),
      passPayloads = bool("passPayloads", d.passPayloads),
      transitions = strMap("transitions"))
  }

  /** The payload triple for [[graft.runner.PayloadInheritance]]:
    * (payloads, parentPayload) as plain maps of JSON scalars. */
  def payloadsFromJson(json: String): (Seq[Map[String, Any]], Map[String, Any]) = {
    val n = new ObjectMapper().readTree(json)
    def scalar(v: JsonNode): Any =
      if (v.isIntegralNumber) v.asLong()
      else if (v.isNumber) v.asDouble()
      else if (v.isBoolean) v.asBoolean()
      else v.asText()
    def payload(o: JsonNode): Map[String, Any] =
      o.properties().asScala.map(e => e.getKey -> scalar(e.getValue)).toMap
    val payloads = Option(n.get("payloads")).filter(_.isArray)
      .map(_.elements().asScala.map(payload).toSeq)
      .getOrElse(Seq(Map.empty[String, Any]))
    val parent = Option(n.get("parentPayload")).filter(_.isObject)
      .map(payload).getOrElse(Map.empty[String, Any])
    (payloads, parent)
  }
}
