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
