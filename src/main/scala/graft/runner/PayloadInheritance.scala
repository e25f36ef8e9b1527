package graft.runner

/** J3: experiment payload inheritance (reference
  * test/tools/experiment_orchestrator.py:90-130, doc
  * test/README.md:102-103).
  *
  * Each experiment's payload list is merged right-biased against two
  * ancestor levels, priority `payloads > payloadFolder > parent`:
  *
  *   1. if folder payloads exist, the experiment list is doubled until
  *      it covers the folder list, trimmed to its length, and each
  *      entry becomes `{**folderPayload_j, **payload_j}`;
  *   2. every entry then becomes `{**parentPayload, **payload}`.
  *
  * Pure driver-side config plumbing (runs before any Spark job), so
  * plain Scala maps — the merged payloads feed the pipeline as
  * literal columns / `from_json` sources downstream.
  */
object PayloadInheritance {

  type Payload = Map[String, Any]

  /** Reference's length-matching: double the list until it reaches
    * `n`, then trim (net effect: cyclic repetition). Empty lists stay
    * a list of empty payloads so folder/parent values still apply. */
  def matchLength(payloads: Seq[Payload], n: Int): Seq[Payload] = {
    if (payloads.isEmpty) Seq.fill(n)(Map.empty)
    else {
      var p = payloads
      while (p.length < n) p = p ++ p
      p.take(n)
    }
  }

  /** The full two-level right-biased merge. */
  def prepare(
      payloads: Seq[Payload],
      folder: Seq[Payload] = Nil,
      parent: Payload = Map.empty): Seq[Payload] = {
    val afterFolder =
      if (folder.isEmpty) payloads
      else matchLength(payloads, folder.length).zip(folder)
        .map { case (p, f) => f ++ p }
    afterFolder.map(p => parent ++ p)
  }
}
