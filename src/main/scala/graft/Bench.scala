package graft
import org.apache.spark.sql.SparkSession

/** Throughput bench: each query timed SPARK_GRAFT_BENCH_RUNS times
  * (default 3) and reported at its MINIMUM — this box's load swings
  * single-run timings 3-10x (PLANS.md), so the min is the only number
  * stable enough for round-over-round comparison. Total = sum of
  * per-query minima. Optional args restrict the run to the named
  * queries (for re-checking a single outlier).
  *
  * Adjudication pass: sweep readings have repeatedly shown 2-17x
  * inflation from box interference (rounds 3 and 4 each needed manual
  * isolated re-runs to tell noise from regression). So after the
  * sweep, any query whose min exceeds 2x its prior recorded floor is
  * re-timed in a quiet tail pass — nothing else interleaved — and the
  * JSON carries BOTH readings per re-run query plus the floor, so a
  * regression call never needs a manual re-run: `isolated` ~ floor
  * means interference; `isolated` >> floor means a real plan change.
  * The headline per-query value is min(sweep, isolated).
  */
object Bench {

  /** Prior isolated floors (sec, sf0.1, local[32], min-of-3) from the
    * round-3/4 adjudicated re-runs (PLANS.md, VERDICT r4); queries not
    * listed default to [[DefaultFloor]]. Update when a plan change
    * legitimately moves a floor. */
  private val Floors: Map[String, Double] = Map(
    // round-5 quiet-box full sweep (52 entries, 34.6 s total): the
    // r4 q_dedup_clusters 12.8 s isolated reading was box state —
    // 4.7 s here on byte-identical code, below even the r3 floor.
    "q_ngram_jaccard" -> 1.6, // sizes ride the index; 2 joins removed
    "q_dedup_clusters" -> 3.9, // pointer jumping + in-batch fixpoint test
    "q_stream_window" -> 2.1,
    "q_sessionize_stream" -> 1.6,
    "q_minhash_dedup" -> 1.7,
    "q_sales_report" -> 1.6,
    "q_sales_date_range" -> 1.6,
    "q_ann_ivf" -> 1.1,
    "q_sales_transform" -> 1.6,
    "q_sales_priority" -> 1.6,
    "q_tfidf" -> 1.1,
    "q_simhash_pairs" -> 1.1,
    "q_decontaminate" -> 1.1,
    "q_decontaminate_semantic" -> 0.9,
    "q_parts_supplier" -> 0.9,
    "q_e2e_report" -> 1.0,
    "q_asof_bucketed" -> 0.9,
    "q_repetition" -> 0.9,
    "q_embed_neardup_lsh" -> 1.1,
    "q_multimodal" -> 0.9,
    "q_simhash" -> 0.9,
    "q_embed_neardup" -> 0.9,
    "q_sessionize" -> 0.9,
    "q_ann_topk" -> 0.9)

  /** Anything unlisted has always swept well under this. */
  private val DefaultFloor = 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.ListBuffer.empty[String]

    def timeQuery(name: String, runs: Int): Double =
      (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() } catch {
          case e: Throwable =>
            if (!errors.contains(name)) errors += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        // queries cache intermediates for their own multi-consumer
        // plans; drop them between runs so each run is cold
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min

    val wanted = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    val sweep = SparkEntry.queries.keys.filter(wanted).map { name =>
      name -> timeQuery(name, nRuns)
    }.toMap

    // quiet-tail adjudication of sweep outliers
    val suspects = sweep.filter { case (name, t) =>
      t > 2 * Floors.getOrElse(name, DefaultFloor) && !errors.contains(name)
    }.keys.toSeq.sorted
    val isolated = suspects.map { name =>
      System.err.println(s"[bench] re-running sweep outlier $name isolated")
      name -> timeQuery(name, nRuns)
    }.toMap

    val results = sweep.map { case (name, t) =>
      name -> math.min(t, isolated.getOrElse(name, t))
    }
    def jmap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val adjudicated = suspects.map { name =>
      s""""$name":{"sweep":${sweep(name)},"isolated":${isolated(name)},"floor":${Floors.getOrElse(name, DefaultFloor)}}"""
    }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},"adjudicated":$adjudicated,"runs_per_query":$nRuns,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
