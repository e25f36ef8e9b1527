package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway phase profiler for the simhash-pairs chain. */
object ProbeSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.ui.enabled", "false")
    graft.core.SessionTune.defaults.foreach {
      case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    graft.core.SessionTune.tuneForData(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      System.err.println(s"[probe] === round $round ===")
      graft.core.CacheScope.withScope {
        val docs = graft.core.Tables.documents(spark, sfDir)
        val sh = t("simhash agg drain") {
          val s0 = Dedup.simhash(docs, "text", "doc_id")
          drain(s0); s0
        }
        val banded = t("banded cache") {
          val nBands = 10; val bandBits = 6
          val bands = (0 until nBands).map { j =>
            struct(lit(j).as("band"),
              shiftrightunsigned(col("simhash"), j * bandBits)
                .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))
          }
          val b = sh
            .select(col("id"), col("simhash"), explode(array(bands: _*)).as("b"))
            .select(col("id"), col("simhash"),
              col("b.band").as("band"), col("b.bv").as("bv"))
          val c = graft.core.CacheScope.cache(b)
          c.count(); c
        }
        val pairs = t("join+verify drain") {
          val a = banded.select(col("band"), col("bv"),
            col("id").as("id1"), col("simhash").as("f1"))
          val bb = banded.select(col("band"), col("bv"),
            col("id").as("id2"), col("simhash").as("f2"))
          val p = a.join(bb, Seq("band", "bv"))
            .filter(col("id1") < col("id2"))
            .withColumn("hamming",
              bit_count(col("f1").bitwiseXOR(col("f2"))).cast("long"))
            .filter(col("hamming") <= 8)
            .select(col("id1"), col("id2"), col("hamming"))
          drain(p); p
        }
        t("distinct drain") { drain(pairs.distinct()) }
        System.err.println(s"[probe] joined pair rows (pre-hamming): " +
          banded.select(col("band"), col("bv"), col("id").as("id1"))
            .join(banded.select(col("band"), col("bv"), col("id").as("id2")),
              Seq("band", "bv"))
            .filter(col("id1") < col("id2")).count())
        System.err.println(s"[probe] verified rows pre-distinct: ${pairs.count()}" +
          s", post-distinct: ${pairs.distinct().count()}")
        t("full entry drain") {
          drain(SparkEntry.queries("q_simhash_pairs")(spark, sfDir))
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
