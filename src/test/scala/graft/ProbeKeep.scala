package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Components, Dedup}

/** Throwaway phase profiler for the keepFrame dedup chain. */
object ProbeKeep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
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
        val docs = Tables.documents(spark, sfDir)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        t("shingles only drain") {
          drain(Dedup.wordShingles(docs, "text", "doc_id"))
        }
        t("shingles+cap drain") {
          drain(Dedup.cappedIndex(
            Dedup.wordShingles(docs, "text", "doc_id"), 1000L))
        }
        t("shingles+cap+window drain") {
          drain(Dedup.cappedIndex(
              Dedup.wordShingles(docs, "text", "doc_id"), 1000L)
            .withColumn("n_g", count(lit(1)).over(w)))
        }
        val idx = t("idx build+cache") {
          val i0 = Dedup.cappedIndex(
              Dedup.wordShingles(docs, "text", "doc_id"), 1000L)
            .withColumn("n_g", count(lit(1)).over(w))
          val c = graft.core.CacheScope.cache(i0)
          c.count()
          c
        }
        val sigs = t("signatures drain") {
          val s0 = Dedup.minhashSignatures(idx.select("id", "g"), 64)
          val c = graft.core.CacheScope.cache(s0)
          c.count()
          c
        }
        val bands = t("bands drain") {
          val b = Dedup.lshBands(sigs, 64, 4)
          val c = graft.core.CacheScope.cache(b)
          c.count()
          c
        }
        val cands = t("candidates drain") {
          val cd = Dedup.minhashCandidates(bands)
          val c = graft.core.CacheScope.cache(cd)
          c.count()
          c
        }
        val verified = t("verify drain") {
          val a = idx.select(col("id").as("id1"), col("g"), col("n_g").as("n1"))
          val b = idx.select(col("id").as("id2"), col("g"), col("n_g").as("n2"))
          val v = cands.join(a, Seq("id1")).join(b, Seq("id2", "g"))
            .groupBy(col("id1"), col("id2"), col("n1"), col("n2"))
            .agg(count(lit(1)).as("shared"))
            .filter(col("shared") / (col("n1") + col("n2") - col("shared")) >= 0.5)
            .select("id1", "id2")
          val c = graft.core.CacheScope.cache(v)
          c.count()
          c
        }
        val labels = t("connectedComponents") {
          Components.connectedComponents(
            docs.select(col("doc_id").as("id")), verified)
        }
        t("sizes+tokens+finish drain") {
          val keep = Components.withClusterSizes(labels)
            .withColumn("keep", (col("id") === col("cluster_id")).cast("long"))
            .join(docs.select(col("doc_id").as("id"),
              size(graft.ops.TextAnalysis.tokens(col("text")))
                .cast("long").as("n_tokens")),
              Seq("id"))
          val stats = keep.agg(
            sum(col("keep")).as("kept_docs"),
            sum(col("keep") * col("n_tokens")).as("kept_tokens"))
          drain(keep.crossJoin(broadcast(stats))
            .select(col("id").as("doc_id"), col("cluster_id"),
              col("cluster_size"), col("keep"), col("n_tokens"),
              col("kept_docs"), col("kept_tokens"))
            .orderBy(col("doc_id")))
        }
      }
    }
    spark.stop()
  }
}
