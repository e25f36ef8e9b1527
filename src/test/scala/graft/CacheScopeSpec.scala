package graft

import org.apache.spark.sql.functions._
import graft.core.CacheScope
import graft.ops.{Dedup, Mix}

/** Round-6 ADVICE: operators whose returned plan references an
  * internal cache (Mix's base/kept, the dedup shingle indexes)
  * accumulated storage across calls in a long-lived session. The
  * CacheScope contract releases them per entry — these specs prove
  * repeated runs in one JVM leave no cached plans behind.
  *
  * Assertions diff the persistent-RDD KEY SET around each block
  * rather than comparing counts: the shared test session's
  * ContextCleaner asynchronously drops other suites' leftovers, so
  * absolute counts move under us, but a NEW rdd id surviving its
  * scope is exact evidence of a leak. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 40L).map { i =>
    (i, if (i < 20) "a" else "b", "w " * 9 + "w")
  }.toDF("doc_id", "source", "text")

  private def persistedKeys: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("repeated scoped runs show no storage growth (Verify/Bench shape)") {
    (1 to 3).foreach { i =>
      val before = persistedKeys
      CacheScope.withScope {
        Mix.mix(docs, "text", "doc_id", "source",
          Seq("a" -> 0.5, "b" -> 0.5), 150L, salt = "t").count()
        Mix.mixEpochs(docs, "text", "doc_id", "source",
          Seq("a" -> 0.9), 800L, salt = "t").count()
        Dedup.jaccardPairs(docs, "text", "doc_id").count()
        ()
      }
      val leaked = persistedKeys -- before
      assert(leaked.isEmpty,
        s"run $i: operator caches survived their scope: rdds $leaked")
    }
  }

  test("without a scope, caches behave like plain cache() (caller owns cleanup)") {
    val before = persistedKeys
    val r = Mix.mix(docs, "text", "doc_id", "source",
      Seq("a" -> 0.5, "b" -> 0.5), 150L, salt = "t")
    r.count()
    val added = persistedKeys -- before
    assert(added.nonEmpty) // interactive semantics unchanged
    spark.catalog.clearCache()
    assert((persistedKeys & added).isEmpty)
  }

  test("scopes nest: the inner scope releases only its own caches") {
    val before = persistedKeys
    CacheScope.withScope {
      Mix.mix(docs, "text", "doc_id", "source",
        Seq("a" -> 0.5), 150L, salt = "t").count()
      val outerAdded = persistedKeys -- before
      assert(outerAdded.nonEmpty)
      val preInner = persistedKeys
      CacheScope.withScope {
        Dedup.jaccardPairs(docs, "text", "doc_id").count()
        ()
      }
      // inner's additions released, outer's still held
      assert((persistedKeys -- preInner).isEmpty)
      assert((persistedKeys & outerAdded) === outerAdded)
      ()
    }
    assert((persistedKeys -- before).isEmpty)
  }
}
