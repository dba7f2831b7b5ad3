package graft

import graft.GraftCaches.PersistOps

/** Scoped cache tracking: interleaved scopes release independently. */
class GraftCachesSpec extends SparkSpec {
  import spark.implicits._

  test("two interleaved scopes keep their caches until their own release") {
    GraftCaches.releaseAll(spark) // isolate from earlier suites
    val a = GraftCaches.newScope()
    val b = GraftCaches.newScope()

    val dfA = GraftCaches.inScope(a) { Seq(1, 2, 3).toDF("a").graftPersist }
    val dfB = GraftCaches.inScope(b) { Seq(4, 5).toDF("b").graftPersist }
    dfA.count(); dfB.count() // materialize both caches
    assert(a.trackedCount == 1 && b.trackedCount == 1)
    assert(GraftCaches.trackedCount == 0) // global scope untouched

    a.release()
    // A's cache is gone, B's survives A's release
    assert(a.trackedCount == 0 && b.trackedCount == 1)
    assert(dfA.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(dfB.storageLevel != org.apache.spark.storage.StorageLevel.NONE)

    b.release()
    assert(dfB.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("persists outside any scope land in the global scope drained by releaseAll") {
    GraftCaches.releaseAll(spark)
    val df = Seq(1).toDF("x").graftPersist
    df.count()
    assert(GraftCaches.trackedCount == 1)
    GraftCaches.releaseAll(spark)
    assert(GraftCaches.trackedCount == 0)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
