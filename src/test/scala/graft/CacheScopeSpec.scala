package graft

import org.apache.spark.storage.StorageLevel

/** Lifecycle contract for [[CacheScope]]: operators persist
  * intermediates through a scope, and the lazy-return paths
  * (QueryDef/Verify) must not pin those blocks for the whole session —
  * [[CacheScope.releaseAfterNextAction]] bounds the pin to exactly one
  * materialization. */
class CacheScopeSpec extends SparkSpec {

  private def eventually(maxMs: Long = 10000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + maxMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(50)
    }
    cond
  }

  test("cache persists and release unpersists every tracked frame") {
    val s = spark
    import s.implicits._
    val scope = new CacheScope
    val a = scope.cache((1 to 10).toDF("id"))
    val b = scope.cache((11 to 20).toDF("id"))
    assert(a.storageLevel != StorageLevel.NONE)
    assert(b.storageLevel != StorageLevel.NONE)
    a.count(); b.count()
    scope.release()
    assert(eventually()(a.storageLevel == StorageLevel.NONE),
      "release() must unpersist tracked frames")
    assert(eventually()(b.storageLevel == StorageLevel.NONE))
    scope.release() // idempotent
  }

  test("releaseAfterNextAction releases the scope once the next action completes") {
    val s = spark
    import s.implicits._
    val scope = new CacheScope
    val cached = scope.cache((1 to 100).toDF("id"))
    CacheScope.releaseAfterNextAction(spark, scope)
    assert(cached.storageLevel != StorageLevel.NONE)
    // the next query execution in the session — the QueryDef flow's one
    // materialization of the returned frame
    cached.count()
    // the listener fires on the listener-bus thread; poll briefly
    assert(eventually()(cached.storageLevel == StorageLevel.NONE),
      "the one-shot listener must release the scope after the action")
  }
}
