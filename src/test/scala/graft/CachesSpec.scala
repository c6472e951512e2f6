package graft

import org.scalatest.funsuite.AnyFunSuite

class CachesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("operator-pinned blocks are released back to baseline") {
    spark.catalog.clearCache()
    Caches.releaseAll() // drain anything earlier suites registered
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    // e6 pins its purchase list; w9 pins the gap-fill input; m1 pins the
    // shingle frame — all through trackedPersist
    for (q <- Seq("e6_interval_join", "w9_gap_fill", "m1_minhash_pairs"))
      queries.Queries.byName(q)(spark, sf).queryExecution.toRdd.count()
    val pinned = spark.sparkContext.getPersistentRDDs.keySet.diff(baseline)
    assert(pinned.nonEmpty, "expected the queries to pin shared lineage")
    Caches.releaseAll()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(baseline)
    assert(leaked.isEmpty, s"blocks leaked past releaseAll: $leaked")
    // idempotent and safe on an empty registry
    Caches.releaseAll()
  }

  test("pin: two interleaved pin/release sequences stay independent") {
    import org.apache.spark.storage.StorageLevel
    spark.catalog.clearCache()
    Caches.releaseAll()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val (a, releaseA) = Caches.pin(spark.range(50).toDF("a"), StorageLevel.MEMORY_AND_DISK)
    val (b, releaseB) = Caches.pin(spark.range(60).toDF("b"), StorageLevel.MEMORY_AND_DISK)
    a.count(); b.count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).size === 2)
    // releasing A must not evict B's blocks (the concurrent-session case)
    releaseA()
    assert(!(a.storageLevel.useMemory || a.storageLevel.useDisk), "A released")
    assert(b.storageLevel.useMemory || b.storageLevel.useDisk,
      "releasing one pin must not drop the other's blocks")
    // scoped release is idempotent, and releaseAll still drains B
    releaseA()
    Caches.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).isEmpty)
    // closures for already-swept entries stay safe no-ops
    releaseB()
  }

  test("releaseAll never touches frames persisted outside trackedPersist") {
    val mine = spark.range(100).toDF("id").persist()
    mine.count()
    try {
      Caches.releaseAll()
      assert(mine.storageLevel.useMemory || mine.storageLevel.useDisk,
        "releaseAll must not unpersist another job's cache")
    } finally mine.unpersist()
  }
}
