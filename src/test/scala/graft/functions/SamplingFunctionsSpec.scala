package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SamplingFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("sampleByHash is invariant under repartitioning (df.sample is not)") {
    val a = SamplingFunctions.sampleByHash(ids, "id", 1, 10)
      .as[Long].collect().toSet
    val b = SamplingFunctions.sampleByHash(ids.repartition(17), "id", 1, 10)
      .as[Long].collect().toSet
    assert(a === b)
    // and the fraction is in the right ballpark
    assert(a.size > 120 && a.size < 280, s"~10% of 2000 expected, got ${a.size}")
  }

  test("splitColumn: complete, disjoint, and ~80/10/10") {
    val tagged = ids.select(col("id"),
      SamplingFunctions.splitColumn(col("id").cast("string"), 80, 10).as("split"))
    val counts = tagged.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "valid", "test"))
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1500L && counts("valid") < 300L && counts("test") < 300L)
    // a row's split never depends on anything but its key
    val again = ids.orderBy(rand(1)).select(col("id"),
      SamplingFunctions.splitColumn(col("id").cast("string"), 80, 10).as("split"))
    assert(tagged.except(again).isEmpty && again.except(tagged).isEmpty)
  }

  test("the sample filter is a pushed-down predicate, not a shuffle") {
    val plan = SamplingFunctions.sampleByHash(ids, "id", 1, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bounds are validated, including Int-overflow sums") {
    intercept[IllegalArgumentException] {
      SamplingFunctions.sampleByHash(ids, "id", 11, 10)
    }
    intercept[IllegalArgumentException] {
      SamplingFunctions.splitColumn(col("id"), 80, 30)
    }
    intercept[IllegalArgumentException] {
      SamplingFunctions.splitColumn(col("id"), 2000000000, 2000000000)
    }
  }

  test("null keys: null split, excluded from samples, same for BOTH hashes") {
    val withNull = spark.sql("SELECT * FROM VALUES ('a'), (CAST(NULL AS STRING)) AS t(k)")
    for (h <- Seq((c: org.apache.spark.sql.Column) => xxhash64(c),
        (c: org.apache.spark.sql.Column) => DedupFunctions.md5Hash60(c))) {
      val split = withNull.select(col("k"),
        SamplingFunctions.splitColumn(col("k"), 80, 10, h).as("s")).collect()
      assert(split.find(_.isNullAt(0)).exists(_.isNullAt(1)),
        "null key must map to null split")
      val sampled = SamplingFunctions.sampleByHash(withNull, "k", 10, 10, h)
      assert(sampled.count() === 1L, "null key must never enter a sample")
    }
  }
}
