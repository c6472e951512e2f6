package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // one pathologically hot key (900 of 1000 rows) plus a cold tail
  private val skewed = ((1 to 900).map(i => ("HOT", i.toLong)) ++
    (1 to 100).map(i => (s"K$i", i.toLong))).toDF("k", "v")
  private val dim = (Seq("HOT") ++ (1 to 50).map(i => s"K$i"))
    .zipWithIndex.map { case (k, i) => (k, s"label$i") }.toDF("k", "label")

  test("saltedJoin(inner) equals the plain join exactly") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v").collect()
    val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .orderBy("k", "v").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin(left) keeps unmatched left rows exactly once") {
    val plain = skewed.join(dim, Seq("k"), "left").orderBy("k", "v").collect()
    val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), salts = 8, "left")
      .orderBy("k", "v").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin(left_anti) matches plain anti-join") {
    val plain = skewed.join(dim, Seq("k"), "left_anti").count()
    assert(SkewOps.saltedJoin(skewed, dim, Seq("k"), 8, "left_anti").count() === plain)
  }

  test("the hot key's rows spread across salt buckets") {
    // recompute the salt the way saltedJoin does and count distinct
    // buckets for the hot key — skew defeated iff > 1
    val buckets = skewed.filter($"k" === "HOT")
      .select(pmod(xxhash64($"k", $"v"), lit(8L)).as("salt"))
      .distinct().count()
    assert(buckets > 4, s"hot key landed in only $buckets/8 salt buckets")
  }

  test("a MapType column on the left does not break the salt projection") {
    val withMap = skewed.withColumn("attrs", map(lit("a"), lit("b")))
    val out = SkewOps.saltedJoin(withMap, dim, Seq("k"), 4)
    assert(out.count() === skewed.join(dim, Seq("k")).count())
  }

  test("right/full join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(skewed, dim, Seq("k"), 8, "right")
    }
  }

  test("the shuffle keys include the salt column") {
    val plan = SkewOps.saltedJoin(skewed, dim, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
  }
}
