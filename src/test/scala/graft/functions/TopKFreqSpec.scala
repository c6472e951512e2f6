package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKFreqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("capacity >= distinct values: exact counts, equal to groupBy count") {
    val words = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(20)("gamma") ++ Seq.fill(5)("delta")
    // spread over many partitions so map-side partials genuinely merge
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(words), 8).toDF("w")
    val out = df.agg(TopKFreq(col("w"), k = 4, capacity = 10).as("top"))
      .selectExpr("inline(top)").as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("alpha", 50L, 0L), ("beta", 30L, 0L),
      ("gamma", 20L, 0L), ("delta", 5L, 0L)))
  }

  test("under pressure the true heavy hitters survive eviction") {
    // 3 heavy hitters drowning in 200 singletons; capacity far below the
    // distinct count — space-saving must keep anything with freq > N/cap
    val heavy = Seq.fill(300)("HH1") ++ Seq.fill(200)("HH2") ++ Seq.fill(100)("HH3")
    val noise = (1 to 200).map(i => s"noise$i")
    val df = spark.sparkContext
      .parallelize(new scala.util.Random(3).shuffle(heavy ++ noise), 8).toDF("w")
    val out = df.agg(TopKFreq(col("w"), k = 3, capacity = 50).as("top"))
      .selectExpr("inline(top)").as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("HH1", "HH2", "HH3"))
    // counts overestimate by at most the reported error
    out.foreach { case (v, c, err) =>
      val truth = Map("HH1" -> 300L, "HH2" -> 200L, "HH3" -> 100L)(v)
      assert(c >= truth && c - err <= truth, s"$v: count=$c err=$err truth=$truth")
    }
  }

  test("merge keeps the overestimation bound when truncation drops a key mid-merge") {
    // the adversarial order: x is dropped by an intermediate truncation,
    // then re-added by a later partial — a naive count-summing merge
    // would report x=5 (UNDER truth 10) with a tiny error
    def summary(pairs: (String, Int)*): SpaceSavingSummary = {
      val s = new SpaceSavingSummary(2)
      pairs.foreach { case (v, n) => (1 to n).foreach(_ => s.add(v)) }
      s
    }
    val p1 = summary("x" -> 5, "a" -> 1)
    val p2 = summary("b" -> 7, "c" -> 6)
    val p3 = summary("x" -> 5, "d" -> 1)
    val truth = Map("x" -> 10L, "a" -> 1L, "b" -> 7L, "c" -> 6L, "d" -> 1L)
    p1.merge(p2); p1.merge(p3)
    p1.topK(2).foreach { case (v, c, err) =>
      assert(c >= truth(v), s"$v: count $c underestimates truth ${truth(v)}")
      assert(c - err <= truth(v), s"$v: lower bound ${c - err} above truth ${truth(v)}")
    }
  }

  test("works per-group and rejects non-string input") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "w")
    val out = df.groupBy("g").agg(TopKFreq(col("w"), 1, 4).as("top"))
      .selectExpr("g", "inline(top)").as[(String, String, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("g1", "x", 2L, 0L), ("g2", "z", 1L, 0L)))
    intercept[Exception] {
      Seq(1, 2).toDF("n").agg(TopKFreq(col("n"), 1, 4)).collect()
    }
  }

  test("finds boilerplate shingles in the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shingles = docs.select(explode(
      DedupFunctions.wordShingles(col("text"), 3)).as("sh"))
    val top = shingles.agg(TopKFreq(col("sh"), k = 5, capacity = 500).as("top"))
      .selectExpr("inline(top)").as[(String, Long, Long)].collect()
    assert(top.length === 5)
    assert(top.map(_._2).toSeq === top.map(_._2).sortBy(-_).toSeq) // desc order
    assert(top.head._2 > 1L, "most frequent shingle should repeat")
  }
}
