package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val prices = Seq(
    ("A", "2024-01-05", 10.0),
    ("A", "2024-02-10", 11.0),
    ("A", "2024-03-20", 12.0),
    ("B", "2024-01-05", 50.0)
  ).toDF("ticker", "d", "close").selectExpr("ticker", "CAST(d AS DATE) AS date", "close")

  private val macroSeries = Seq(
    ("A", "2024-01-01", 5.25),
    ("A", "2024-02-01", 5.50),
    ("B", "2024-03-01", 4.00) // after B's only price row
  ).toDF("ticker", "md", "rate").selectExpr("ticker", "CAST(md AS DATE) AS mdate", "rate")

  test("backward as-of picks the latest right row at or before each left time") {
    val out = AsOfJoinOps.asOfJoinBackward(prices, macroSeries,
      Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy("ticker", "date")
      .select("ticker", "date", "rate").collect()
    assert(out(0).getAs[Double]("rate") === 5.25) // Jan 5 <- Jan 1 obs
    assert(out(1).getAs[Double]("rate") === 5.50) // Feb 10 <- Feb 1 obs
    assert(out(2).getAs[Double]("rate") === 5.50) // Mar 20 <- still Feb 1
    assert(out(3).isNullAt(2)) // B has no obs at/before Jan 5 -> null
  }

  test("same-instant right observation is visible (>= semantics)") {
    val right = Seq(("A", "2024-01-05", 9.99)).toDF("ticker", "md", "rate")
      .selectExpr("ticker", "CAST(md AS DATE) AS mdate", "rate")
    val out = AsOfJoinOps.asOfJoinBackward(
      prices.filter($"ticker" === "A"), right, Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy("date").select("rate").collect()
    assert(out(0).getAs[Double](0) === 9.99)
  }

  test("dropNoMatch gives the inner variant") {
    val out = AsOfJoinOps.asOfJoinBackward(prices, macroSeries,
      Seq("ticker"), "date", "mdate", Seq("rate"), dropNoMatch = true)
    assert(out.count() === 3L) // B's row dropped
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    val out = AsOfJoinOps.asOfJoinForward(prices, macroSeries,
      Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy("ticker", "date")
      .select("ticker", "date", "rate").collect()
    assert(out(0).getAs[Double]("rate") === 5.50) // Jan 5 -> next obs Feb 1
    assert(out(1).isNullAt(2)) // Feb 10: no obs after -> null
    assert(out(2).isNullAt(2)) // Mar 20: none
    assert(out(3).getAs[Double]("rate") === 4.00) // B Jan 5 -> Mar 1 obs
  }

  test("null times match nothing in either direction") {
    // a null LEFT time satisfies neither inequality -> null payload;
    // a null RIGHT time must never act as a fallback observation
    val l = Seq(("A", Some("2024-02-10")), ("A", None)).toDF("ticker", "d")
      .selectExpr("ticker", "CAST(d AS DATE) AS date")
    val r = Seq(("A", Some("2024-01-01"), 5.25), ("A", None, 99.9))
      .toDF("ticker", "md", "rate")
      .selectExpr("ticker", "CAST(md AS DATE) AS mdate", "rate")
    val back = AsOfJoinOps.asOfJoinBackward(l, r, Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy($"date".asc_nulls_first).select("rate").collect()
    assert(back(0).isNullAt(0), "null left time must get null payload (backward)")
    assert(back(1).getAs[Double](0) === 5.25, "null right time must not shadow a real obs")
    val fwd = AsOfJoinOps.asOfJoinForward(l, r, Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy($"date".asc_nulls_first).select("rate").collect()
    assert(fwd(0).isNullAt(0), "null left time must get null payload (forward)")
    assert(fwd(1).isNullAt(0), "no obs at/after Feb 10; null-time right row must not match")
  }

  test("forward as-of sees a same-instant right observation") {
    val right = Seq(("A", "2024-03-20", 7.77)).toDF("ticker", "md", "rate")
      .selectExpr("ticker", "CAST(md AS DATE) AS mdate", "rate")
    val out = AsOfJoinOps.asOfJoinForward(
      prices.filter($"ticker" === "A"), right, Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy("date").select("rate").collect()
    // every A row is at or before Mar 20, so all three see the obs
    assert(out.forall(!_.isNullAt(0)))
    assert(out(2).getAs[Double](0) === 7.77)
  }

  test("left columns named like the internals (_t, _asof) are not clobbered") {
    val trickyLeft = prices.withColumn("_t", $"close" * 10)
      .withColumn("_asof", $"close" * 100)
    val out = AsOfJoinOps.asOfJoinBackward(trickyLeft, macroSeries,
      Seq("ticker"), "date", "mdate", Seq("rate"))
      .orderBy("ticker", "date").collect()
    // the user's _t/_asof values must come through untouched
    out.foreach { r =>
      assert(r.getAs[Double]("_t") === r.getAs[Double]("close") * 10)
      assert(r.getAs[Double]("_asof") === r.getAs[Double]("close") * 100)
    }
    assert(out.count(!_.isNullAt(out.head.fieldIndex("rate"))) === 3)
  }

  test("one shuffle: the plan has a single hash exchange for the window") {
    val out = AsOfJoinOps.asOfJoinBackward(prices, macroSeries,
      Seq("ticker"), "date", "mdate", Seq("rate"))
    val plan = out.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, s"expected exactly one exchange:\n$plan")
  }
}
