package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RankOps must reproduce the single-partition window results exactly —
  * the whole point is that the distributed shape is a drop-in for
  * row_number()/running-sum windows with no value drift.
  */
class RankOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def base = {
    // 997 rows, keys deliberately collision-heavy so range boundaries
    // land inside tie runs; (k, id) is the total order
    spark.range(0, 997).toDF("id")
      .withColumn("k", col("id") % 13)
      .withColumn("v", (col("id") % 7 + 1).cast("long"))
      .withColumn("d", (col("id") % 5 + 1).cast("decimal(10,4)"))
  }

  test("withGlobalRank equals row_number over the same total order") {
    val viaWindow = base.withColumn("r",
      row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
    val viaRank = RankOps.withGlobalRank(base,
      Seq(col("k").desc, col("id")), "r")
    assert(viaRank.select("id", "r").exceptAll(
      viaWindow.select("id", "r")).isEmpty)
  }

  test("withGlobalPrefixSums equals running window sums (long + decimal)") {
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val viaWindow = base
      .withColumn("cv", sum(col("v")).over(w))
      .withColumn("cd", sum(col("d")).over(w).cast("decimal(38,4)"))
      .withColumn("r", row_number().over(Window.orderBy(col("k"), col("id")))
        .cast("long"))
    val viaPs = RankOps.withGlobalPrefixSums(base,
      Seq(col("k"), col("id")), Seq("v", "d"), Seq("cv", "cd"),
      rankCol = Some("r"))
    assert(viaPs.select("id", "cv", "cd", "r").exceptAll(
      viaWindow.select("id", "cv", "cd", "r")).isEmpty)
  }

  test("prefix sums survive empty partitions (more partitions than rows)") {
    val tiny = spark.range(0, 3).toDF("id")
      .withColumn("v", (col("id") + 1).cast("long"))
    val out = RankOps.withGlobalPrefixSums(tiny, Seq(col("id")),
      Seq("v"), Seq("cv"), rankCol = Some("r"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 3L, 6L))
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L))
  }

  test("non-numeric sum column fails fast") {
    val df = base.withColumn("s", col("id").cast("string"))
    intercept[IllegalArgumentException] {
      RankOps.withGlobalPrefixSums(df, Seq(col("id")), Seq("s"), Seq("cs"))
    }
  }

  test("withGlobalPrefixMax equals the running window max, includes current row") {
    // zig-zag values so the running max changes mid-partition and holds
    // across partition boundaries (seeded from preceding maxima)
    val df = base.withColumn("z",
      when(col("id") % 11 === 0, col("id") * 3).otherwise(col("id")).cast("long"))
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val viaWindow = df.withColumn("cm", max(col("z")).over(w))
    val viaPm = RankOps.withGlobalPrefixMax(df,
      Seq(col("k"), col("id")), Seq("z"), Seq("cm"))
    assert(viaPm.select("id", "cm").exceptAll(
      viaWindow.select("id", "cm")).isEmpty)
  }

  test("prefix max survives empty partitions and rejects non-long columns") {
    val tiny = spark.range(0, 3).toDF("id")
      .withColumn("v", when(col("id") === 1, 9L).otherwise(col("id")).cast("long"))
    val out = RankOps.withGlobalPrefixMax(tiny, Seq(col("id")),
      Seq("v"), Seq("cm")).orderBy("id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 9L, 9L))
    intercept[IllegalArgumentException] {
      RankOps.withGlobalPrefixMax(
        tiny.withColumn("s", col("id").cast("string")),
        Seq(col("id")), Seq("s"), Seq("cs"))
    }
  }
}
