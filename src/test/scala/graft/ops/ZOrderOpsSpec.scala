package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ZOrderOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits exactly; clamps out-of-range dims") {
    def z(a: Long, b: Long, bits: Int): Long =
      spark.range(1).select(ZOrderOps.zValue(Seq(lit(a), lit(b)), bits))
        .as[Long].head()
    // a=1 (01), b=2 (10), 2 bits: a0->pos0, b0->pos1, a1->pos2, b1->pos3
    assert(z(1L, 2L, 2) === (1L + 8L))
    assert(z(0L, 0L, 8) === 0L)
    // all-ones interleave: (2^bits - 1, 2^bits - 1) -> 2^(2 bits) - 1
    assert(z(255L, 255L, 8) === (1L << 16) - 1)
    // clamping: negatives floor to 0, overflow saturates to the max
    assert(z(-5L, 2L, 2) === z(0L, 2L, 2))
    assert(z(99L, 2L, 2) === z(3L, 2L, 2))
    // three dims: bit i of dim j lands at position i*3 + j
    val z3 = spark.range(1)
      .select(ZOrderOps.zValue(Seq(lit(1L), lit(1L), lit(1L)), 1)).as[Long].head()
    assert(z3 === 7L)
  }

  test("zValueSql generates the identical function (SQL twin)") {
    val viaSql = spark.sql(
      s"SELECT ${ZOrderOps.zValueSql(Seq("5", "9"), 4)} AS z").as[Long].head()
    val viaCol = spark.range(1)
      .select(ZOrderOps.zValue(Seq(lit(5L), lit(9L)), 4)).as[Long].head()
    assert(viaSql === viaCol)
  }

  test("zOrder yields tight per-partition bounding boxes in BOTH dims") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(pmod(col("l_suppkey"), lit(256)).as("a"),
        pmod(col("l_partkey"), lit(256)).as("b"))
    def avgRange(clustered: org.apache.spark.sql.DataFrame, dim: String): Double =
      clustered.withColumn("_p", spark_partition_id())
        .groupBy("_p").agg((max(col(dim)) - min(col(dim))).as("r"))
        .agg(avg("r")).as[Double].head()
    val zed = ZOrderOps.zOrder(df, Seq("a", "b"), bits = 8, partitions = 16)
    // row set unchanged (it is a layout op, not a transform)
    assert(zed.count() === df.count())
    assert(zed.exceptAll(df).isEmpty && df.exceptAll(zed).isEmpty)
    // baseline: range-partitioned by a alone — b's per-partition range
    // spans essentially the whole domain
    val byA = df.repartitionByRange(16, col("a"))
    val (zA, zB) = (avgRange(zed, "a"), avgRange(zed, "b"))
    val (lA, lB) = (avgRange(byA, "a"), avgRange(byA, "b"))
    assert(lB > 150.0, s"baseline should NOT cluster b (got $lB)")
    assert(zB < lB / 2, s"z-order must tighten b: z=$zB vs baseline=$lB")
    assert(zA < 150.0, s"z-order must still cluster a too (got $zA)")
  }
}
