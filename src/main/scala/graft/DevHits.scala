package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: run GraphOps.hits on a testdata dir with full stack
  * traces (Verify swallows them). `runMain graft.DevHits <sfDir>`.
  */
object DevHits {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_suppkey") + 1000000L).as("src"), col("l_partkey").as("dst"))
    val t0 = System.nanoTime()
    val out = graft.ops.GraphOps.hits(e, "src", "dst", iterations = 4)
    println(s"rows=${out.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    out.orderBy(desc("authority")).show(5)
    spark.stop()
  }
}
