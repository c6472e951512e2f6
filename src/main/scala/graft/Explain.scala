package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan and row count of one registry query — the
  * iterate-on-the-plan loop (scan pruning, exchange count, codegen
  * spans) without spinning up the whole bench.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
