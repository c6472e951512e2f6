package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <query> [sfDir] [--count]`
  * prints the formatted physical plan of one registry query — the
  * iterate-on-the-plan loop (scan pruning, exchange count, codegen
  * spans) PLANS.md's evidence is captured with, without spinning up the
  * whole bench. `--count` additionally executes the plan and prints the
  * row count. (The near-identical PlanDump main this absorbed is gone.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.nonEmpty, "usage: Explain <queryName> [sfDir] [--count]")
    val name = pos(0)
    val dir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val run = queries.Queries.byName.getOrElse(name, sys.error(
      s"unknown query '$name'; known: ${queries.Queries.byName.keys.toSeq.sorted.mkString(", ")}"))
    val df = run(spark, dir)
    df.explain("formatted")
    if (flags.contains("--count")) println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
