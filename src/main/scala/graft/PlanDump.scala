package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: `runMain graft.PlanDump <query> [sfDir]`
  * prints the formatted physical plan of a registry query — the
  * .explain("formatted") loop PLANS.md's evidence is captured with,
  * without spinning up a REPL.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val run = graft.queries.Queries.byName.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${graft.queries.Queries.byName.keys.toSeq.sorted.mkString(", ")}"))
    val df = run(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
