package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[graft.queries.Queries]]; one entry per
  * implemented operator of SURVEY.md §2 plus the LLM-pipeline tier.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full feature stage (W-1..W-5 over the prices adaptation).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("w5_features")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.byName

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hash seeds the oracle
    * engine can't reproduce (minhash/simhash/hyperplane LSH). */
  def oracleSql: Map[String, String] = Queries.oracles
}
