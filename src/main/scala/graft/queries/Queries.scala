package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}

/** One driver-verifiable query. `oracle` is the DuckDB-equivalent ANSI
  * SQL over the same parquet tables; None for ops whose hash seeds
  * (xxhash64) the oracle engine lacks — those get a rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The oracle-checked query registry: one entry per operator of
  * SURVEY.md §2 plus the LLM-training-data operators (dedup, text
  * analysis, similarity search, event windows).
  *
  * Cross-engine determinism rules (see [[Q]]'s scaladoc): exact-decimal
  * money aggregation; counts as longs; floating aggregates rounded to 6
  * decimals; per-row IEEE chains left unrounded (bit-reproducible);
  * every result ends in a total deterministic ORDER BY.
  */
object Queries {

  /** The full registry: per-family files concatenated (split from the
    * former 13.6k-line monolith in r12; order is registration order,
    * the gate sorts by name).
    */
  val registry: Seq[QueryDef] =
    QueriesGraphWarehouse.defs ++
    QueriesAgg.defs ++
    QueriesWindow.defs ++
    QueriesDedup.defs ++
    QueriesSimEval.defs ++
    QueriesText.defs ++
    QueriesCorpus.defs ++
    QueriesEvents.defs

  /** Test-visible base-frame forwarder (events parquet with the
    * nanos/micros schema branch) — lives in [[QHelpers]].
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame =
    QHelpers.events(s, dir)


  val byName: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  val oracles: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
