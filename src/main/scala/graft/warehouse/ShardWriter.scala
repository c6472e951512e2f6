package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SamplingFunctions

/** Deterministic training-shard export — the writer end of the corpus
  * pipeline (split/pack assignment upstream, evenly-sized reproducible
  * parquet shards on disk here).
  *
  * Why not `df.repartition(n).write`: round-robin repartition assigns
  * rows by partition-arrival order, so shard CONTENTS change run to run
  * — poison for resumable training and audit. Hash-bucketing the stable
  * id instead makes shard membership a pure row function (same contract
  * as [[graft.functions.SamplingFunctions.hashBucket]]), and sorting
  * within shards makes row order reproducible too.
  *
  * Scale shape: ONE shuffle (hash by shard), in-shard sort is local;
  * `partitionBy(split, shard)` lands every (split, shard) in its own
  * directory — a trainer prunes to `split=train/shard=7` without
  * listing the rest — and because the pre-write repartition co-locates
  * each shard in one task, every shard directory holds exactly one
  * file. Pick `shards` so a shard ≈ 256–1024 MB on disk (the parquet
  * sweet spot).
  */
final class ShardWriter(spark: SparkSession) {

  /** Write `df` as hash-bucketed, id-sorted parquet shards, one
    * directory per (split?, shard). Returns per-split row counts.
    */
  def exportShards(df: DataFrame, outDir: String, idCol: String,
      shards: Int, splitCol: Option[String] = None): Map[String, Long] = {
    require(shards >= 1, s"shards must be >= 1 (got $shards)")
    require(!df.schema.fieldNames.contains("shard"),
      "input already has a 'shard' column; rename it before exporting")
    val tagged = df.withColumn("shard",
      SamplingFunctions.hashBucket(col(idCol), shards))
    val partCols = splitCol.toSeq :+ "shard"
    tagged
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.partitionBy(partCols: _*)
      .mode("overwrite").parquet(outDir)
    // count what was WRITTEN, not the input: re-aggregating `df` here
    // would re-execute its entire upstream lineage (in CorpusPipeline
    // that is the whole gate/scrub/dedup chain) a second time, while the
    // just-written parquet answers from partition-pruned footer metadata.
    // The read gets the writer's EXPLICIT schema: partition-column type
    // inference would otherwise re-type numeric-looking split dirs
    // ("01" -> int 1) and the returned keys would no longer match the
    // input column's values. (Hive dirs still cannot represent the empty
    // string — it round-trips as null, like in Warehouse appends — so
    // use non-empty split labels.)
    val written = spark.read.schema(tagged.schema).parquet(outDir)
    splitCol match {
      case Some(s) =>
        written.groupBy(col(s)).count().collect()
          .map(r => Option(r.get(0)).map(_.toString).getOrElse("null") -> r.getLong(1))
          .toMap
      case None => Map("all" -> written.count())
    }
  }
}
