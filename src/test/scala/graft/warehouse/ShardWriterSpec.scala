package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ShardWriterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("shards").toFile.getAbsolutePath

  test("export is reproducible: same shard membership and order each run") {
    val docs = (1L to 500L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
    val w = new ShardWriter(spark)
    val out1, out2 = tmp()
    w.exportShards(docs, out1, "doc_id", shards = 4)
    w.exportShards(docs.repartition(13).orderBy(rand(7)), out2, "doc_id", shards = 4)
    val a = spark.read.parquet(out1).select("doc_id", "text", "shard")
    val b = spark.read.parquet(out2).select("doc_id", "text", "shard")
    // identical membership including the shard tag, independent of the
    // input's partitioning and order
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() === 500L)
    // one file per shard directory
    for (d <- new java.io.File(out1).listFiles() if d.getName.startsWith("shard=")) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} should hold exactly one file")
    }
  }

  test("split directories partition the output and counts come back") {
    val docs = (1L to 300L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .withColumn("split", graft.functions.SamplingFunctions
        .splitColumn(col("doc_id").cast("string"), 80, 10))
    val out = tmp()
    val counts = new ShardWriter(spark)
      .exportShards(docs, out, "doc_id", shards = 2, splitCol = Some("split"))
    assert(counts.values.sum === 300L)
    assert(counts.keySet === Set("train", "valid", "test"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet === Set("split=train", "split=valid", "split=test"))
    // pruned read sees only its split
    val train = spark.read.parquet(out).filter(col("split") === "train")
    assert(train.count() === counts("train"))
  }

  test("export scans its input lineage exactly once (counts read back)") {
    // an accumulator inside the lineage counts per-row evaluations: the
    // write pass pays 300, and the per-split counts must come from the
    // written parquet, not a second execution of the input plan
    val evals = spark.sparkContext.longAccumulator("lineage-evals")
    val tick = udf { s: String => evals.add(1L); s }
    val docs = (1L to 300L).map(i => (i, s"t$i")).toDF("doc_id", "raw")
      .withColumn("text", tick(col("raw"))).drop("raw")
      .withColumn("split", graft.functions.SamplingFunctions
        .splitColumn(col("doc_id").cast("string"), 80, 10))
    val counts = new ShardWriter(spark)
      .exportShards(docs, tmp(), "doc_id", shards = 2, splitCol = Some("split"))
    assert(counts.values.sum === 300L)
    assert(evals.value === 300L,
      s"input lineage ran ${evals.value / 300.0}x, expected exactly once")
  }

  test("numeric-looking split labels keep their string identity in counts") {
    // partition-dir type inference would read "01" back as int 1 and the
    // returned map key would not match the input value; the explicit-
    // schema read-back preserves it
    val docs = (1L to 90L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .withColumn("split",
        when(col("doc_id") <= 30L, "01")
          .when(col("doc_id") <= 60L, "002").otherwise("3"))
    val counts = new ShardWriter(spark)
      .exportShards(docs, tmp(), "doc_id", shards = 2, splitCol = Some("split"))
    assert(counts === Map("01" -> 30L, "002" -> 30L, "3" -> 30L))
  }

  test("reserved column and bad shard count are rejected") {
    val df = Seq((1L, 0L)).toDF("doc_id", "shard")
    intercept[IllegalArgumentException] {
      new ShardWriter(spark).exportShards(df, tmp(), "doc_id", 2)
    }
    intercept[IllegalArgumentException] {
      new ShardWriter(spark).exportShards(
        Seq((1L, "t")).toDF("doc_id", "text"), tmp(), "doc_id", 0)
    }
  }
}
