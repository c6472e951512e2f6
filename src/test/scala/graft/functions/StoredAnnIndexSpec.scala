package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{SimilarityFunctions => S}

/** The stored, cell-partitioned ANN serving layout (r13):
  * [[SimilarityFunctions.writeIvfPqIndexPartitioned]] +
  * [[SimilarityFunctions.probedCells]] + [[SimilarityFunctions
  * .ivfPqTopKStored]]. Two contracts pinned here:
  *
  *  1. result transparency — serving from the stored layout equals
  *     the in-plan [[SimilarityFunctions.ivfPqTopK]] row for row
  *     (the s11b registry query additionally hash-matches the s11
  *     DuckDB oracle at the driver gate);
  *  2. the scan PRUNES — the probed-cell `isin` lands in the scan's
  *     PartitionFilters (directory-level pruning), with an
  *     UNPARTITIONED layout as the positive control (same predicate
  *     lands as a data filter; every file read).
  */
class StoredAnnIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def codebooks = emb.filter(col("vec_id") < 4)
    .select(col("vec_id").cast("int").as("code"),
      col("embedding").cast("array<double>").as("v"))
    .select(explode(sequence(lit(0), lit(7))).as("subspace"),
      col("code"), col("v"))
    .select(col("subspace"), col("code"),
      slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))

  private def centroids = emb.filter(col("vec_id") < 4)
    .select(col("vec_id").as("centroid_id"),
      col("embedding").cast("array<double>").as("centroid_vec"))

  test("stored cell-partitioned serve == in-plan serve (s11 semantics)") {
    val idx = S.ivfPqIndex(emb, centroids, codebooks, dim = 64, m = 8, codes = 4)
    val dir = Files.createTempDirectory("ann-idx").toFile.getAbsolutePath
    S.writeIvfPqIndexPartitioned(idx, s"$dir/index")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val inPlan = S.ivfPqTopK(idx, q, centroids, codebooks,
        dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val stored = S.ivfPqTopKStored(spark, s"$dir/index", q, centroids,
        codebooks, dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(stored === inPlan)
    assert(stored.nonEmpty)
  }

  test("probedCells follows the ivfPqTopK probe rule (cosine desc, cid asc)") {
    // one query = centroid 0's own vector: its top-2 probe must
    // include cell 0 (self-cosine 1.0) and have exactly 2 cells
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cells = S.probedCells(q, centroids, nProbe = 2)
    assert(cells.length === 2)
    assert(cells.contains(0L))
    // nProbe = nCells probes everything
    assert(S.probedCells(q, centroids, nProbe = 4).sorted === Seq(0L, 1L, 2L, 3L))
  }

  test("incremental append == full rebuild (same index table, same serve)") {
    val dir = Files.createTempDirectory("ann-append").toFile.getAbsolutePath
    // full rebuild over everything
    val full = S.ivfPqIndex(emb, centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.writeIvfPqIndexPartitioned(full, s"$dir/rebuilt")
    // night 0: even ids; night 1: append odd ids
    val night0 = S.ivfPqIndex(emb.filter(col("vec_id") % 2 === 0),
      centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.writeIvfPqIndexPartitioned(night0, s"$dir/inc")
    S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 2 === 1),
      s"$dir/inc", centroids, codebooks, dim = 64, m = 8, codes = 4)
    def load(p: String) = spark.read.parquet(p)
      .select(col("vec_id").cast("long"), col("cell").cast("long"),
        col("codes")).orderBy("vec_id").collect().toSeq
    assert(load(s"$dir/inc") === load(s"$dir/rebuilt"))
    // and the appended layout serves identically
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def serve(p: String) = S.ivfPqTopKStored(spark, p, q, centroids,
        codebooks, dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(serve(s"$dir/inc") === serve(s"$dir/rebuilt"))
  }

  test("serving scan prunes to probed cells; unpartitioned control reads everything") {
    val idx = S.ivfPqIndex(emb, centroids, codebooks, dim = 64, m = 8, codes = 4)
    val dir = Files.createTempDirectory("ann-prune").toFile.getAbsolutePath
    S.writeIvfPqIndexPartitioned(idx, s"$dir/part")
    // positive control: same rows, NO hive partitioning
    idx.write.mode("overwrite").parquet(s"$dir/flat")

    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cells = S.probedCells(q, centroids, nProbe = 2)

    // partitioned layout: hive cell= directories exist on disk
    val dirs = new java.io.File(s"$dir/part").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.length === 4, dirs.mkString(","))

    val served = S.ivfPqTopKStored(spark, s"$dir/part", q, centroids,
      codebooks, dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
    val plan = served.queryExecution.executedPlan.toString
    // the probed-cell predicate is a PARTITION filter (directory-level
    // pruning), not a data filter
    assert(plan.contains("PartitionFilters: [cell#"), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
    // result is still the right answer
    assert(served.count() === 5L)

    // control: the flat layout serves the same rows, but the cell
    // predicate cannot prune — no partition filter exists
    val flatPruned = spark.read.parquet(s"$dir/flat")
      .filter(col("cell").isin(cells.map(Long.box): _*))
    val flatServed = S.ivfPqTopK(flatPruned, q, centroids, codebooks,
      dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
    val flatPlan = flatServed.queryExecution.executedPlan.toString
    assert(!flatPlan.contains("PartitionFilters: [cell#"), flatPlan)
    assert(flatServed.orderBy("query_id", "rank").collect().toSeq ===
      served.orderBy("query_id", "rank").collect().toSeq)
  }

  private def cellDataFiles(indexDir: String): Map[String, Int] =
    new java.io.File(indexDir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .map(d => d.getName -> d.listFiles().count(f => f.isFile &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_")))
      .toMap

  test("compaction drops file counts; serving is row-identical; untouched cells skip") {
    val dir = Files.createTempDirectory("ann-compact").toFile.getAbsolutePath
    val p = s"$dir/index"
    val night0 = S.ivfPqIndex(emb.filter(col("vec_id") % 3 === 0),
      centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.writeIvfPqIndexPartitioned(night0, p)
    S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 3 === 1),
      p, centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.appendIvfPqIndexPartitioned(emb.filter(col("vec_id") % 3 === 2),
      p, centroids, codebooks, dim = 64, m = 8, codes = 4)
    val before = cellDataFiles(p)
    assert(before.values.forall(_ >= 3), s"appends should fragment: $before")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def serve() = S.ivfPqTopKStored(spark, p, q, centroids, codebooks,
        dim = 64, m = 8, codes = 4, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    def rows() = spark.read.parquet(p)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .orderBy("vec_id").collect().toSeq
    val servedBefore = serve(); val rowsBefore = rows()
    val stats = S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 1)
    val after = cellDataFiles(p)
    assert(after.values.forall(_ === 1), s"every cell -> one file: $after")
    assert(stats("cells_compacted") === before.size.toLong)
    assert(stats("files_after") < stats("files_before"))
    assert(rows() === rowsBefore)       // rows byte-identical
    assert(serve() === servedBefore)    // serving hash-identical
    assert(servedBefore.nonEmpty)
    // idempotence: nothing over the bound -> no cell touched
    val again = S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 1)
    assert(again("cells_compacted") === 0L)
    assert(cellDataFiles(p) === after)
  }

  test("compaction recovery: a crash between the swap renames restores the old cell") {
    val dir = Files.createTempDirectory("ann-recover").toFile.getAbsolutePath
    val p = s"$dir/index"
    val idx = S.ivfPqIndex(emb, centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.writeIvfPqIndexPartitioned(idx, p)
    val rowsBefore = spark.read.parquet(p)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .orderBy("vec_id").collect().toSeq
    // simulate a crash AFTER swap-out, BEFORE swap-in: cell=0 moved to
    // _compact_old, live dir gone, a half-written tmp left behind
    val live = new java.io.File(p, "cell=0")
    val oldRoot = new java.io.File(p, "_compact_old"); oldRoot.mkdirs()
    assert(live.renameTo(new java.io.File(oldRoot, "cell=0")))
    val tmp = new java.io.File(p, "_compact_tmp/cell=0"); tmp.mkdirs()
    // the hidden dirs are invisible to the scan, so cell 0 is MISSING
    assert(spark.read.parquet(p).filter(col("cell") === 0).count() === 0L)
    // recovery on entry restores the old dir, discards the tmp, then
    // compaction proceeds normally (nothing over the bound here)
    S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 8)
    assert(!new java.io.File(p, "_compact_old").exists())
    assert(!new java.io.File(p, "_compact_tmp").exists())
    val rowsAfter = spark.read.parquet(p)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .orderBy("vec_id").collect().toSeq
    assert(rowsAfter === rowsBefore)
    // and the completed-swap orphan case: old copy present WITH a live
    // dir means the swap finished -> the orphan is just deleted
    val orphan = new java.io.File(p, "_compact_old/cell=1"); orphan.mkdirs()
    S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 8)
    assert(!new java.io.File(p, "_compact_old").exists())
    assert(spark.read.parquet(p)
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .orderBy("vec_id").collect().toSeq === rowsBefore)
  }

  test("compaction single-writer lock: a held lock fails fast; force recovers it") {
    val dir = Files.createTempDirectory("ann-lock").toFile.getAbsolutePath
    val p = s"$dir/index"
    val idx = S.ivfPqIndex(emb, centroids, codebooks, dim = 64, m = 8, codes = 4)
    S.writeIvfPqIndexPartitioned(idx, p)
    // another compactor (or a crashed one) holds the marker
    val lock = new java.io.File(p, "_compact_lock")
    assert(lock.createNewFile())
    val e = intercept[IllegalArgumentException](
      S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 8))
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    assert(lock.exists(), "a refused entry must not steal the lock")
    // force = the operator's post-crash path: proceeds and releases
    val stats = S.compactIvfPqIndexPartitioned(spark, p,
      maxFilesPerCell = 8, force = true)
    assert(stats.contains("cells_scanned"))
    assert(!lock.exists(), "the lock releases on exit")
    // a normal run after release also works and releases
    S.compactIvfPqIndexPartitioned(spark, p, maxFilesPerCell = 8)
    assert(!lock.exists())
    // the underscore-prefixed marker never leaks into scans
    assert(spark.read.parquet(p).count() === idx.count())
  }
}
