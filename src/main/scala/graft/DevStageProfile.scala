package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only per-stage profiler for ONE registry query: runs the query
  * under the bench discipline (fresh caches, System.gc, toRdd.count)
  * and prints, per Spark stage, the summed task run time, shuffle
  * read/write bytes, input bytes and spill — the attribution data the
  * Spark UI would show, collected through a SparkListener so it works
  * with `spark.ui.enabled=false`. The optimization loop's measurement
  * tool (guide §1: decide whether time goes to shuffle read, compute,
  * or I/O before touching anything).
  *
  * usage: runMain graft.DevStageProfile <query> [iters]
  *   SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1)
  *   SPARK_GRAFT_CPUS   picks core count (default 32)
  */
object DevStageProfile {
  final case class StageAgg(
      var name: String = "",
      var tasks: Int = 0,
      var runTimeMs: Long = 0L,
      var cpuTimeMs: Long = 0L,
      var gcTimeMs: Long = 0L,
      var shuffleReadB: Long = 0L,
      var shuffleWriteB: Long = 0L,
      var inputB: Long = 0L,
      var spillB: Long = 0L,
      var wallMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DevStageProfile <queryName> [iters]")
    val name = args(0)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").count()

    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (collecting) {
        val agg = stages.synchronized(
          stages.getOrElseUpdate(t.stageId, StageAgg()))
        val m = t.taskMetrics
        if (m != null) agg.synchronized {
          agg.tasks += 1
          agg.runTimeMs += m.executorRunTime
          agg.cpuTimeMs += m.executorCpuTime / 1000000L
          agg.gcTimeMs += m.jvmGCTime
          agg.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          agg.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          agg.inputB += m.inputMetrics.bytesRead
          agg.spillB += m.memoryBytesSpilled
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val agg = stages.synchronized(
            stages.getOrElseUpdate(s.stageInfo.stageId, StageAgg()))
          agg.synchronized {
            agg.name = s.stageInfo.name.takeWhile(_ != '\n')
            agg.wallMs = (for {
              a <- s.stageInfo.completionTime
              b <- s.stageInfo.submissionTime
            } yield a - b).getOrElse(0L)
          }
        }
    })

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    for (iter <- 1 to iters) {
      stages.clear()
      Caches.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      println(f"%n[profile] $name iter $iter wall=$wall%.2f s  (stages by summed task run time)")
      println(f"[profile] ${"stage"}%-7s ${"tasks"}%5s ${"run_s"}%8s ${"cpu_s"}%8s ${"gc_s"}%6s ${"wall_s"}%7s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spill_MB"}%8s  name")
      val rows = stages.synchronized(stages.toSeq).sortBy(-_._2.runTimeMs)
      for ((id, a) <- rows.take(25)) {
        println(f"[profile] $id%-7d ${a.tasks}%5d ${a.runTimeMs / 1e3}%8.2f ${a.cpuTimeMs / 1e3}%8.2f ${a.gcTimeMs / 1e3}%6.2f ${a.wallMs / 1e3}%7.2f ${a.inputB / 1e6}%8.1f ${a.shuffleReadB / 1e6}%8.1f ${a.shuffleWriteB / 1e6}%8.1f ${a.spillB / 1e6}%8.1f  ${a.name.take(70)}")
      }
      val tot = rows.map(_._2.runTimeMs).sum / 1e3
      val totIn = rows.map(_._2.inputB).sum / 1e6
      val totSh = rows.map(_._2.shuffleReadB).sum / 1e6
      println(f"[profile] TOTAL task-run=$tot%.2f s  input=$totIn%.1f MB  shuffleRead=$totSh%.1f MB  nstages=${rows.size}")
    }
    spark.stop()
  }
}
