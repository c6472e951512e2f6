package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object DevEdgeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[eaudit] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))

    def mkE() = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()

    def lpa(tag: String, pin: Boolean): Unit = {
      val e = time(s"$tag edge pin") {
        val base = if (pin) mkE().repartition(32, col("u")) else mkE()
        val d = base.persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[eaudit]   |e| = ${d.count()}")
        d
      }
      val sym = time(s"$tag sym pin") {
        val s0raw = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
        val s0 = (if (pin) s0raw.repartition(32, col("u")) else s0raw)
          .persist(StorageLevel.MEMORY_AND_DISK)
        s0.count(); s0
      }
      var labels = sym.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("community"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      labels.count()
      for (r <- 1 to 4) {
        val next = time(s"$tag lpa round $r") {
          val n = sym.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(col("v").as("node"), col("community"))
            .agg(count(lit(1)).as("_c"))
            .groupBy("node")
            .agg(min_by(col("community"),
              struct(negate(col("_c")), col("community"))).as("community"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          n.count(); n
        }
        labels.unpersist(blocking = false); labels = next
      }
      sym.unpersist(true); e.unpersist(true); labels.unpersist(true)
    }

    lpa("PIN   ", pin = true)
    lpa("NOPIN ", pin = false)
    lpa("PIN2  ", pin = true)
    lpa("NOPIN2", pin = false)
    spark.stop()
  }
}
