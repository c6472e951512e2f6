package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** Exact global ranking without a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` plans a WindowExec with no
  * partition spec — Spark moves the ENTIRE frame through one task, the
  * shape that works at sf0.1 and falls over at 100× (the r11 verdict's
  * exact-order-statistic family). This helper computes the identical
  * rank distributed:
  *
  *   1. `repartitionByRange` on the sort key — a sampling pass picks
  *      range boundaries, every partition holds a contiguous key range;
  *   2. `sortWithinPartitions` — the frame is now TOTALLY sorted across
  *      partition index order;
  *   3. `zipWithIndex` — one count-per-partition job, then each task
  *      offsets its local index by the preceding partitions' counts.
  *
  * Cost: one range shuffle + one extra count job — each partition does
  * O(|part| log |part|) work, nothing data-sized ever colocates. The
  * rank VALUES are independent of where the sampled boundaries land:
  * the global sorted order is the same, only its slicing differs, so
  * results are deterministic as long as `sortCols` is a TOTAL order
  * (callers pass an explicit tiebreaker, same as they would to a
  * window — rows tied on the full key would get an arbitrary rank
  * permutation within the tie group, exactly like row_number).
  *
  * The RDD hop drops whole-stage codegen for this one stage; that is
  * the price of exactness. When approximate cuts are acceptable,
  * `approx_percentile` (the a10b pattern) stays fully codegen'd.
  */
object RankOps {

  /** Append 1-based exact global rank by `sortCols` as `rankCol`
    * (LONG). `sortCols` must be a total order for deterministic output.
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append exact running (prefix) sums of `sumCols` over the total
    * order `sortCols` — the distributed form of
    * `sum(x).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * 0))`, which would otherwise single-task the whole frame. Classic
    * two-phase prefix sum:
    *
    *   1. range-partition + sort (as [[withGlobalRank]]);
    *   2. one pass computing each partition's row count and column
    *      totals — collected to the driver (#partitions rows, bounded);
    *   3. one pass re-emitting rows with the running sums seeded from
    *      the preceding partitions' totals (and optionally a 1-based
    *      global rank as `rankCol`).
    *
    * Supported sum column types: LONG (running state Long, same
    * overflow semantics as a window sum over longs) and DECIMAL
    * (exact BigDecimal state, emitted as DECIMAL(38, s) — addition is
    * associative in exact decimal, so the split into per-partition
    * totals cannot change any value). Values must be non-null.
    *
    * The input is evaluated twice (totals pass + data pass) plus the
    * range-boundary sampling — callers pin upstream frames.
    */
  def withGlobalPrefixSums(df: DataFrame, sortCols: Seq[Column],
      sumCols: Seq[String], cumCols: Seq[String],
      rankCol: Option[String] = None): DataFrame = {
    require(sumCols.length == cumCols.length, "sumCols/cumCols mismatch")
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val fieldIdx = sumCols.map(sorted.schema.fieldIndex).toArray
    val isDec: Array[Boolean] = fieldIdx.map(i =>
      sorted.schema(i).dataType match {
        case _: DecimalType => true
        case LongType => false
        case other => throw new IllegalArgumentException(
          s"prefix sum supports LONG/DECIMAL, got $other")
      })
    val m = fieldIdx.length
    // pass 1: per-partition (count, totals).
    // INVARIANT: this pass and pass 2 below MUST read the SAME
    // `sorted.rdd` instance — Dataset.rdd is a lazy val, so both see
    // one shuffle with one set of sampled range boundaries. Deriving
    // `sorted` twice (or calling .rdd on two Dataset instances) would
    // sample boundaries independently and silently corrupt the seeded
    // offsets near partition edges.
    val partTotals = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      var cnt = 0L
      val dec = Array.fill(m)(java.math.BigDecimal.ZERO)
      val lng = new Array[Long](m)
      it.foreach { r =>
        cnt += 1
        var j = 0
        while (j < m) {
          if (isDec(j)) dec(j) = dec(j).add(r.getDecimal(fieldIdx(j)))
          else lng(j) += r.getLong(fieldIdx(j))
          j += 1
        }
      }
      Iterator((pi, cnt, dec, lng))
    }.collect().sortBy(_._1)
    val nParts = partTotals.length
    val cntOff = new Array[Long](nParts + 1)
    val decOff = Array.fill(nParts + 1, m)(java.math.BigDecimal.ZERO)
    val lngOff = Array.fill(nParts + 1)(new Array[Long](m))
    for (k <- 0 until nParts) {
      val (_, c, d, l) = partTotals(k)
      cntOff(k + 1) = cntOff(k) + c
      for (j <- 0 until m) {
        decOff(k + 1)(j) = decOff(k)(j).add(d(j))
        lngOff(k + 1)(j) = lngOff(k)(j) + l(j)
      }
    }
    val outScales = fieldIdx.zip(isDec).map { case (i, d) =>
      if (d) sorted.schema(i).dataType.asInstanceOf[DecimalType].scale else 0
    }
    val cumFields = cumCols.zipWithIndex.map { case (c, j) =>
      StructField(c,
        if (isDec(j)) DecimalType(38, outScales(j)) else LongType,
        nullable = false)
    }
    val rankField = rankCol.map(StructField(_, LongType, nullable = false))
    val schema = StructType(sorted.schema.fields ++ cumFields ++ rankField)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      val dec = decOff(pi).clone()
      val lng = lngOff(pi).clone()
      var rank = cntOff(pi)
      it.map { r =>
        rank += 1
        val extras = Seq.newBuilder[Any]
        var j = 0
        while (j < m) {
          if (isDec(j)) {
            dec(j) = dec(j).add(r.getDecimal(fieldIdx(j)))
            extras += dec(j).setScale(outScales(j))
          } else {
            lng(j) += r.getLong(fieldIdx(j))
            extras += lng(j)
          }
          j += 1
        }
        rankCol.foreach(_ => extras += rank)
        Row.fromSeq(r.toSeq ++ extras.result())
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append exact running (prefix) MAX of LONG `maxCols` over the total
    * order `sortCols` — the distributed form of
    * `max(x).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * 0))`. Same two-phase shape as [[withGlobalPrefixSums]] (max is
    * associative, so per-partition maxima seed the next partition
    * exactly); the running max INCLUDES the current row. The canonical
    * consumer is the watermark-lateness audit: with rows in ARRIVAL
    * order, `prefix_max(event_time) − event_time` is each event's
    * lateness against a max-event-time watermark. Values must be
    * non-null LONGs. Shares [[withGlobalPrefixSums]]'s single-`sorted`
    * invariant: both passes read the one `sorted.rdd` instance.
    */
  def withGlobalPrefixMax(df: DataFrame, sortCols: Seq[Column],
      maxCols: Seq[String], cumCols: Seq[String]): DataFrame = {
    require(maxCols.length == cumCols.length, "maxCols/cumCols mismatch")
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val fieldIdx = maxCols.map(sorted.schema.fieldIndex).toArray
    fieldIdx.foreach { i =>
      require(sorted.schema(i).dataType == LongType,
        s"prefix max supports LONG, got ${sorted.schema(i).dataType}")
    }
    val m = fieldIdx.length
    // pass 1: per-partition maxima (same shared-`sorted.rdd` invariant
    // as withGlobalPrefixSums — see the comment there)
    val partMax = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      val mx = Array.fill(m)(Long.MinValue)
      it.foreach { r =>
        var j = 0
        while (j < m) {
          val v = r.getLong(fieldIdx(j))
          if (v > mx(j)) mx(j) = v
          j += 1
        }
      }
      Iterator((pi, mx))
    }.collect().sortBy(_._1)
    val nParts = partMax.length
    val off = Array.fill(nParts + 1)(Array.fill(m)(Long.MinValue))
    for (k <- 0 until nParts; j <- 0 until m)
      off(k + 1)(j) = math.max(off(k)(j), partMax(k)._2(j))
    val schema = StructType(sorted.schema.fields ++
      cumCols.map(StructField(_, LongType, nullable = false)))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      val mx = off(pi).clone()
      it.map { r =>
        val extras = new Array[Any](m)
        var j = 0
        while (j < m) {
          val v = r.getLong(fieldIdx(j))
          if (v > mx(j)) mx(j) = v
          extras(j) = mx(j)
          j += 1
        }
        Row.fromSeq(r.toSeq ++ extras)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
