package graft.operators

import java.util.{Arrays => JArrays}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact all-pairs similarity via a *blocked* broadcast nested loop.
  *
  * The declarative form (`a JOIN b ON a.id < b.id` + per-pair dot) pays a
  * per-pair cost of materializing two copied vector arrays into the joined
  * row — ~1 KB of memcpy per pair, which dominates the actual FMA work.
  * Here the BUILD side is broadcast as a primitive matrix and the pair loop
  * runs inside `mapPartitions` over the distributed PROBE side: zero
  * per-pair copies, contiguous double[] accesses.
  *
  * Scale design (the part that survives 100×): the build side is NOT the
  * whole table. It is iterated in broadcast-sized blocks of contiguous
  * `vec_id` ranges (boundaries from `approxQuantile`, ≤ `maxBlockBytes`
  * per block — the same mechanic as a broadcast hash join build). Each
  * pass collects ONE block to the driver, broadcasts it, and probes only
  * the rows with `vec_id` greater than the block's lower bound (the
  * triangular pruning: pair (a,b), a<b, is produced exactly once, by the
  * block containing `a`). Driver heap holds one block at a time; the
  * broadcast itself lives in the block manager (memory-and-disk) like any
  * join build side. Total probe work across passes is the inherent
  * O(n²)/2 — all-pairs at 100 TB is still something you run per LSH
  * bucket / per cluster (TrainingData.simTopkLsh, dedupSemantic), but the
  * operator itself no longer needs the full table to fit on the driver.
  *
  * Inputs are expected pre-normalized (unit L2), so dot = cosine.
  */
object Similarity {

  final case class Pair(vec_a: Long, vec_b: Long, sim: Double)

  private def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-row build-side footprint: one long id + `dim` doubles. */
  private[graft] def rowBytes(dim: Int): Long = 8L + 8L * dim

  /** How many broadcast blocks a build side of `n` rows × `dim` dims needs
    * under `maxBlockBytes`. Exposed for tests (FunctionsSpec asserts the
    * blocked path really splits when forced small).
    */
  private[graft] def numBlocksFor(n: Long, dim: Int, maxBlockBytes: Long): Int =
    math.max(1L, math.ceil(n.toDouble * rowBytes(dim) / math.max(1L, maxBlockBytes).toDouble).toLong)
      .min(Int.MaxValue.toLong).toInt

  /** All unordered pairs (a < b) with cosine >= threshold.
    *
    * @param maxBlockBytes cap on the broadcast build block (default 256 MB —
    *   comfortably a join-build-side size; tests force it tiny to exercise
    *   the multi-block path).
    */
  def allPairsAboveThreshold(
      normalized: DataFrame, // (vec_id: long, nv: array<double>) unit vectors
      threshold: Double,
      scale: Int = 4,
      maxBlockBytes: Long = 256L << 20): DataFrame = {
    val spark = normalized.sparkSession
    import spark.implicits._

    val src = normalized.select(col("vec_id").cast(LongType).as("vec_id"), col("nv"))
    val head = src.select(size(col("nv"))).head(1)
    if (head.isEmpty) return emptyResult(spark)
    val dim = head(0).getInt(0)
    val n = src.count()
    val blocks = numBlocksFor(n, dim, maxBlockBytes)

    // Contiguous id-range block boundaries. approxQuantile is cheap (one
    // pass, fixed sketch) and boundaries only need to partition the id
    // space, not be exact — every block stays within ~relativeError of the
    // byte target. Upper bound of the last block is forced to MaxValue so
    // coverage is total regardless of sketch error.
    val upperBounds: Array[Long] =
      if (blocks == 1) Array(Long.MaxValue)
      else {
        val qs = (1 to blocks).map(i => i.toDouble / blocks).toArray
        val bs = src.stat.approxQuantile("vec_id", qs, 0.001).map(_.toLong)
        bs(bs.length - 1) = Long.MaxValue
        bs.distinct
      }

    var lo = Long.MinValue
    val passes = upperBounds.map { hi =>
      val pass = onePass(spark, src, lo, hi, dim, threshold, scale)
      lo = hi
      pass
    }
    passes.reduce(_ union _).toDF("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }

  /** One blocked pass: build = ids in (blockLo, blockHi], probe = ids >
    * blockLo (superset of the build range plus everything after it; the
    * `buildId < probeId` emit rule keeps each unordered pair unique
    * across passes). Only this block is ever collect()ed to the driver.
    */
  private def onePass(
      spark: SparkSession,
      src: DataFrame,
      blockLo: Long,
      blockHi: Long,
      dim: Int,
      threshold: Double,
      scale: Int): Dataset[Pair] = {
    import spark.implicits._
    val block: Array[(Long, Array[Double])] =
      src.filter(col("vec_id") > blockLo && col("vec_id") <= blockHi)
        .as[(Long, Array[Double])]
        .collect().sortBy(_._1)
    val ids = block.map(_._1)
    val flat = new Array[Double](block.length * dim)
    block.zipWithIndex.foreach { case ((_, v), i) =>
      System.arraycopy(v, 0, flat, i * dim, dim)
    }
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcFlat = spark.sparkContext.broadcast(flat)

    src.filter(col("vec_id") > blockLo).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val idArr = bcIds.value
        val m = bcFlat.value
        // HALF_UP at `scale` can raise a value by at most half an ulp of the
        // scale — pairs below (threshold - guard) can never round up past the
        // threshold, so the exact BigDecimal rounding (allocation per call)
        // only runs for the vanishing fraction of near/above-threshold pairs
        // instead of every one of the O(n^2)/2.
        // (the 1e-12 slack absorbs the double representation error of the
        // boundary itself — skipping must err on the side of rounding)
        val guard = threshold - 0.5 * math.pow(10.0, -scale) - 1e-12
        it.flatMap { case (probeId, pv) =>
          // build entries are sorted by id: only the prefix with id < probeId
          // pairs with this probe row (binary search for the cut).
          var cut = JArrays.binarySearch(idArr, probeId)
          if (cut < 0) cut = -cut - 1
          (0 until cut).iterator.flatMap { i =>
            var s = 0.0
            var d = 0
            val off = i * dim
            while (d < dim) { s += m(off + d) * pv(d); d += 1 }
            if (s < guard) None
            else {
              val r = roundHalfUp(s, scale)
              if (r >= threshold) Some(Pair(idArr(i), probeId, r)) else None
            }
          }
        }
      }
  }

  private def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_a", LongType, nullable = false),
        StructField("vec_b", LongType, nullable = false),
        StructField("sim", DoubleType, nullable = false))))
}
