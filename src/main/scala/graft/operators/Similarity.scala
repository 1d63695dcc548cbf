package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity via a broadcast block nested loop.
  *
  * The declarative form (`a JOIN b ON a.id < b.id` + per-pair dot) pays a
  * per-pair cost of materializing two copied vector arrays into the joined
  * row — ~1 KB of memcpy per pair, which dominates the actual FMA work.
  * Here one side is broadcast ONCE as a primitive matrix and the pair loop
  * runs inside `mapPartitions` over the other side: zero per-pair copies,
  * contiguous double[] accesses, and the work still distributes across all
  * partitions of the probe side.
  *
  * Scale path: all-pairs is inherently O(n^2) — at 100 TB you don't run
  * this, you run the LSH-bucketed variant (TrainingData.simTopkLsh /
  * dedupMinhashLsh) and use THIS operator per bucket or per broadcast-sized
  * block of the build side (loop over B-blocks of ~100 MB, one pass each).
  * The broadcast build side is the same mechanic as Spark's own broadcast
  * hash join build.
  *
  * Inputs are expected pre-normalized (unit L2), so dot = cosine.
  */
object Similarity {

  final case class Pair(vec_a: Long, vec_b: Long, sim: Double)

  private def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** All unordered pairs (a < b) with cosine >= threshold. */
  def allPairsAboveThreshold(
      normalized: DataFrame, // (vec_id: long, nv: array<double>) unit vectors
      threshold: Double,
      scale: Int = 4): DataFrame = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val vecs: Array[(Long, Array[Double])] =
      normalized.select("vec_id", "nv").as[(Long, Array[Double])]
        .collect().sortBy(_._1)
    val ids = vecs.map(_._1)
    val dim = if (vecs.isEmpty) 0 else vecs(0)._2.length
    val flat = new Array[Double](vecs.length * dim)
    vecs.zipWithIndex.foreach { case ((_, v), i) =>
      System.arraycopy(v, 0, flat, i * dim, dim)
    }
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcFlat = spark.sparkContext.broadcast(flat)
    val n = ids.length

    val pairs: Dataset[Pair] = spark.range(0, n.toLong)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
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
        it.flatMap { iL =>
          val i = iL.toInt
          val off = i * dim
          (i + 1 until n).iterator.flatMap { j =>
            var s = 0.0
            var d = 0
            val joff = j * dim
            while (d < dim) { s += m(off + d) * m(joff + d); d += 1 }
            if (s < guard) None
            else {
              val r = roundHalfUp(s, scale)
              if (r >= threshold) Some(Pair(idArr(i), idArr(j), r)) else None
            }
          }
        }
      }
    pairs.toDF("vec_a", "vec_b", "sim").orderBy("vec_a", "vec_b")
  }
}
