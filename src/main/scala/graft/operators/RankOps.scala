package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact global ranking without a single-partition sort.
  *
  * `Window.orderBy(...)` with an empty PARTITION BY compiles to an
  * Exchange SinglePartition + a one-task sort over the whole input — the
  * classic scale killer: at 100 TB the entire table funnels through one
  * executor thread. This helper computes the SAME exact gapless
  * row-number rank as the global window in two distributed passes:
  *
  *  1. approx_percentile cut points over the key (one map-side-combined
  *     aggregate, one broadcast row) range-bucket every row; equal keys
  *     always share a bucket (strict `cut < key` comparison), so bucket
  *     order extends to exact global order.
  *  2. per-bucket counts (≤ `buckets` rows) prefix-sum into offsets — the
  *     only partition-less window runs over that bounded aggregate — and
  *     rank = bucket offset + row_number within the bucket (a window
  *     PARTITIONED by bucket, so each sort is bucket-local).
  *
  * Cut-point placement only affects load BALANCE, never rank values, so
  * the output is bit-identical to the global window (oracle-exact) while
  * every stage stays distributed. Heavy ties on the key concentrate into
  * one bucket by construction — the usual skew caveat; callers ranking
  * near-constant keys should pre-salt or rethink the metric.
  */
object RankOps {

  /** Adds exact 1-based global rank `out` ordered by (`key` asc, `ties`
    * asc). For descending keys pass `negate(key)`.
    */
  def withGlobalRank(df: DataFrame, key: Column, ties: Seq[Column],
                     out: String, buckets: Int = 64): DataFrame = {
    val kd = key.cast(DoubleType)
    val pcts = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val cuts = df.agg(percentile_approx(kd, pcts, lit(1000)).as("_rk_cuts"))
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn("_rk_b",
        coalesce(size(filter(col("_rk_cuts"), c => c < kd)), lit(0)))
      .drop("_rk_cuts")
    val offs = bucketed.groupBy("_rk_b").agg(count(lit(1)).as("_rk_n"))
      .withColumn("_rk_off", coalesce(
        sum("_rk_n").over(Window.orderBy("_rk_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_rk_b", "_rk_off")
    bucketed.join(broadcast(offs), Seq("_rk_b"))
      .withColumn(out, (col("_rk_off") + row_number().over(
        Window.partitionBy("_rk_b").orderBy(key +: ties: _*)))
        .cast(LongType))
      .drop("_rk_b", "_rk_off")
  }

  /** SQL `ntile(k)` recomputed from an exact gapless rank `r` and total
    * row count `n` (both 1-based longs): the first `n % k` tiles take
    * `n/k + 1` rows, the rest `n/k` — identical to the window function's
    * assignment, derivable row-locally once the rank exists.
    */
  def ntileFromRank(r: Column, n: Column, k: Int): Column = {
    val small = floor(n / k).cast(LongType)
    val m = (n % k).cast(LongType)
    val big = small + lit(1L)
    when(r <= m * big, floor((r - lit(1L)) / big) + lit(1L))
      .otherwise(m + floor((r - m * big - lit(1L)) / small) + lit(1L))
      .cast(LongType)
  }
}
