package graft

import graft.operators.RankOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-pass rank must be BIT-IDENTICAL to the global
  * window it replaces — that equivalence is what lets the rank/ntile
  * rewrites keep their oracles without a _verify twin, so it gets pinned
  * directly: randomized keys (with heavy ties and negatives), tiny and
  * skewed inputs, and every ntile congruence class.
  */
class RankOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def windowRank(rows: Seq[(Long, Double)]): Map[Long, Long] =
    rows.toDF("id", "k")
      .withColumn("r", row_number()
        .over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  private def twoPassRank(rows: Seq[(Long, Double)], buckets: Int,
                          withMinor: Boolean = false): Map[Long, Long] =
    RankOps.withGlobalRank(rows.toDF("id", "k"), col("k"), Seq(col("id")),
        "r", buckets,
        minor = if (withMinor) Some(col("id")) else None)
      .select("id", "r")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("withGlobalRank equals the global row_number window on random " +
    "keys with heavy ties") {
    // keys from a SMALL pool → many ties, including across bucket cuts
    val pool = Array(-3.5d, -1.0d, 0.0d, 0.25d, 7.0d, 7.0d)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      val n = rnd.nextInt(200)
      val rows = (0 until n).map(i => (i.toLong, pool(rnd.nextInt(pool.length))))
      val buckets = Seq(2, 7, 64)(trial % 3)
      assert(twoPassRank(rows, buckets) === windowRank(rows),
        s"trial=$trial n=$n buckets=$buckets")
    }
  }

  test("withGlobalRank equals the window on distinct continuous keys") {
    val rows = (0 until 173).map(i =>
      (i.toLong, math.sin(i * 12.9898) * 43758.5453 % 13))
    assert(twoPassRank(rows, 16) === windowRank(rows))
  }

  test("minor tiebreak bucketing stays bit-identical to the window " +
    "under adversarial ties") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 50 + rnd.nextInt(250)
      // half the rows share ONE key value; the rest draw from 3 others
      val rows = (0 until n).map { i =>
        val k = if (rnd.nextBoolean()) 5.0d
                else Seq(-2.0d, 0.5d, 9.0d)(rnd.nextInt(3))
        (i.toLong, k)
      }
      val buckets = Seq(4, 16, 64)(trial % 3)
      assert(twoPassRank(rows, buckets, withMinor = true) ===
        windowRank(rows), s"trial=$trial n=$n buckets=$buckets")
    }
  }

  test("minor tiebreak splits a heavy tie class across buckets " +
    "(no bucket above ~2x the target share)") {
    // adversarial: 50% of rows carry the SAME key — without the minor
    // the whole class lands in ONE bucket; with it, bucket load must
    // stay near the uniform target
    val n = 4000
    val buckets = 16
    val rows = (0 until n).map(i =>
      (i.toLong, if (i % 2 == 0) 5.0d else (i % 37).toDouble))
    val df = rows.toDF("id", "k")
    val sizes = RankOps.bucketAssign(df, col("k"), Some(col("id")), buckets)
      .groupBy("_rk_b").count().collect().map(_.getLong(1))
    val maxShare = sizes.max.toDouble / n
    assert(maxShare <= 2.0 / buckets,
      s"max bucket share $maxShare exceeds 2x the ${1.0 / buckets} target")
    // and the no-minor form really does concentrate (the property the
    // fix exists for — guards against the test going vacuous)
    val noMinor = RankOps.bucketAssign(df, col("k"), None, buckets)
      .groupBy("_rk_b").count().collect().map(_.getLong(1))
    assert(noMinor.max.toDouble / n >= 0.5)
  }

  test("withGlobalRankAndCount: identical ranks plus the exact total on " +
    "every row — no second scan for a count(*) cross join") {
    val rnd = new scala.util.Random(11)
    val n = 137
    val rows = (0 until n).map(i =>
      (i.toLong, (rnd.nextInt(9) - 4).toDouble))
    val got = RankOps.withGlobalRankAndCount(rows.toDF("id", "k"),
        col("k"), Seq(col("id")), "r", "n_total", buckets = 7,
        minor = Some(col("id")))
      .select("id", "r", "n_total").collect()
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      windowRank(rows), "ranks must match the global window")
    assert(got.map(_.getLong(2)).toSet === Set(n.toLong),
      "every row carries the exact total")
  }

  test("ntileFromRank reproduces SQL ntile for every n % k class") {
    // n from k-1 (more tiles than rows) through several multiples
    for (k <- Seq(2, 4, 5, 7); n <- Seq(1, k - 1, k, k + 1, 3 * k + 2, 40)) {
      val df = spark.range(1, n + 1).toDF("r")
      val viaWindow = df
        .withColumn("q", ntile(k).over(Window.orderBy("r")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaRank = df.withColumn("q",
          RankOps.ntileFromRank(col("r"), lit(n.toLong), k))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaRank === viaWindow, s"n=$n k=$k")
    }
  }

  test("the only global window in a withGlobalRank plan runs over the " +
    "bounded offsets aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 97).cast("double").as("k"))
    val ranked = RankOps.withGlobalRank(df, col("k"), Seq(col("id")), "r")
    val globals = ranked.queryExecution.optimizedPlan.collect {
      case w: LW if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty)
    globals.foreach(w => assert(
      w.child.collectFirst { case a: Aggregate => a }.isDefined,
      "global window must sit on the per-bucket counts aggregate"))
  }

  test("withPartedRankAndCount: concatenated ranks recover each part's " +
    "window rank arithmetically, total count exact") {
    // heavy-tie pool per part, uneven values across parts — the
    // quality_metric_agreement shape (3 equal-sized metric blocks)
    val pool = Array(-3.5d, 0.0d, 0.0d, 0.25d, 7.0d)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 50 + rnd.nextInt(150)
      val rows = for {
        p <- 0L until 3L; i <- 0 until n
      } yield (p, i.toLong, pool(rnd.nextInt(pool.length)) * (p + 1))
      val df = rows.toDF("p", "id", "v")
      val buckets = Seq(2, 7, 64)(trial % 3)
      val got = RankOps.withPartedRankAndCount(df, col("p"), col("v"),
          Seq(col("id")), "r", "n3", buckets, minor = Some(col("id")))
        .select(col("p"), col("id"),
          (col("r") - col("p") * expr("n3 div 3")).as("pr"), col("n3"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val want = df.withColumn("pr", row_number()
          .over(Window.partitionBy("p").orderBy(col("v"), col("id")))
          .cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      assert(got.view.mapValues(_._1).toMap === want,
        s"trial $trial buckets=$buckets")
      assert(got.values.forall(_._2 === 3L * n), "n3 must be the total")
    }
  }
}
