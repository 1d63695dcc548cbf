package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[KeyProbe.keyFiltered]]'s decision table: the probe-side
  * literal filter must push a single In under the cap, must NOT escalate
  * to sliced unions against a small table (the measured 1.8× wall
  * regression at toy sizes — see `bulk_probe_chunked_ab_r16` in the
  * bench ledger), and must never change answers either way.
  */
class KeyProbeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("keyFiltered: single In under the cap filters; over-cap against " +
    "a small dir falls back to the unfiltered frame (cost gate)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kp").toString
    val df0 = (1 to 1000).map(i => s"k$i").toDF("k")
    df0.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // under the cap: the literals restrict the scan
    val some = KeyProbe.keyFiltered(df, "k", Seq("k1", "k2", "kxx"), dir)
    assert(some.count() === 2L)
    // over the cap (> MaxKeyLiterals sorted literals) against a tiny
    // table: the gate declines the sliced escalation — the frame comes
    // back unfiltered (the caller's partition pruning still applies),
    // which is correct (a superset) and wall-cheaper at this size
    val big = (1 to KeyProbe.MaxKeyLiterals + 5)
      .map(i => f"k$i%07d").sorted.map(_.asInstanceOf[Any])
    val gated = KeyProbe.keyFiltered(df, "k", big, dir)
    assert(gated.count() === 1000L,
      "over-cap literals against a small dir must fall back to the " +
        "unfiltered scan, not a sliced union")
    // the sliced path itself (inSlices) is answer-preserving: slices
    // partition the literal set, so no row matches twice and none is
    // dropped — k1..k1000 zero-padded to 7 digits are all inside `big`
    val sliced = KeyProbe.inSlices(df.select(
      format_string("k%07d",
        regexp_extract(col("k"), "\\d+", 0).cast("int")).as("k")),
      "k", big)
    assert(sliced.count() === 1000L)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
