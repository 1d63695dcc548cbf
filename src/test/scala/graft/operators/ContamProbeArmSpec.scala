package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The gram-literal probe branches in [[ContamIndex]] (pushGramLits =
  * true: the getLong(0) literal extraction, the sorted slicing, the
  * keyFiltered evidence semi-join in recordTrainDf/decontaminate) can
  * never execute in ordinary unit runs — the 256 MB size gate is always
  * false on tiny test dirs — so a type or sort regression there would
  * only surface at production scale. This spec forces the branch via
  * the seam and pins ANSWER IDENTITY against the ungated scan arm on
  * the same inputs (r16 ADVICE item).
  */
class ContamProbeArmSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("contam_index: forced gram-literal probe arm answers identically " +
    "to the ungated scan arm (recordTrainDf + decontaminate)") {
    val sp = spark
    import sp.implicits._
    val boiler =
      "standard disclaimer all rights reserved contact support for details"
    val eval = (1 to 5).map(i =>
      (i.toLong, s"$boiler unique eval answer $i")).toDF("doc_id", "text")
    val corpus = (100 to 160).map(i =>
      (i.toLong, s"$boiler corpus document body number $i with words"))
      .toDF("doc_id", "text")
    // 10 boilerplate-only docs (survive once the corpus df lifts the
    // grams past the cap) + 1 real leak (must always drop)
    val batch = ((500 to 509).map(i =>
      (i.toLong, s"$boiler fresh training content row $i")) :+
      ((600L, s"$boiler unique eval answer 3"))).toDF("doc_id", "text")

    // the full gate sequence of the release loop: accrete, probe,
    // accrete a second distinct corpus, probe again
    def run(idx: String): (Seq[Long], Seq[Long]) = {
      ContamIndex.build(eval, idx)
      ContamIndex.recordTrainDf(corpus, idx)
      val s1 = ContamIndex.decontaminate(spark, batch, idx, dfCap = 50)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      ContamIndex.recordTrainDf(corpus.withColumn("text",
        concat(col("text"), lit(" second epoch tail"))), idx)
      val s2 = ContamIndex.decontaminate(spark, batch, idx, dfCap = 50)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      (s1, s2)
    }

    val idxA = java.nio.file.Files
      .createTempDirectory("graft_ct_arm_a").toString
    val idxB = java.nio.file.Files
      .createTempDirectory("graft_ct_arm_b").toString
    try {
      // arm 1: ungated — the size gate must DECLINE at toy scale (this
      // is the decision the committed bench walls ride on)
      val ungated = run(idxA)
      assert(!KeyProbe.literalsWorthIt(spark,
          ContamIndex.gramsWithData(spark, idxA).get),
        "a toy evidence dir must stay under the literal-collect gate")
      // arm 2: forced — the literal branches actually execute
      sys.props("graft.chunked.probe") = "force"
      val forced = try {
        assert(KeyProbe.literalsWorthIt(spark,
          ContamIndex.gramsWithData(spark, idxA).get))
        run(idxB)
      } finally { sys.props.remove("graft.chunked.probe"); () }
      assert(forced === ungated,
        "forced literal probes must answer exactly what the scan answers")
      // the fixture is sharp: boilerplate-only docs survive, the leak drops
      assert(ungated._2 === (500L to 509L).toSeq)
    } finally { rm(new java.io.File(idxA)); rm(new java.io.File(idxB)) }
  }
}
