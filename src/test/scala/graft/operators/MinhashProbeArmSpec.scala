package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Answer-identity pin for [[MinhashIndex.novelDocs]]'s two probe arms
  * (r17): under the size gate a toy index skips the literal and
  * partition-list collects and scans whole; the force seam runs the
  * full pruned apparatus (hp/bp partition lists, h/band/candidate-id
  * literal pushes, the `_ids` candidate-pruned read). Both arms must
  * return exactly the same novel set on a fixture that exercises every
  * tier: exact dups, near dups (one-word edits), and genuinely novel
  * docs, before and after an append.
  */
class MinhashProbeArmSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("novelDocs: forced pruned arm answers exactly what the ungated " +
    "scan arm answers — exact tier, band tier, and post-append") {
    val sp = spark
    import sp.implicits._
    def text(tag: String, i: Int) =
      (1 to 25).map(j => s"${tag}w${i}tok$j").mkString(" ")
    val corpus = (1 to 120).map(i => (i.toLong, text("corp", i)))
      .toDF("doc_id", "text")
    // probe: 40 exact dups, 30 near dups (last token changed), 30 novel
    val probe = (
      (1 to 40).map(i => (1000L + i, text("corp", i))) ++
      (41 to 70).map(i => (2000L + i,
        text("corp", i).split(" ").dropRight(1).mkString(" ") + " tailX")) ++
      (1 to 30).map(i => (3000L + i, text("fresh", i)))
    ).toDF("doc_id", "text")

    def run(idx: String): (Seq[Long], Seq[Long]) = {
      MinhashIndex.build(corpus, idx)
      val r1 = MinhashIndex.novelDocs(spark, probe, idx)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // append the survivors' docs, then a mixed replay must resolve
      // identically too (exact tier now covers the appended content)
      MinhashIndex.append(
        (1 to 30).map(i => (3000L + i, text("fresh", i)))
          .toDF("doc_id", "text"), idx)
      val r2 = MinhashIndex.novelDocs(spark,
        probe.unionByName(Seq((5000L, text("fresh2", 1)))
          .toDF("doc_id", "text")), idx)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      (r1, r2)
    }

    val idxA = java.nio.file.Files
      .createTempDirectory("graft_mh_arm_a").toString
    val idxB = java.nio.file.Files
      .createTempDirectory("graft_mh_arm_b").toString
    try {
      val ungated = run(idxA) // toy index: the gate declines the apparatus
      sys.props("graft.chunked.probe") = "force"
      val forced = try run(idxB)
        finally { sys.props.remove("graft.chunked.probe"); () }
      assert(forced === ungated,
        "pruned and scan arms must answer identically")
      // fixture is sharp: exact + near dups drop, novel survives; after
      // the append only the one new doc is novel
      assert(ungated._1.forall(_ >= 3000L))
      assert(ungated._1.size === 30)
      assert(ungated._2 === Seq(5000L))
    } finally { rm(new java.io.File(idxA)); rm(new java.io.File(idxB)) }
  }
}
