package graft

import graft.queries.TrainingData
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-management operators (the value-level
  * gate is the DuckDB oracle in SparkEntry.oracleSql; these pin the
  * structural properties a refactor could silently break).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("split_train_val: buckets partition the corpus, roughly 80/10/10") {
    val rows = TrainingData.splitTrainVal(spark, sf).collect()
    val bySplit = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit.values.sum === 500L)
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("sample_stratified: every stratum reported, rate near 1/10") {
    val rows = TrainingData.sampleStratified(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val sampled = rows.map(_.getLong(2)).sum
    assert(total === 500L)
    // hash-uniform 1-in-10 over 500 docs: generous band, determinism is the point
    assert(sampled > 20 && sampled < 80)
    // deterministic: a second run is identical
    assert(TrainingData.sampleStratified(spark, sf).collect().toSeq === rows.toSeq)
  }

  test("text_ngrams: exactly top-20, ordered by df desc then ngram") {
    val rows = TrainingData.textNgrams(spark, sf).collect()
    assert(rows.length === 20)
    val dfs = rows.map(_.getLong(1)).toSeq
    assert(dfs === dfs.sortBy(-_))
    assert(rows.forall(_.getString(0).split(" ").length === 2))
  }

  test("dedup_simhash_md5: one pair per consecutive id, sane hamming range") {
    val Array(r) = TrainingData.dedupSimhashMd5(spark, sf).collect()
    assert(r.getLong(0) === 499L) // 500 docs -> 499 consecutive pairs
    assert(r.getLong(1) <= r.getLong(2)) // within_8 <= within_16
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 60L)
  }

  test("dup_clusters: every cluster has >= 2 docs; counts consistent") {
    val Array(r) = TrainingData.dupClusters(spark, sf).collect()
    val (n, docs, maxSz) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0L, "testdata contains near-dup groups")
    assert(docs >= 2 * n, "a cluster is at least a pair")
    assert(maxSz >= 2L && maxSz <= docs)
  }

  test("dup_clusters agrees with pairwise LSH counts: clustered docs cover pairs") {
    // verified_pairs from the pairwise operator vs docs-in-clusters from the
    // component view: v pairs over c components of sizes s_i satisfy
    // sum(s_i) <= 2v (each doc in a cluster touches >= 1 pair)
    val Array(lsh) = TrainingData.dedupMinhashLsh(spark, sf).collect()
    val Array(cc) = TrainingData.dupClusters(spark, sf).collect()
    assert(cc.getLong(1) <= 2 * lsh.getLong(1))
  }
}
