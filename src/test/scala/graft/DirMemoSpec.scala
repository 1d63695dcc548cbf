package graft

import graft.queries.DirMemo
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the session-keyed per-dir memo behind the
  * dup-cluster label frame and the recall family's brute-force ground
  * truth: compute-once per (session, kind, dir), explicit fresh-replace
  * for bench visibility, and eviction so long-running services never pin
  * frames for the JVM lifetime.
  */
class DirMemoSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("getOrCompute computes once per (kind, dir) and serves the hit") {
    DirMemo.clear()
    var computes = 0
    def frame = { computes += 1; spark.range(3).toDF("id") }
    val a = DirMemo.getOrCompute("k1", spark, "/d1")(frame)
    val b = DirMemo.getOrCompute("k1", spark, "/d1")(frame)
    assert(computes === 1)
    assert(a eq b)
    // a different kind or dir is an independent entry
    DirMemo.getOrCompute("k2", spark, "/d1")(frame)
    DirMemo.getOrCompute("k1", spark, "/d2")(frame)
    assert(computes === 3)
  }

  test("sibling sessions sharing one context never share memo hits") {
    DirMemo.clear()
    var computes = 0
    def frame(s: org.apache.spark.sql.SparkSession) = {
      computes += 1; s.range(3).toDF("id")
    }
    val owner = spark
    val a = DirMemo.getOrCompute("k", owner, "/d")(frame(owner))
    // a DataFrame is resolved against the session that built it (conf,
    // registrations) — a sibling via newSession must MISS and recompute
    val sibling = owner.newSession()
    val b = DirMemo.getOrCompute("k", sibling, "/d")(frame(sibling))
    assert(computes === 2)
    assert(!(a eq b))
    assert(b.sparkSession eq sibling, "hit must belong to the caller's session")
    // and each session still serves its own cached frame
    assert(DirMemo.getOrCompute("k", owner, "/d")(fail("hit expected")) eq a)
    DirMemo.clear()
  }

  test("putFresh replaces the cached entry") {
    DirMemo.clear()
    val stale = DirMemo.getOrCompute("k", spark, "/d")(spark.range(1).toDF("id"))
    val fresh = DirMemo.putFresh("k", spark, "/d", spark.range(2).toDF("id"))
    val served = DirMemo.getOrCompute("k", spark, "/d")(
      fail("fresh entry must be served, not recomputed"))
    assert(served eq fresh)
    assert(!(served eq stale))
  }

  test("invalidate and clear evict entries") {
    DirMemo.clear()
    DirMemo.getOrCompute("k", spark, "/d")(spark.range(1).toDF("id"))
    assert(DirMemo.size === 1)
    DirMemo.invalidate("k", spark, "/d")
    assert(DirMemo.size === 0)
    var computes = 0
    DirMemo.getOrCompute("k", spark, "/d")({ computes += 1; spark.range(1).toDF("id") })
    assert(computes === 1)
    DirMemo.clear()
    assert(DirMemo.size === 0)
  }
}
