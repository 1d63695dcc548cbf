package graft

import graft.store.TableStore
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Direct contract tests for the versioned table store: pointer swaps,
  * segment appends, compaction, vacuum, and lock-serialized overwrites.
  */
class TableStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def mkStore(): (TableStore, java.nio.file.Path) = {
    val root = Files.createTempDirectory("graft_store")
    (new TableStore(spark, root.toString), root)
  }

  private def df(values: Long*) = {
    val sp = spark
    import sp.implicits._
    values.toDF("x")
  }

  test("overwrite swaps the pointer; readers see exactly one version") {
    val (store, root) = mkStore()
    assert(!store.exists("t") && store.readIfExists("t").isEmpty)
    store.overwrite("t", df(1, 2))
    assert(store.readIfExists("t").get.count() == 2)
    store.overwrite("t", df(9))
    assert(store.readIfExists("t").get.count() == 1)
    // superseded version still on disk until vacuum
    val versions = Files.list(root.resolve("t")).toArray.map(_.toString)
      .count(_.contains("/v_"))
    assert(versions == 2)
    store.vacuum("t")
    assert(Files.list(root.resolve("t")).toArray.map(_.toString)
      .count(_.contains("/v_")) == 1)
    assert(store.readIfExists("t").get.head().getLong(0) == 9L)
  }

  test("appends are visible segments; overwrite compacts them away") {
    val (store, root) = mkStore()
    store.append("log", df(1))
    store.append("log", df(2, 3))
    assert(store.exists("log"))
    assert(store.readIfExists("log").get.count() == 3)
    // compaction: read-all + overwrite folds segments into one version
    store.overwrite("log", store.readIfExists("log").get)
    assert(store.readIfExists("log").get.count() == 3)
    assert(Files.list(root.resolve("log")).toArray.map(_.toString)
      .count(_.contains("/seg_")) == 0)
  }

  test("append after overwrite unions with the current version") {
    val (store, _) = mkStore()
    store.overwrite("t", df(1))
    store.append("t", df(2))
    assert(store.readIfExists("t").get.collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L)))
  }

  test("withTableLock serializes read-modify-write cycles") {
    val (store, _) = mkStore()
    store.overwrite("c", df(0))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = (1 to 8).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = store.withTableLock("c") {
          val cur = store.readIfExists("c").get.count()
          store.overwrite("c", df((0L until cur + 1).toSeq: _*))
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // each cycle added exactly one row: no lost updates
    assert(store.readIfExists("c").get.count() == 9)
  }

  test("compact folds segments past the threshold, no-ops below it") {
    val (store, root) = mkStore()
    def segCount() = Files.list(root.resolve("log")).toArray.map(_.toString)
      .count(_.contains("/seg_"))
    (1 to 4).foreach(i => store.append("log", df(i.toLong)))
    assert(!store.compact("log", maxSegments = 8), "below threshold: no-op")
    assert(segCount() == 4)
    assert(store.compact("log", maxSegments = 3), "past threshold: folds")
    assert(segCount() == 0)
    assert(store.readIfExists("log").get.count() == 4)
    // appends after the fold land on top of the new base version
    store.append("log", df(9))
    assert(store.readIfExists("log").get.count() == 5)
    assert(store.compact("log", maxSegments = 0))
    assert(store.readIfExists("log").get.collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L, 4L, 9L)))
  }
}
