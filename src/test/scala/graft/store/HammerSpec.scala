package graft.store

import graft.SparkSpec
import org.apache.spark.sql.types.LongType

import java.nio.file.Files

/** Regression guard for the StorePath atomic-replace discipline: the
  * Hadoop local layer refuses replacing renames and its FileContext
  * OVERWRITE is delete-then-rename, so a naive port makes meta.json
  * transiently vanish under concurrent readers (and a stat-then-open
  * read can straddle a swap and return torn JSON). This hammers 2000
  * meta swaps against 4 spinning readers and requires zero misses.
  */
class HammerSpec extends SparkSpec {
  test("concurrent meta swap never loses visibility or tears") {
    val cat = new Catalog(Files.createTempDirectory("graft-hammer").toString)
    cat.createCollection(CollectionDef("h", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true)))): Unit
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val firstMiss = new java.util.concurrent.atomic.AtomicReference[String]()
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try { cat.describeCollection("h"); () }
          catch {
            case e: Exception =>
              misses.incrementAndGet()
              firstMiss.compareAndSet(null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
          }
        }
      })
    }
    readers.foreach(_.start())
    (0 until 2000).foreach(_ => cat.nextSeq("h"))
    stop.set(true)
    readers.foreach(_.join())
    assert(misses.get() == 0,
      s"${misses.get()} reader misses; first: ${firstMiss.get()}")
  }
}
