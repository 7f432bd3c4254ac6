package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class JdbcSinkSpec extends AnyFunSuite {

  test("jdbc options carry the tuning surface") {
    val opts = JdbcSink.jdbcOptions(JdbcSink.Spec(
      url = "jdbc:postgresql://h/db", table = "t", user = "u",
      password = "p"))
    assert(opts("url").contains("reWriteBatchedInserts=true"))
    assert(opts("numPartitions") === "8")   // -po default (pl:166)
    assert(opts("truncate") === "true")
    assert(opts("sessionInitStatement").contains("synchronous_commit"))
  }

  test("non-postgres url is not rewritten; durability opt-out") {
    val opts = JdbcSink.jdbcOptions(JdbcSink.Spec(
      url = "jdbc:sqlserver://h", table = "t", user = "u", password = "p",
      relaxDurability = false))
    assert(!opts("url").contains("reWriteBatchedInserts"))
    assert(!opts.contains("sessionInitStatement"))
  }

  test("P12: batch failure degrades to per-row replay, counts rejects") {
    val written = mutable.Buffer[Int]()
    val rejected = JdbcSink.writeIgnoringErrors(
      Iterator(1, 2, 3, 4, 5, 6), batchSize = 3) { batch =>
      if (batch.contains(5)) throw new RuntimeException("batch poison")
      written ++= batch
    } { row =>
      if (row == 5) throw new RuntimeException("row poison")
      written += row
    }
    // first batch (1,2,3) succeeds wholesale; second batch fails →
    // replayed row-at-a-time, only 5 rejected
    assert(written.toSeq === Seq(1, 2, 3, 4, 6))
    assert(rejected === 1L)
  }

  test("P12: all-good input never touches the row path") {
    var rowCalls = 0
    val rejected = JdbcSink.writeIgnoringErrors(
      Iterator(1, 2, 3), batchSize = 2)(_ => ())(_ => rowCalls += 1)
    assert(rejected === 0L && rowCalls === 0)
  }
}
