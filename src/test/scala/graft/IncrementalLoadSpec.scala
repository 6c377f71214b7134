package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** W3 end-to-end incremental: streamed foreachBatch merge must land the
  * same table state as the batch LWW over all events. */
class IncrementalLoadSpec extends AnyFunSuite with SparkTestBase {

  test("incremental load == batch LWW state per user") {
    val sfDir = "/root/testdata/sf0.001"
    val table = Files.createTempDirectory("graft_incr").toString + "/user_state"

    graft.streaming.Streams.incrementalLoad(spark, sfDir, table,
      keys = Seq("user_id"), recency = Seq("ts"), tieBreak = Seq("event_id"))

    val streamed = spark.read.parquet(table)
      .select("user_id", "event_id", "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val batch = Merge.latestByKeyAgg(graft.io.Tables.events(spark, sfDir),
        Seq("user_id"), Seq("ts"), Seq("event_id"))
      .select("user_id", "event_id", "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
