package graft.ops

import graft.TestSpark
import graft.streaming.Streams
import org.scalatest.funsuite.AnyFunSuite

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd1Apply resolves latest version, drops pre-images, applies deletes") {
    val changes = Seq(
      // key 1: insert then update — latest wins
      (1L, 1L, "insert", "a-v1"),
      (1L, 3L, "update_postimage", "a-v3"),
      (1L, 3L, "update_preimage", "a-v2-pre"), // never applies
      // key 2: latest change is a delete — key suppressed
      (2L, 1L, "insert", "b-v1"),
      (2L, 2L, "delete", null),
      // key 3: delete then REINSERT at a higher version — key lives
      (3L, 1L, "delete", null),
      (3L, 2L, "insert", "c-v2"))
      .toDF("k", "_commit_version", "_change_type", "payload")
    val out = Streams.scd1Apply(changes, Seq("k"))
      .select("k", "_commit_version", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 3L, "a-v3"), (3L, 2L, "c-v2")))
  }
}
