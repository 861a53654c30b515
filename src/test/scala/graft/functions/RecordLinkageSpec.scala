package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocking-algebra properties: the union-of-passes recall mechanism,
  * pair dedup, and null-key semantics. */
class RecordLinkageSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  private val left = Seq(
    (1L, "n1", 10L), (2L, "n1", 20L), (3L, "n2", 30L)
  ).toDF("lid", "blk_a", "blk_b")
  private val right = Seq(
    (101L, "n1", 10L),  // found by both passes for lid=1
    (102L, "nX", 20L),  // pass-a key perturbed: ONLY pass b finds it
    (103L, "n2", 99L)   // pass-b key perturbed: ONLY pass a finds it
  ).toDF("rid", "blk_a", "blk_b")

  private def pairsOf(keys: Seq[(String, String)]) =
    RecordLinkage.blockedPairs(left, right, "lid", "rid", keys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a single pass misses key-perturbed pairs; the union recovers them") {
    val aOnly = pairsOf(Seq("blk_a" -> "blk_a"))
    assert(!aOnly.contains((2L, 102L)), "perturbed key must miss in pass a")
    val bOnly = pairsOf(Seq("blk_b" -> "blk_b"))
    assert(!bOnly.contains((3L, 103L)), "perturbed key must miss in pass b")
    val union = pairsOf(Seq("blk_a" -> "blk_a", "blk_b" -> "blk_b"))
    assert(union.contains((2L, 102L)) && union.contains((3L, 103L)))
    assert(union == aOnly ++ bOnly, "union pass = union of single passes")
  }

  test("a pair surfaced by several passes counts once") {
    val df = RecordLinkage.blockedPairs(left, right, "lid", "rid",
      Seq("blk_a" -> "blk_a", "blk_b" -> "blk_b"))
    assert(df.count() == df.distinct().count())
    // lid=1/rid=101 matches on both keys yet appears once
    assert(df.filter(col("lid") === 1 && col("rid") === 101).count() == 1)
  }

  test("null blocking keys never pair") {
    val l = Seq((1L, null.asInstanceOf[String])).toDF("lid", "k")
    val r = Seq((2L, null.asInstanceOf[String])).toDF("rid", "k")
    assert(RecordLinkage.blockedPairs(l, r, "lid", "rid",
      Seq("k" -> "k")).isEmpty)
  }
}
