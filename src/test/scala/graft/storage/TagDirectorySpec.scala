package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity tags (reference directory/tag.py, taggroup.py, attribute/tag.py):
  * idempotent case-insensitive inserts, per-tag flush, complementary-group
  * replacement, and broadcast-semi scoping. */
class TagDirectorySpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): TagDirectory = {
    val base = s"target/tmp/tagdir_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    new TagDirectory(spark, base)
  }

  test("tagEntities is case-insensitive idempotent; flushTag removes one tag") {
    val td = fresh("basic")
    val l1 = Seq(("Grp", "Red", 1L), ("grp", "red", 2L), ("grp", "blue", 3L))
      .toDF("tag_group", "tag", "entity_id")
    assert(td.tagEntities(l1) == 3L)
    // replay under different casing adds nothing
    assert(td.tagEntities(l1.withColumn("tag", upper(col("tag")))) == 0L)
    assert(td.links.count() == 3L)
    assert(td.entitiesWithTag("RED").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
    td.flushTag("red")
    assert(td.entitiesWithTag("red").isEmpty)
    assert(td.links.count() == 1L) // blue survives
  }

  test("retagComplementary replaces within the group, leaves others; " +
      "multi-tag batch refused") {
    val td = fresh("compl")
    td.tagEntities(Seq(
      ("seg", "a", 1L), ("seg", "a", 2L), ("seg", "b", 3L),
      ("other", "x", 1L)).toDF("tag_group", "tag", "entity_id"))
    val mv = Seq(("seg", "c", 1L)).toDF("tag_group", "tag", "entity_id")
    assert(td.retagComplementary(mv) == 1L)
    assert(td.retagComplementary(mv) == 0L) // replay no-op
    val segTags = td.links.filter(col("tag_group") === "seg")
      .collect().map(r => r.getLong(2) -> r.getString(1)).toMap
    assert(segTags == Map(1L -> "c", 2L -> "a", 3L -> "b"))
    // the other group's link for entity 1 is untouched
    assert(td.links.filter(col("tag_group") === "other").count() == 1L)
    val bad = Seq(("seg", "p", 9L), ("seg", "q", 9L))
      .toDF("tag_group", "tag", "entity_id")
    intercept[IllegalArgumentException] { td.retagComplementary(bad) }
  }

  test("tagNames: metadata links are case-insensitive idempotent on the " +
      "tag, name-preserving, flushable") {
    val td = fresh("names")
    assert(td.tagNames(Seq(("KPI", "Weight"), ("kpi", "temp"),
      ("meta", "notes")).toDF("tag", "name")) == 3L)
    // replay under different tag casing adds nothing; name case matters
    assert(td.tagNames(Seq(("Kpi", "Weight")).toDF("tag", "name")) == 0L)
    assert(td.tagNames(Seq(("kpi", "weight")).toDF("tag", "name")) == 1L)
    assert(td.namesWithTag("KPI") == Seq("Weight", "temp", "weight"))
    td.flushNameTag("kpi")
    assert(td.namesWithTag("kpi").isEmpty)
    assert(td.namesWithTag("meta") == Seq("notes")) // other tags survive
  }

  test("mid-swap crash (live missing, aside present) recovers on next read") {
    val td = fresh("crash")
    td.tagEntities(Seq(("g", "red", 1L), ("g", "blue", 2L))
      .toDF("tag_group", "tag", "entity_id"))
    val base = "target/tmp/tagdir_crash"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$base/_tags")
    val aside = new org.apache.hadoop.fs.Path(s"$base/._tags_aside")
    val staged = new org.apache.hadoop.fs.Path(s"$base/_tags.staged")
    // simulate a crash between the two swap renames: live moved aside,
    // the staged replacement still sitting there
    assert(fs.rename(live, aside))
    fs.mkdirs(staged)
    // the old shape read this state as an EMPTY table (total tag loss);
    // recovery must restore the aside and drop the stale staged dir
    // (no live table + no lease ⇒ the read takes the lease and recovers)
    assert(td.links.count() == 2L)
    assert(!fs.exists(aside) && !fs.exists(staged))
    // crash AFTER swap-in (aside present WITH a live dir): the aside is
    // stale, but a READ must not mutate (r18: a lease-free read deleting
    // dirs raced concurrent writers' swaps) — it reads live and leaves
    // the aside for the next LEASED write's recoverTable to drop
    fs.mkdirs(aside)
    assert(td.entitiesWithTag("red").count() == 1L)
    assert(fs.exists(aside)) // read left it alone
    td.tagEntities(Seq(("g", "green", 3L)).toDF("tag_group", "tag", "entity_id"))
    assert(!fs.exists(aside)) // the write's under-lease recovery dropped it
  }

  test("reader mid-swap (lease held, live missing) sees the pre-swap " +
      "aside snapshot, not an empty table — and does not touch the dirs") {
    val td = fresh("midswap")
    td.tagEntities(Seq(("g", "red", 1L), ("g", "blue", 2L))
      .toDF("tag_group", "tag", "entity_id"))
    val base = "target/tmp/tagdir_midswap"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$base/_tags")
    val aside = new org.apache.hadoop.fs.Path(s"$base/._tags_aside")
    val staged = new org.apache.hadoop.fs.Path(s"$base/_tags.staged")
    val lease = new org.apache.hadoop.fs.Path(s"$base/._tags__lease")
    // freeze a writer exactly between swapIn's two renames: live is
    // aside, the staged replacement exists, the lease is HELD
    assert(fs.rename(live, aside))
    fs.mkdirs(staged)
    fs.create(lease, false).close()
    assert(td.links.count() == 2L)     // the aside snapshot, not empty
    assert(fs.exists(aside) && fs.exists(staged)) // reader touched nothing
    // writer completes: staged becomes live; reads switch to it
    assert(fs.rename(staged, live))
    fs.delete(aside, true)
    fs.delete(lease, false)
    assert(td.links.count() == 0L)     // staged was an empty dir
  }

  test("writer lease: a held lease refuses a second writer loudly") {
    val td = fresh("lease")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(
      "target/tmp/tagdir_lease/._tags__lease")
    fs.mkdirs(lease.getParent)
    fs.create(lease, false).close() // another writer holds the table
    intercept[graft.core.ConcurrentWriterException] {
      td.tagEntities(Seq(("g", "t", 1L)).toDF("tag_group", "tag", "entity_id"))
    }
    fs.delete(lease, false)
    assert(td.tagEntities(Seq(("g", "t", 1L))
      .toDF("tag_group", "tag", "entity_id")) == 1L)
  }

  test("scope binds to the tag side even when the frame has its own " +
      "entity_id column") {
    val td = fresh("scope_amb")
    td.tagEntities(Seq(("g", "keep", 1L)).toDF("tag_group", "tag", "entity_id"))
    // frame carries an entity_id column DIFFERENT from the scoping column —
    // an unqualified entity_id in the join condition would bind to it
    val facts = Seq((1L, 999L, 10.0), (2L, 1L, 20.0))
      .toDF("ent", "entity_id", "v")
    val scoped = td.scope(facts, "keep", "ent")
    assert(scoped.select("v").as[Double].collect().toSeq == Seq(10.0))
  }

  test("scope is a broadcast left-semi keeping only tagged entities") {
    val td = fresh("scope")
    td.tagEntities(Seq(("g", "keep", 1L), ("g", "keep", 3L))
      .toDF("tag_group", "tag", "entity_id"))
    val facts = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (1L, 40.0))
      .toDF("ent", "v")
    val scoped = td.scope(facts, "KEEP", "ent")
    assert(scoped.agg(sum("v")).head.getDouble(0) == 80.0)
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"scope should be a broadcast left-semi:\n$plan")
  }
}
