package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Entity tags + tag groups (reference: src/minerva/directory/tag.py:1-6,
  * taggroup.py:1-5, and the link maintenance in
  * src/minerva/storage/attribute/tag.py — `tag_attributes` inserts
  * case-insensitively matched links that do not yet exist, `flush_tag_links`
  * deletes one tag's links). Tags scope entity sets: reference users select
  * the entities a report or aggregation runs over by tag.
  *
  * graft shape: ONE parquet link table `(tag_group, tag, entity_id)` under
  * `<base>/_tags`. The reference's surrogate tag ids exist only because SQL
  * link tables need keys; here the lowercased name IS the key (the
  * reference joins `lower(tag.name) = lower(tmp.tag)` anyway —
  * attribute/tag.py:24). Tag links are directory-scale (≤ entities ×
  * groups, ≪ trend data), so the idempotent insert's read-anti-join-append
  * and the flush's rewrite are control-plane work, and [[scope]] broadcasts
  * the selected entity set — a tag-scoped aggregation adds NO shuffle to
  * the plan it scopes. */
class TagDirectory(spark: SparkSession, basePath: String) {

  private def fs = graft.core.HadoopFs.forPath(spark, basePath)
  private def linkPath = new org.apache.hadoop.fs.Path(s"$basePath/_tags")

  private def emptyLinks: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("tag_group", StringType),
        StructField("tag", StringType), StructField("entity_id", LongType))))
  }

  /** All (tag_group, tag, entity_id) links; empty frame if never written. */
  def links: DataFrame = {
    val hasData = fs.exists(linkPath) && fs.listStatus(linkPath).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (hasData) spark.read.parquet(linkPath.toString)
      .select("tag_group", "tag", "entity_id")
    else emptyLinks
  }

  /** Idempotently add links (reference `tag_attributes`: the INSERT's
    * anti-join on the existing link table — attribute/tag.py:21-28). Tag
    * and group names are lowercased on write, the reference's
    * `lower(tag.name)` match baked into storage. Returns the number of
    * links actually added, so a replay is provably a no-op. */
  def tagEntities(newLinks: DataFrame): Long = {
    val normalized = newLinks.select(
        lower(col("tag_group")).as("tag_group"),
        lower(col("tag")).as("tag"),
        col("entity_id").cast("long").as("entity_id"))
      .distinct()
    val missing = normalized.join(
        links, Seq("tag_group", "tag", "entity_id"), "left_anti")
      .persist() // one anti-join serves both the count and the append
    val n = missing.count()
    if (n > 0)
      missing.write.mode(SaveMode.Append).parquet(linkPath.toString)
    missing.unpersist()
    n
  }

  /** COMPLEMENTARY-group retag (reference `TagGroup.complementary`,
    * directory/taggroup.py:1-5: a group whose tags are mutually
    * exclusive — an entity holds at most one). Inserting a link REPLACES
    * the entity's existing tag in that group; other groups are untouched.
    * Returns the number of entities whose tag actually changed (a replay
    * of the same links is a no-op, like [[tagEntities]]). Same staged
    * whole-table swap as [[flushTag]] — link tables are directory-scale. */
  def retagComplementary(newLinks: DataFrame): Long = {
    val normalized = newLinks.select(
        lower(col("tag_group")).as("tag_group"),
        lower(col("tag")).as("tag"),
        col("entity_id").cast("long").as("entity_id"))
      .distinct()
    // a batch assigning two tags to one entity within the group would
    // itself violate complementarity — refuse loudly (one directory-scale
    // aggregate, head(1) short-circuits)
    require(normalized.groupBy("tag_group", "entity_id")
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).head(1).isEmpty,
      "retagComplementary: batch assigns multiple tags to one entity " +
        "within a complementary group")
    val existing = links
    val changed = normalized.join(
        existing, Seq("tag_group", "tag", "entity_id"), "left_anti")
      .persist() // one anti-join serves the count and the rewrite
    val n = changed.count()
    if (n > 0) {
      // displaced = the group's old links for the re-tagged entities
      val kept = existing.join(
        changed.select("tag_group", "entity_id").distinct(),
        Seq("tag_group", "entity_id"), "left_anti")
      val staged = new org.apache.hadoop.fs.Path(s"$basePath/_tags.staged")
      fs.delete(staged, true)
      kept.unionByName(changed)
        .write.mode(SaveMode.Overwrite).parquet(staged.toString)
      fs.delete(linkPath, true)
      if (!fs.rename(staged, linkPath))
        throw new IllegalStateException(
          s"retagComplementary: rename $staged -> $linkPath failed")
    }
    changed.unpersist()
    n
  }

  /** Remove every link of one tag (reference `flush_tag_links`,
    * attribute/tag.py:63-77). Link tables are directory-scale, so the
    * staged rewrite-then-swap of the whole table is control-plane cost;
    * the swap keeps a crash from leaving a half-deleted directory. */
  def flushTag(tag: String): Unit = {
    val kept = links.filter(col("tag") =!= lower(lit(tag)))
    val staged = new org.apache.hadoop.fs.Path(s"$basePath/_tags.staged")
    fs.delete(staged, true)
    kept.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    fs.delete(linkPath, true)
    if (!fs.rename(staged, linkPath))
      throw new IllegalStateException(
        s"flushTag: rename $staged -> $linkPath failed")
  }

  // ---- metadata (attribute-definition) tags: the reference's
  // attribute_directory.attribute_tag_link keys on ATTRIBUTE ids
  // (storage/attribute/tag.py:11-36 — tagging column definitions, not
  // entities). graft attribute definitions are columns, so the NAME is
  // the key; same idempotent case-insensitive insert + per-tag flush
  // semantics, a parallel `_nametags` link table. ----

  private def namePath = new org.apache.hadoop.fs.Path(s"$basePath/_nametags")

  private def emptyNameLinks: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("tag", StringType),
        StructField("name", StringType))))
  }

  /** All (tag, name) metadata links; empty frame if never written. */
  def nameLinks: DataFrame = {
    val hasData = fs.exists(namePath) && fs.listStatus(namePath).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (hasData) spark.read.parquet(namePath.toString).select("tag", "name")
    else emptyNameLinks
  }

  /** Idempotently tag metadata names (attribute/trend definitions) —
    * `tag_attributes`' anti-join INSERT, attribute/tag.py:21-28. Tag is
    * lowercased (the reference's lower(tag.name) match); the NAME keeps
    * its case — it identifies a real column. */
  def tagNames(newLinks: DataFrame): Long = {
    val normalized = newLinks.select(
        lower(col("tag")).as("tag"), col("name").cast("string").as("name"))
      .distinct()
    val missing = normalized.join(nameLinks, Seq("tag", "name"), "left_anti")
      .persist()
    val n = missing.count()
    if (n > 0)
      missing.write.mode(SaveMode.Append).parquet(namePath.toString)
    missing.unpersist()
    n
  }

  /** Remove one metadata tag's links (`flush_tag_links`,
    * attribute/tag.py:63-77) — staged whole-table swap like [[flushTag]]. */
  def flushNameTag(tag: String): Unit = {
    val kept = nameLinks.filter(col("tag") =!= lower(lit(tag)))
    val staged = new org.apache.hadoop.fs.Path(s"$basePath/_nametags.staged")
    fs.delete(staged, true)
    kept.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    fs.delete(namePath, true)
    if (!fs.rename(staged, namePath))
      throw new IllegalStateException(
        s"flushNameTag: rename $staged -> $namePath failed")
  }

  /** The metadata names carrying `tag` — a bounded control-plane read
    * (tag links are catalog-sized): callers project a frame to the
    * tagged attribute columns, the reference's tag-scoped attribute
    * selection. */
  def namesWithTag(tag: String): Seq[String] =
    nameLinks.filter(col("tag") === lower(lit(tag)))
      .select("name").collect().map(_.getString(0)).toSeq.sorted

  /** The distinct entity set carrying `tag` (case-insensitive, like every
    * reference tag lookup). */
  def entitiesWithTag(tag: String): DataFrame =
    links.filter(col("tag") === lower(lit(tag)))
      .select("entity_id").distinct()

  /** Scope a frame to entities carrying `tag`: broadcast left-semi join —
    * the tag set is directory-scale, so scoping adds no shuffle to the
    * consuming plan (a 100 TB scan keeps its partitioning). */
  def scope(df: DataFrame, tag: String, entityCol: String): DataFrame =
    df.join(broadcast(entitiesWithTag(tag)),
      df(entityCol) === col("entity_id"), "left_semi")
}
