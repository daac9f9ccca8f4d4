package graft.chat

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table sinks covering the reference's storage surface
  * (SURVEY.md §2.1 S5–S11): `whatsapp_messages`, `users`,
  * `research_configs`. The reference's per-row INSERT round trips
  * (backend/main.py:380-387) become batched columnar appends; its MySQL/
  * Mongo split (a bug as committed, SURVEY §1.7) becomes three uniform
  * tables.
  *
  * Point mutations are expressed as the standard lakehouse rewrites:
  * upsert = anti-join old ∪ new, delete = anti-join — both shuffle-free
  * when the key side is broadcast.
  */
object ChatStore {

  /** S5: ingest a chat file through the upload dialect into
    * `whatsapp_messages(group_name, date_time, sender, message)`.
    * Returns the inserted-row count (A3).
    */
  def uploadChat(spark: SparkSession, chatPath: String, tableDir: String): Long = {
    val rows = ChatParser.uploadDialect(ChatLines.read(spark, chatPath))
      .select("group_name", "date_time", "sender", "message")
    // count THIS batch (the reference's inserted_rows counter), not the
    // cumulative table after append
    val inserted = rows.count()
    rows.write.mode(SaveMode.Append).parquet(tableDir)
    inserted
  }

  /** S6: research-config insert with a server-side created_at stamp. */
  def saveResearchConfig(config: DataFrame, tableDir: String): Unit =
    config
      .withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(tableDir)

  /** S7: user insert with generated uuid ids; F8: reject rows whose email
    * already exists (left_anti against the current table).
    */
  def registerUsers(spark: SparkSession, newUsers: DataFrame, tableDir: String): Long = {
    val existing = currentOrEmpty(spark, tableDir)
    // F8 also holds within a batch: one row per email (reference inserts
    // one at a time, so a duplicate in the same batch would be rejected)
    val batch = newUsers.dropDuplicates("email")
    val fresh = (if (existing.isEmpty) batch
                 else batch.join(broadcast(existing.select("email")), Seq("email"), "left_anti"))
      .withColumn("user_id", expr("uuid()"))
    fresh.write.mode(SaveMode.Append).parquet(tableDir)
    fresh.count()
  }

  /** S8: point lookup. */
  def findByEmail(spark: SparkSession, tableDir: String, email: String): DataFrame =
    spark.read.parquet(tableDir).filter(col("email") === email).limit(1)

  /** S9: point update — non-null new fields win (coalesce merge), the rest
    * of the table passes through. Rewrites the table (copy-on-write).
    */
  def updateUser(spark: SparkSession, tableDir: String, userId: String,
      fields: Map[String, String]): Unit = {
    val cur = spark.read.parquet(tableDir)
    val updated = cur.columns.foldLeft(cur) { (df, c) =>
      fields.get(c) match {
        case Some(v) =>
          // keep the column's type: a bare string literal would coerce the
          // whole column (and the rewritten table) to StringType
          val typed = lit(v).cast(cur.schema(c).dataType)
          df.withColumn(c, when(col("user_id") === userId, typed).otherwise(col(c)))
        case None => df
      }
    }
    overwrite(updated, tableDir)
  }

  /** S10: point delete (anti-join rewrite). */
  def deleteUser(spark: SparkSession, tableDir: String, userId: String): Unit =
    overwrite(spark.read.parquet(tableDir).filter(col("user_id") =!= userId), tableDir)

  /** S11: capped scan with projection. */
  def listUsers(spark: SparkSession, tableDir: String, n: Int = 100): DataFrame =
    spark.read.parquet(tableDir).select("user_id", "name", "email").limit(n)

  private def currentOrEmpty(spark: SparkSession, tableDir: String): DataFrame =
    if (new java.io.File(tableDir).exists()) spark.read.parquet(tableDir)
    else spark.emptyDataFrame

  /** Copy-on-write table rewrite: stage the new version beside the table,
    * then swap directories. Distributed end to end (no driver collect) —
    * the lakehouse-table pattern these point ops compile to at scale.
    */
  private def overwrite(df: DataFrame, tableDir: String): Unit = {
    val stage = tableDir + ".staging"
    val old = tableDir + ".old"
    df.write.mode(SaveMode.Overwrite).parquet(stage)
    val fs = java.nio.file.Paths.get(tableDir)
    val oldP = java.nio.file.Paths.get(old)
    deleteRecursive(oldP)
    java.nio.file.Files.move(fs, oldP)
    java.nio.file.Files.move(java.nio.file.Paths.get(stage), fs)
    deleteRecursive(oldP)
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
}
