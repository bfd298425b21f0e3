package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one Parquet file per table:
  * region nation customer supplier part orders lineitem events documents
  * embeddings. At 100 TB these would be partitioned directories; the
  * loader API is path-based so nothing changes but the path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  /** The vector queries and the native vec_dot expression require
    * array<float>; pin the dtype here (a no-op cast today) so a driver
    * testdata regeneration to array<double> — the same class of silent
    * shift that broke the events timestamp in round 6 — degrades to a
    * cast instead of breaking all eight vector queries. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case t: org.apache.spark.sql.types.ArrayType
        if t.elementType == org.apache.spark.sql.types.FloatType => raw
      case _ => raw.withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
    }
  }
}
