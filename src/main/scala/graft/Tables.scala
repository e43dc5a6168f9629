package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned readers for the driver-generated testdata tables.
  *
  * Every operator in the library takes `DataFrame`s, so these readers are
  * the only place that knows about file layout. Paths are parquet files or
  * directories — at cluster scale these would be partitioned table roots;
  * the reader code is identical.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as raw long (legacy conf) and truncate to micros
    * with integer division — exactly what DuckDB does when it reads the
    * same file into its microsecond timestamps, so the two engines agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  /** Register every table as a temp view (plus [[GraftExtensions.register]]
    * for the functions) so the full engine is drivable from `spark.sql`.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region" -> region _, "nation" -> nation _, "customer" -> customer _,
      "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
      "lineitem" -> lineitem _, "events" -> events _,
      "documents" -> documents _, "embeddings" -> embeddings _)
      .foreach { case (name, rd) =>
        // only "path does not exist" is tolerated (table absent at this
        // SF); any other analysis error must surface, not silently skip
        try rd(spark, dir).createOrReplaceTempView(name)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition != null && e.getCondition.startsWith("PATH_NOT_FOUND") => ()
        }
      }
    GraftExtensions.register(spark)
  }
}
