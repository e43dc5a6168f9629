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
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in one testdata
    * generation and TIMESTAMP(MICROS, isAdjustedToUTC=false) in another, so
    * the reader branches on the type it actually gets:
    *   - LongType (nanos surfaced via the legacy nanos-as-long conf, which
    *     is a no-op for non-nanos columns): truncate to micros with integer
    *     division — exactly what DuckDB does reading the same file.
    *   - TIMESTAMP_NTZ (micros, no zone): cast to TIMESTAMP; all engine
    *     sessions run with session timeZone=UTC, so the wall-clock value is
    *     read as the same UTC instant DuckDB sees.
    *   - TIMESTAMP: pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      // any other shape must fail HERE, not produce silent NULLs/garbage
      // downstream (SchemaContractSpec pins the accepted three)
      case other => sys.error(s"events.ts has unsupported type $other — extend Tables.events")
    }
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
