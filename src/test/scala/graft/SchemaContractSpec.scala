package graft

import org.apache.spark.sql.types._

/** Pins the logical types the engine depends on in the driver-generated
  * testdata. The driver regenerates /root/testdata between rounds and has
  * already changed `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * once, silently breaking every events-based query; this suite makes the
  * next such change fail in ONE obvious place instead of 150 downstream
  * specs.
  */
class SchemaContractSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    spark.read.parquet(s"$sfDir/$name.parquet").schema
      .fields.map(f => f.name -> f.dataType).toMap

  test("events: raw parquet types are a shape Tables.events understands") {
    // the raw file may carry ts as long (nanos), timestamp, or timestamp_ntz
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val f = fields("events")
    assert(f("event_id") === LongType)
    assert(f("user_id") === LongType)
    assert(f("event_type") === StringType)
    assert(f("value") === DoubleType)
    assert(f("props") === StringType)
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(f("ts")),
      s"events.ts has unhandled type ${f("ts")} — extend Tables.events")
  }

  test("events: Tables.events normalizes ts to TIMESTAMP") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType === TimestampType)
    // and the projection actually executes (the r04 break was analysis-time)
    assert(df.limit(1).count() === 1L)
  }

  test("documents: columns the text/dedup/pipeline operators read") {
    val f = fields("documents")
    assert(f("doc_id") === LongType)
    assert(f("text") === StringType)
    assert(f("lang") === StringType)
    assert(f("source") === StringType)
    assert(f("n_chars") === LongType)
  }

  test("embeddings: float vector column the ANN/cluster operators read") {
    val f = fields("embeddings")
    assert(f("vec_id") === LongType)
    assert(f("label") === IntegerType)
    assert(f("embedding") === ArrayType(FloatType, containsNull = true) ||
      f("embedding") === ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding has unhandled type ${f("embedding")}")
    // every operator assumes a fixed 64-dim embedding
    val dims = Tables.embeddings(spark, sfDir)
      .selectExpr("size(embedding) as d").distinct().collect().map(_.getInt(0)).toSet
    assert(dims === Set(64), s"embedding dims: $dims")
  }

  test("tpch tables: key columns present with expected types") {
    val li = fields("lineitem")
    assert(li("l_orderkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_returnflag") === StringType)
    val o = fields("orders")
    assert(o("o_orderkey") === LongType)
    assert(o("o_custkey") === LongType)
  }
}
