package graft

import org.apache.spark.sql.types._

/** Fixture-drift tripwire. The driver regenerates /root/testdata between
  * rounds and has already changed column dtypes in place once
  * (events.ts: timestamp[ns] → timestamp[us], which silently broke all
  * 30 events-dependent keys in round 8). This suite pins the RAW loaded
  * dtype of every fixture column the engine branches on, plus the
  * normalized contract [[T.events]] promises downstream, so the next
  * shape-flip fails ONE named assertion with a readable message instead
  * of 30 keys at analysis time.
  */
class SchemaProbeSpec extends SparkSpec {

  private def raw(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  private def assertType(table: String, column: String, dt: DataType,
                         allowed: Set[DataType]): Unit =
    assert(allowed.contains(dt),
      s"FIXTURE DRIFT: $table.$column loaded as $dt, expected one of " +
        s"${allowed.mkString("{", ", ", "}")} — update T loaders + oracles " +
        "for the new shape (see T.events for the branching pattern).")

  test("events.ts raw dtype is a shape T.events knows how to normalize") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dt = raw("events").schema("ts").dataType
    assertType("events", "ts", dt,
      Set(LongType, TimestampNTZType, TimestampType))
  }

  test("T.events normalizes ts to session-zone TIMESTAMP") {
    val ev = T.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"T.events must emit TIMESTAMP, got ${ev.schema("ts").dataType}")
    // The values must be sane wall-clock instants, not mis-scaled
    // epochs (a ns-as-µs mistake lands in year ~1970 or ~56970).
    val yr = ev.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years out of range: $yr — precision mis-scaling?")
  }

  test("events non-ts columns hold their shapes") {
    val s = raw("events").schema
    assertType("events", "user_id", s("user_id").dataType,
      Set(LongType, IntegerType))
    assertType("events", "event_type", s("event_type").dataType,
      Set(StringType))
    assertType("events", "value", s("value").dataType, Set(DoubleType))
    assertType("events", "props", s("props").dataType, Set(StringType))
  }

  test("orders date columns hold their shapes") {
    val s = raw("orders").schema
    assertType("orders", "o_orderdate", s("o_orderdate").dataType,
      Set(DateType, TimestampNTZType, TimestampType))
  }

  test("lineitem date + money columns hold their shapes") {
    val s = raw("lineitem").schema
    assertType("lineitem", "l_shipdate", s("l_shipdate").dataType,
      Set(DateType, TimestampNTZType, TimestampType))
    assertType("lineitem", "l_extendedprice", s("l_extendedprice").dataType,
      Set(DoubleType, DecimalType(15, 2), DecimalType(18, 4)))
    assertType("lineitem", "l_quantity", s("l_quantity").dataType,
      Set(DoubleType, LongType, IntegerType, DecimalType(15, 2)))
  }

  test("documents text/meta columns hold their shapes") {
    val s = raw("documents").schema
    assertType("documents", "text", s("text").dataType, Set(StringType))
    assertType("documents", "doc_id", s("doc_id").dataType,
      Set(LongType, IntegerType, StringType))
  }

  test("embeddings vector column holds its shape") {
    val s = raw("embeddings").schema
    assertType("embeddings", "embedding", s("embedding").dataType,
      Set(ArrayType(FloatType, containsNull = true),
          ArrayType(FloatType, containsNull = false),
          ArrayType(DoubleType, containsNull = true),
          ArrayType(DoubleType, containsNull = false)))
  }
}
