package graft

import org.apache.spark.sql.types._

/** The 22-type wide-matrix fixture (s1_envelope_wide_types): every MySQL
  * type of the reference's fixture table must survive envelope decode →
  * CREATE → MERGE → evolution with its SEMANTIC Spark type — this pins
  * the type mapping itself; the board row hash-checks the values.
  */
class WideTypesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the final table schema carries every mapped type") {
    // the TABLE keeps the native types; the board query re-renders the
    // two hasher-hostile carriers (see the board-projection test below)
    val df = ParityQueries.wideTable(spark, dir).read
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("invoice_id") === LongType)            // bigint
    assert(types("item_id") === IntegerType)            // int
    assert(types("smallint_col") === ShortType)         // smallint
    assert(types("mediumint_col") === IntegerType)      // mediumint
    assert(types("quantity") === ShortType)             // tinyint (int16 wire)
    assert(types("category") === StringType)            // varchar
    assert(types("gender") === StringType)              // char(1)
    assert(types("price") === DecimalType(38, 2))       // decimal(20,2)
    assert(types("price1") === FloatType)               // float(5,2)
    assert(types("price2") === DoubleType)              // double(10,2)
    assert(types("order_date") === TimestampType)       // timestamp (ZonedTimestamp wire)
    assert(types("current_dt") === TimestampType)       // datetime (epoch-millis wire)
    assert(types("shipping_type") === StringType)       // enum
    assert(types("json_col") === StringType)            // json
    assert(types("set_col") === StringType)             // set
    assert(types("tinytext_col") === StringType)
    assert(types("text_col") === StringType)
    assert(types("mediumtext_col") === StringType)
    assert(types("longtext_col") === StringType)
    assert(types("dob") === DateType)                   // date (epoch-days wire)
    assert(types("start_to_work") === LongType)         // time (micros-of-day)
    assert(types("year_col") === IntegerType)           // year
    assert(types("discount") === DoubleType)            // evolved column
  }

  test("the board projection re-renders only the hasher-hostile carriers") {
    // r15: DECIMAL and FLOAT at board top level are unhashable by the
    // driver (Decimal-from-parquet vs float64-from-DuckDB). The board
    // row renders price as the canonical full-scale string and widens
    // price1 to double (exact); every other column keeps its table type.
    val table = ParityQueries.wideTable(spark, dir).read.schema
      .fields.map(f => f.name -> f.dataType).toMap
    val board = SparkEntry.queries("s1_envelope_wide_types")(spark, dir)
      .schema.fields.map(f => f.name -> f.dataType).toMap
    assert(board("price") === StringType)
    assert(board("price1") === DoubleType)
    val unchanged = board.keySet - "price" - "price1"
    assert(unchanged.forall(k => board(k) === table(k)),
      unchanged.filter(k => board(k) != table(k)).mkString(", "))
  }

  test("merge and evolution semantics: deletes drop, updates win, discount is NULL pre-evolution") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("s1_envelope_wide_types")(spark, dir)
    // every 13th key deleted
    assert(df.filter(col("invoice_id") % 13 === 0).count() === 0)
    // every 10th surviving key carries the window-2 update
    val upd = df.filter(col("invoice_id") % 10 === 0)
    assert(upd.count() > 0)
    assert(upd.filter(col("category") =!= "UPDATED").count() === 0)
    // discount exists ONLY on the evolution batch's keys
    assert(df.filter(col("discount").isNotNull && col("invoice_id") % 17 =!= 3).count() === 0)
    assert(df.filter(col("invoice_id") % 17 === 3 && col("discount").isNull).count() === 0)
  }
}
