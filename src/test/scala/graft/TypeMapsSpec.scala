package graft

import org.apache.spark.sql.functions._
import graft.types.TypeMaps
import graft.types.TypeMaps.Logical

class TypeMapsSpec extends SparkSpec {
  import spark.implicits._

  test("logical-type normalization: epoch units to semantic types") {
    val df = Seq((19700L, 1694160000123L, 1694160000123456L, "2023-09-08T08:00:00Z", 2023))
      .toDF("d", "ms", "us", "zoned", "yr")
    val out = df.select(
      TypeMaps.normalize(col("d"), Logical.Date).as("d"),
      TypeMaps.normalize(col("ms"), Logical.Timestamp).as("ms"),
      TypeMaps.normalize(col("us"), Logical.MicroTimestamp).as("us"),
      TypeMaps.normalize(col("zoned"), Logical.ZonedTimestamp).as("zoned"),
      TypeMaps.normalize(col("yr"), Logical.Year).as("yr")
    ).head()
    assert(out.getDate(0).toString == "2023-12-09") // 19700 days from epoch
    assert(out.getTimestamp(1).getTime == 1694160000123L) // millis preserved
    assert(out.getTimestamp(2).getTime == 1694160000123L) // micros floor to ms in getTime
    assert(out.getTimestamp(3).getTime == 1694160000000L)
    assert(out.getInt(4) == 2023)
  }

  test("coerceForWrite widens bool/byte/short to int") {
    val df = Seq((true, 1.toByte, 2.toShort, 3)).toDF("b", "i8", "i16", "i32")
    val out = TypeMaps.coerceForWrite(df)
    import org.apache.spark.sql.types._
    assert(out.schema.fields.take(3).forall(_.dataType == IntegerType))
    assert(out.schema("i32").dataType == IntegerType)
    assert(out.head() == org.apache.spark.sql.Row(1, 1, 2, 3))
  }
}
