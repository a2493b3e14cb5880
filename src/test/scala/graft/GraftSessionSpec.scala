package graft

import org.apache.spark.sql.functions._

/** GraftSession: the whole table lifecycle driven through the one
  * statement entry point, with layout resolved from the tables' own
  * sidecars — no keys or partition specs supplied out of band.
  */
class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  test("full lifecycle through sql(): CTAS, MERGE, DML, metadata reads, branches") {
    val g = new GraftSession(spark, tmpDir("gsession"))
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "amt")
      .createOrReplaceTempView("gs_src")

    g.sql("CREATE TABLE t KEYED BY (id) AS SELECT id, v, amt FROM gs_src")
    assert(g.read("t").count() == 2)
    assert(g.table("t").keys == Seq("id"))

    // MERGE through the batch overload (the reference's flagship path)
    val batch = Seq((2L, "b2", 25L, "u", 2L), (3L, "c", 30L, "c", 2L))
      .toDF("id", "v", "amt", "__op", "__ts_ms")
    g.sql(
      """MERGE INTO t t USING (select * from src) s on t.id = s.id
        |WHEN MATCHED AND s.__op = 'd' THEN DELETE
        |WHEN MATCHED AND (s.__op = 'u' or s.__op = 'c' or s.__op = 'r') THEN UPDATE SET t.id=s.id, t.v=s.v, t.amt=s.amt, t.__ts_ms=s.__ts_ms
        |WHEN NOT MATCHED AND NOT s.__op = 'd' THEN INSERT (id, v, amt, __ts_ms) VALUES (s.id, s.v, s.amt, s.__ts_ms)""".stripMargin,
      batch)
    assert(g.read("t").filter(col("id") === 2L).select("v").head().getString(0) == "b2")

    g.sql("UPDATE t SET v = concat(v, '!') WHERE amt >= 25")
    g.sql("DELETE FROM t WHERE id = 1")
    assert(g.read("t").select("v").as[String].collect().toSet == Set("b2!", "c!"))

    // reads return rows
    assert(g.sql("SELECT COUNT(*) FROM t").head().getLong(0) == 2L)
    assert(g.sql("DESCRIBE HISTORY t").count() == 3) // default retention window
    assert(g.sql("SHOW TABLES").as[(String, Long)].collect().map(_._1).toSeq == Seq("t"))
    assert(g.sql("DESCRIBE FILES t").agg(sum("row_count")).head().getLong(0) >= 2L)
    val desc = g.sql("DESCRIBE TABLE t").as[(String, String, String)].collect().toSeq
    assert(desc.exists(r => r._1 == "amt" && r._2 == "bigint"))
    assert(desc.contains(("# merge_keys", "id", "")))

    // WAP through statements + the typed handle interoperate
    g.sql("ALTER TABLE t CREATE BRANCH audit")
    g.table("t").branch("audit").merge(
      Seq((4L, "staged", 40L, "c", 3L)).toDF("id", "v", "amt", "__op", "__ts_ms"), "__ts_ms")
    assert(g.read("t").count() == 2, "staged write leaked")
    g.sql("ALTER TABLE t PUBLISH BRANCH audit")
    assert(g.read("t").count() == 3)

    g.sql("DROP TABLE t")
    assert(g.sql("SHOW TABLES").isEmpty)
  }

  test("savepoints pin a cross-table dataset state; restoreAll rewinds it") {
    val g = new GraftSession(spark, tmpDir("gsave"))
    Seq((1L, "d1", 2L)).toDF("id", "body", "ts").createOrReplaceTempView("sp_docs")
    Seq((1L, 0.5, 2L)).toDF("id", "score", "ts").createOrReplaceTempView("sp_stats")
    g.sql("CREATE TABLE docs KEYED BY (id) AS SELECT * FROM sp_docs")
    g.sql("CREATE TABLE stats KEYED BY (id) AS SELECT * FROM sp_stats")

    g.savepoint("run417")
    assert(g.savepoints == Seq("run417"))

    // both tables move on
    g.table("docs").merge(Seq((2L, "d2", 3L, "c")).toDF("id", "body", "ts", "__op"), "ts")
    g.sql("UPDATE stats SET score = 0.9 WHERE id = 1")
    assert(g.read("docs").count() == 2)

    // the pinned read set is exactly the old state
    assert(g.readAt("run417", "docs").count() == 1)
    assert(g.readAt("run417", "stats").select("score").head().getDouble(0) == 0.5)
    // current reads are unaffected
    assert(g.read("stats").select("score").head().getDouble(0) == 0.9)

    // rewind the whole dataset
    g.restoreAll("run417")
    assert(g.read("docs").count() == 1)
    assert(g.read("stats").select("score").head().getDouble(0) == 0.5)

    // immutability + unknown lookups fail loudly
    intercept[IllegalArgumentException] { g.savepoint("run417") }
    intercept[IllegalArgumentException] { g.readAt("run417", "nope") }
    intercept[IllegalArgumentException] { g.readAt("never", "docs") }
    g.dropSavepoint("run417")
    assert(g.savepoints.isEmpty)
  }
}
