package graft

import graft.ops.{CdcTable, MergeInto}

/** Statement-level MERGE INTO parity against the reference's generated
  * statement (incremental_kafka_s3_cdc.py:243-292): clause semantics,
  * composite ON keys, months() partition conjunct, and the keyless
  * INSERT fallback (:275-276).
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // clause-for-clause the reference's generated statement text (same
  // spacing quirks: double space before THEN UPDATE, space after '(' in
  // the partition conjunct)
  private def refMergeSql(table: String, key: String, cols: Seq[String],
                          partition: Option[String] = None): String = {
    val updateList = cols.map(c => s"t.$c=s.$c").mkString(", ")
    val columnList = cols.mkString(", ")
    val columnListS = cols.map("s." + _).mkString(", ")
    val onPart = partition.map(p => s"months(t.$p) = months( s.$p) and ").getOrElse("")
    s"""MERGE INTO $table t USING (select * from src) s
       |            on $onPart t.__rds_id = s.__rds_id and t.__tenant_id = s.__tenant_id and t.$key = s.$key
       |            WHEN MATCHED AND s.__op = 'd' THEN DELETE
       |            WHEN MATCHED AND (s.__op = 'u' or s.__op = 'c' or s.__op = 'r')  THEN UPDATE SET $updateList
       |            WHEN NOT MATCHED AND NOT s.__op = 'd' THEN INSERT ($columnList) VALUES ($columnListS)""".stripMargin
  }

  test("MERGE clauses: matched delete, matched update, not-matched insert, not-matched delete ignored") {
    val root = tmpDir("mergeinto")
    val t = new CdcTable(spark, s"$root/orders", Seq("__rds_id", "__tenant_id", "id"))
    t.init(Seq(
      (0L, 0L, 1L, "a", 1L),
      (0L, 0L, 2L, "b", 1L)
    ).toDF("__rds_id", "__tenant_id", "id", "v", "__ts_ms"))

    val src = Seq(
      (0L, 0L, 2L, "b2", 2L, "u"),   // matched update
      (0L, 0L, 3L, "c", 2L, "c"),    // not matched insert
      (0L, 0L, 1L, null.asInstanceOf[String], 2L, "d"), // matched delete
      (0L, 0L, 9L, "ghost", 2L, "d") // NOT matched delete: never inserted
    ).toDF("__rds_id", "__tenant_id", "id", "v", "__ts_ms", "__op")

    val sql = refMergeSql("cat.db.orders", "id",
      Seq("__rds_id", "__tenant_id", "id", "v", "__ts_ms"))
    val table = MergeInto.execute(spark, sql, src, _ => s"$root/orders")
    val got = table.read.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b2"), (3L, "c")))
  }

  test("months() partition conjunct maps to the partitioned table layout") {
    val root = tmpDir("mergeinto2")
    val cols = Seq("__rds_id", "__tenant_id", "id", "v", "created_at", "__ts_ms")
    val t = new CdcTable(spark, s"$root/t", Seq("__rds_id", "__tenant_id", "id"),
      partitionSource = Some("created_at"))
    t.init(Seq(
      (0L, 0L, 1L, "jan", ts("2024-01-10 00:00:00"), 1L)
    ).toDF(cols: _*))

    val src = Seq(
      (0L, 0L, 2L, "feb", ts("2024-02-10 00:00:00"), 2L, "c")
    ).toDF((cols :+ "__op"): _*)

    val sql = refMergeSql("cat.db.t", "id", cols, partition = Some("created_at"))
    val stmt = MergeInto.parse(sql)
    assert(stmt.partitionColumn.contains("created_at"))
    val table = MergeInto.execute(spark, sql, src, _ => s"$root/t")
    assert(table.read.orderBy("id").select("v").as[String].collect().toSeq ==
      Seq("jan", "feb"))
    // the manifest gaining a February month proves the conjunct routed to
    // the partitioned (month-manifested) table layout
    assert(table.manifest(table.currentVersion.get).map(_._1).sorted ==
      Seq("2024-01", "2024-02"))
  }

  test("keyless fallback: INSERT INTO appends, duplicates kept, __op not consumed") {
    val root = tmpDir("mergeinto3")
    val src = Seq((1L, "x", "d"), (1L, "x", "u"))
      .toDF("id", "v", "__op")
    val sql = "INSERT INTO events (id, v, __op) VALUES (s.id, s.v, s.__op)"
    MergeInto.execute(spark, sql, src, _ => s"$root/events")
    MergeInto.execute(spark, sql, src, _ => s"$root/events")
    // pure append: every row lands twice, including the 'd' rows (K3)
    assert(new CdcTable(spark, s"$root/events", Nil).read.count() == 4)
  }

  test("WHEN NOT MATCHED BY SOURCE THEN DELETE: snapshot-sync semantics") {
    val root = tmpDir("mergebysrc")
    val t = new CdcTable(spark, s"$root/dim", Seq("__rds_id", "__tenant_id", "id"))
    t.init(Seq(
      (0L, 0L, 1L, "a", 1L),
      (0L, 0L, 2L, "b", 1L),
      (0L, 0L, 3L, "c", 1L)
    ).toDF("__rds_id", "__tenant_id", "id", "v", "__ts_ms"))

    // the re-export carries 2 (updated) and 4 (new); 1 and 3 vanished
    val src = Seq(
      (0L, 0L, 2L, "b2", 2L, "u"),
      (0L, 0L, 4L, "d", 2L, "c")
    ).toDF("__rds_id", "__tenant_id", "id", "v", "__ts_ms", "__op")

    val sql = refMergeSql("cat.db.dim", "id",
      Seq("__rds_id", "__tenant_id", "id", "v", "__ts_ms")) +
      "\n            WHEN NOT MATCHED BY SOURCE THEN DELETE"
    assert(MergeInto.parse(sql).bySourceDelete)
    val table = MergeInto.execute(spark, sql, src, _ => s"$root/dim")
    val got = table.read.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b2"), (4L, "d")))
    // the implicit deletes are REAL CDF rows (view maintenance sees them)
    val feed = table.changesBetween(1L, table.currentVersion.get)
    val deleted = feed.filter(org.apache.spark.sql.functions.col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet
    assert(deleted == Set(1L, 3L))
    // without the clause the same batch leaves 1 and 3 in place
    assert(!MergeInto.parse(refMergeSql("t", "id", Seq("id", "v"))).bySourceDelete)
  }

  test("CdcTable.syncFrom makes contents equal the snapshot with true diffs") {
    val root = tmpDir("syncfrom")
    val t = new CdcTable(spark, s"$root/t", Seq("id"))
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "__ts_ms"))
    t.syncFrom(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "__ts_ms"), "__ts_ms")
    assert(t.read.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((2L, "b2"), (3L, "c")))
    // an identical re-sync is a complete no-op: no version burned
    val v = t.currentVersion.get
    t.syncFrom(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "__ts_ms"), "__ts_ms")
    assert(t.currentVersion.get == v)
  }

  test("syncFrom: a change only in a snapshot-NEW column still lands (schema evolution)") {
    val root = tmpDir("syncfrom_evo")
    val t = new CdcTable(spark, s"$root/t", Seq("id"))
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "__ts_ms"))
    // the export adds a column; row 1's shared columns are UNCHANGED —
    // only the new column carries a value (the r13-advice silent-partial-
    // evolution case). Row 2's new column is null (genuinely unchanged).
    t.syncFrom(Seq((1L, "a", Some("x1"), 2L), (2L, "b", Option.empty[String], 2L))
      .toDF("id", "v", "extra", "__ts_ms"), "__ts_ms")
    assert(t.read.columns.contains("extra"), "table must evolve to the snapshot schema")
    assert(t.read.orderBy("id").select("id", "v", "extra")
      .as[(Long, String, Option[String])].collect().toSeq ==
      Seq((1L, "a", Some("x1")), (2L, "b", None)))
    // re-sync of the same snapshot: no-op again (new column now shared)
    val v = t.currentVersion.get
    t.syncFrom(Seq((1L, "a", Some("x1"), 2L), (2L, "b", Option.empty[String], 2L))
      .toDF("id", "v", "extra", "__ts_ms"), "__ts_ms")
    assert(t.currentVersion.get == v)
  }

  test("statements outside the reference grammar are rejected loudly") {
    intercept[IllegalArgumentException](MergeInto.parse("DELETE FROM t WHERE 1=1"))
    // cross-wired SET item
    intercept[IllegalArgumentException](MergeInto.parse(
      refMergeSql("t", "id", Seq("id", "v")).replace("t.v=s.v", "t.v=s.id")))
    // non-months partition transform
    intercept[IllegalArgumentException](MergeInto.parse(
      refMergeSql("t", "id", Seq("id", "v"), partition = Some("created_at"))
        .replace("months", "days")))
  }
}
