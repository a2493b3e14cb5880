package graft

import org.apache.spark.sql.functions._

/** Cross-table transactions (GraftSession.transaction): all-or-nothing
  * staging on per-table branches, coordinator-manifest commit, roll-back
  * on body failure / validation conflict, and roll-FORWARD recovery of a
  * commit interrupted between the per-table pointer flips.
  */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshSession(tag: String): GraftSession = {
    val g = new GraftSession(spark, tmpDir(tag))
    Seq((1L, "o1", 5L)).toDF("id", "v", "ts").createOrReplaceTempView("tx_orders_src")
    Seq((1L, 100L, 5L)).toDF("id", "amt", "ts").createOrReplaceTempView("tx_items_src")
    g.sql("CREATE TABLE orders KEYED BY (id) AS SELECT id, v, ts FROM tx_orders_src")
    g.sql("CREATE TABLE items KEYED BY (id) AS SELECT id, amt, ts FROM tx_items_src")
    g
  }

  private def ordersBatch(id: Long, v: String) =
    Seq((id, v, "c", 9L)).toDF("id", "v", "__op", "__ts_ms")
  private def itemsBatch(id: Long, amt: Long) =
    Seq((id, amt, "c", 9L)).toDF("id", "amt", "__op", "__ts_ms")

  test("a committed transaction lands on every table at once") {
    val g = freshSession("tx_ok")
    val out = g.transaction(Seq("orders", "items")) { tx =>
      tx("orders").merge(ordersBatch(2L, "o2"), "__ts_ms")
      tx("items").merge(itemsBatch(2L, 200L), "__ts_ms")
      "done"
    }
    assert(out === "done")
    assert(g.read("orders").count() === 2)
    assert(g.read("items").count() === 2)
    assert(g.read("items").filter(col("id") === 2L).select("amt").head().getLong(0) === 200L)
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("orders").branches.isEmpty, "staged branch leaked")
    assert(g.table("items").branches.isEmpty)
  }

  test("a body failure changes nothing — even after one table already staged") {
    val g = freshSession("tx_fail")
    val e = intercept[RuntimeException] {
      g.transaction(Seq("orders", "items")) { tx =>
        tx("orders").merge(ordersBatch(7L, "o7"), "__ts_ms")
        throw new RuntimeException("validation said no")
      }
    }
    assert(e.getMessage.contains("validation said no"))
    assert(g.read("orders").count() === 1, "aborted staged write leaked")
    assert(g.read("items").count() === 1)
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("orders").branches.isEmpty)
  }

  test("a concurrent writer on any participant aborts the whole transaction") {
    val g = freshSession("tx_conflict")
    intercept[ops.CdcTable.PublishConflictException] {
      g.transaction(Seq("orders", "items")) { tx =>
        tx("orders").merge(ordersBatch(3L, "o3"), "__ts_ms")
        tx("items").merge(itemsBatch(3L, 300L), "__ts_ms")
        // a concurrent writer moves ONE parent mid-transaction
        g.table("items").merge(itemsBatch(99L, 999L), "__ts_ms")
      }
    }
    // neither staged write published; the concurrent write survives
    assert(g.read("orders").count() === 1)
    assert(g.read("items").select("id").as[Long].collect().toSet === Set(1L, 99L))
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("orders").branches.isEmpty, "conflict must drop staged branches")
    assert(g.table("items").branches.isEmpty)
  }

  test("recovery rolls a commit interrupted between pointer flips FORWARD") {
    val g = freshSession("tx_recover")
    // simulate the crash window by hand: both tables staged, manifest
    // written, only the FIRST participant's publish happened
    val id = "tx-crash-1"
    g.table("orders").createBranch(id).merge(ordersBatch(4L, "o4"), "__ts_ms")
    g.table("items").createBranch(id).merge(itemsBatch(4L, 400L), "__ts_ms")
    g.io.mkdirs(s"${g.root}/_transactions")
    g.io.writeAtomic(s"${g.root}/_transactions/$id", "orders\nitems")
    g.table("orders").publish(id) // ...crash here
    assert(g.read("orders").count() === 2)
    assert(g.read("items").count() === 1, "items must not have published yet")

    assert(g.pendingTransactions === Seq(id))
    assert(g.recoverTransactions() === Seq(id))
    assert(g.read("items").count() === 2)
    assert(g.read("items").filter(col("id") === 4L).select("amt").head().getLong(0) === 400L)
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("items").branches.isEmpty)
    // idempotent: nothing left to recover
    assert(g.recoverTransactions().isEmpty)
  }

  test("concurrent commit inside the crash window: recovery rebases, both writers survive") {
    // the r13-advice scenario: a commit lands on a participant AFTER the
    // first pointer flipped — plain recovery must fail LOUDLY (manifest
    // kept), and rebase recovery must complete the transaction without
    // losing the concurrent write
    val g = freshSession("tx_rebase")
    val id = "tx-crash-2"
    g.table("orders").createBranch(id).merge(ordersBatch(5L, "o5"), "__ts_ms")
    g.table("items").createBranch(id).merge(itemsBatch(5L, 500L), "__ts_ms")
    val itemsPreTx = g.table("items").currentVersion.get
    g.io.mkdirs(s"${g.root}/_transactions")
    g.io.writeAtomic(s"${g.root}/_transactions/$id", s"orders\t1\nitems\t$itemsPreTx")
    g.table("orders").publish(id) // ...crash here...
    g.table("items").merge(itemsBatch(77L, 770L), "__ts_ms") // ...concurrent commit lands

    intercept[ops.CdcTable.PublishConflictException] { g.recoverTransactions() }
    assert(g.pendingTransactions === Seq(id), "failed recovery must keep the manifest")
    assert(g.table("items").branches.contains(id), "staged branch must survive for rebase")

    assert(g.recoverTransactions(rebaseTsCol = Some("__ts_ms")) === Seq(id))
    val items = g.read("items").select("id").as[Long].collect().toSet
    assert(items === Set(1L, 5L, 77L), "staged AND concurrent rows must both land")
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("items").branches.isEmpty)
  }

  test("abortTransaction rolls a half-published window back to pre-transaction state") {
    val g = freshSession("tx_abort")
    val id = "tx-crash-3"
    val ordersPreTx = g.table("orders").currentVersion.get
    g.table("orders").createBranch(id).merge(ordersBatch(6L, "o6"), "__ts_ms")
    g.table("items").createBranch(id).merge(itemsBatch(6L, 600L), "__ts_ms")
    g.io.mkdirs(s"${g.root}/_transactions")
    g.io.writeAtomic(s"${g.root}/_transactions/$id", s"orders\t$ordersPreTx\nitems\t1")
    g.table("orders").publish(id) // ...crash here
    assert(g.read("orders").count() === 2)

    g.abortTransaction(id)
    assert(g.read("orders").count() === 1, "published participant restored")
    assert(g.read("items").count() === 1)
    assert(g.pendingTransactions.isEmpty)
    assert(g.table("orders").branches.isEmpty)
    assert(g.table("items").branches.isEmpty, "staged branch dropped on abort")
  }

  test("abortTransaction refuses when a later commit would be lost") {
    val g = freshSession("tx_abort_refuse")
    val id = "tx-crash-4"
    val ordersPreTx = g.table("orders").currentVersion.get
    g.table("orders").createBranch(id).merge(ordersBatch(8L, "o8"), "__ts_ms")
    g.table("items").createBranch(id).merge(itemsBatch(8L, 800L), "__ts_ms")
    g.io.mkdirs(s"${g.root}/_transactions")
    g.io.writeAtomic(s"${g.root}/_transactions/$id", s"orders\t$ordersPreTx\nitems\t1")
    g.table("orders").publish(id)
    g.table("orders").merge(ordersBatch(9L, "o9"), "__ts_ms") // someone else's commit

    val e = intercept[IllegalArgumentException] { g.abortTransaction(id) }
    assert(e.getMessage.contains("later commit would be lost"))
    // nothing touched: both writes still visible, manifest + branch intact
    assert(g.read("orders").select("id").as[Long].collect().toSet === Set(1L, 8L, 9L))
    assert(g.pendingTransactions === Seq(id))
    assert(g.table("items").branches.contains(id))
  }

  test("streaming foreachBatch commits two tables per micro-batch transactionally") {
    val g = freshSession("tx_stream")
    val srcDir = tmpDir("tx_stream_src")
    val ckpt = tmpDir("tx_stream_ckpt")
    Seq((2L, "o2", 200L), (3L, "o3", 300L)).toDF("id", "v", "amt")
      .write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("id BIGINT, v STRING, amt BIGINT").parquet(srcDir)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!df.isEmpty) {
            // the fan-out of ONE micro-batch to both tables is atomic:
            // orders and items land together or the batch retries whole
            g.transaction(Seq("orders", "items")) { tx =>
              tx("orders").merge(df.select(col("id"), col("v"),
                lit("c").as("__op"), lit(9L).as("__ts_ms")), "__ts_ms")
              tx("items").merge(df.select(col("id"), col("amt"),
                lit("c").as("__op"), lit(9L).as("__ts_ms")), "__ts_ms")
            }
            (): Unit
          }
        }
        .start()
      q.awaitTermination()
    }

    runOnce()
    assert(g.read("orders").select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(g.read("items").select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(g.pendingTransactions.isEmpty)

    // restart with no new files: checkpoint prevents reprocessing — no
    // version burned on either table
    val (vo, vi) = (g.table("orders").currentVersion.get,
      g.table("items").currentVersion.get)
    runOnce()
    assert(g.table("orders").currentVersion.get === vo)
    assert(g.table("items").currentVersion.get === vi)

    // a late file lands in BOTH tables through one more transaction
    Seq((4L, "o4", 400L)).toDF("id", "v", "amt")
      .write.mode("append").parquet(srcDir)
    runOnce()
    assert(g.read("orders").count() === 4)
    assert(g.read("items").filter(col("id") === 4L).select("amt").head().getLong(0) === 400L)
    assert(g.table("orders").branches.isEmpty)
  }

  test("session statements: savepoints and transaction recovery by SQL") {
    val g = freshSession("tx_stmt")
    g.sql("CREATE SAVEPOINT before")
    assert(g.sql("SHOW SAVEPOINTS").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq === Seq(("before", 2L)))

    g.transaction(Seq("orders", "items")) { tx =>
      tx("orders").merge(ordersBatch(5L, "o5"), "__ts_ms")
      tx("items").merge(itemsBatch(5L, 500L), "__ts_ms")
    }
    assert(g.read("orders").count() === 2)
    assert(g.sql("SHOW TRANSACTIONS").isEmpty)

    // a crash window shows up in SHOW TRANSACTIONS and RECOVER completes it
    val id = "tx-stmt-crash"
    g.table("orders").createBranch(id).merge(ordersBatch(6L, "o6"), "__ts_ms")
    g.table("items").createBranch(id).merge(itemsBatch(6L, 600L), "__ts_ms")
    g.io.mkdirs(s"${g.root}/_transactions")
    g.io.writeAtomic(s"${g.root}/_transactions/$id", "orders\nitems")
    g.table("orders").publish(id)
    assert(g.sql("SHOW TRANSACTIONS").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq === Seq((id, 2L)))
    assert(g.sql("RECOVER TRANSACTIONS").collect().map(_.getString(0)).toSeq === Seq(id))
    assert(g.read("items").count() === 3)

    // rewind the whole dataset to the savepoint in one statement
    g.sql("RESTORE SAVEPOINT before")
    assert(g.read("orders").count() === 1)
    assert(g.read("items").count() === 1)
    g.sql("DROP SAVEPOINT before")
    assert(g.sql("SHOW SAVEPOINTS").isEmpty)
  }

  test("transactions compose with reads inside the body and return values") {
    val g = freshSession("tx_read")
    val n = g.transaction(Seq("orders")) { tx =>
      val before = tx("orders").read.count()
      tx("orders").merge(ordersBatch(10L, "o10"), "__ts_ms")
      tx("orders").read.count() - before
    }
    assert(n === 1L)
    assert(g.read("orders").count() === 2)
  }

  test("restore's CAS fence refuses when the head moved after validation") {
    // the abortTransaction race: validate the head in one read, restore in
    // a second — a commit landing between must make the restore THROW, not
    // be silently replaced with pre-transaction content
    val g = freshSession("tx_cas")
    val t = g.table("orders")
    val v0 = t.currentVersion.get
    t.merge(ordersBatch(2L, "o2"), "__ts_ms")
    val validated = t.currentVersion.get
    t.merge(ordersBatch(3L, "o3"), "__ts_ms") // the concurrent commit
    val e = intercept[graft.ops.CdcTable.CommitConflictException] {
      t.restore(v0, ifHeadIs = Some(validated))
    }
    assert(e.getMessage.contains("fence"))
    assert(g.read("orders").count() === 3, "concurrent commit survived")
    // the unfenced form still restores (explicit, caller-owned rollback)
    t.restore(v0)
    assert(g.read("orders").count() === 1)
  }
}
