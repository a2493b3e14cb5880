package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{CdcTable, FileSkipping}

/** Property test for the metadata-answered COUNT
  * ([[CdcTable.countWhere]]): over a shared fixture with nulls, a
  * deletion vector, clustered AND scattered columns, EVERY generated
  * predicate's metadata count must equal the plain filtered scan —
  * the full-file / boundary-file / pruned classification can shift the
  * cost, never the answer. This is the soundness net under
  * `FileSkipping.mustMatchFile`'s "uncertainty demotes to a scan"
  * contract: a single optimistic classification shows up here as a
  * count mismatch.
  */
class CountPropSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: CdcTable = {
    val t = new CdcTable(spark, tmpDir("countprop") + "/t", Seq("id"))
    // id clustered (files have tight ranges); salt scattered (every file
    // spans the domain); v null for a key band so null counts matter
    t.init(spark.range(0, 2000).toDF("id")
      .withColumn("salt", (col("id") * 2654435761L) % 997L)
      .withColumn("v", when(col("id") % 3 =!= 0, concat(lit("s"), col("id"))))
      .repartitionByRange(8, col("id")))
    t.deleteVectored(col("id").between(450L, 520L) || col("id") % 131L === 7L)
    t
  }

  private val boundGen: Gen[Option[Long]] =
    Gen.option(Gen.choose(-100L, 2100L))

  private def predGen: Gen[Seq[FileSkipping.Pred]] = {
    val range = for {
      c <- Gen.oneOf("id", "salt")
      lo <- boundGen
      hi <- boundGen
      if lo.nonEmpty || hi.nonEmpty
    } yield FileSkipping.Range(c, lo, hi)
    val inset = for {
      c <- Gen.oneOf("id", "salt")
      vs <- Gen.nonEmptyListOf(Gen.choose(0L, 2000L)).map(_.take(8))
    } yield FileSkipping.InSet(c, vs)
    val nulls = Gen.oneOf(FileSkipping.IsNull("v"), FileSkipping.NotNull("v"))
    val leaf = Gen.frequency(4 -> range, 2 -> inset, 2 -> nulls)
    val anyOf = Gen.listOfN(2, Gen.nonEmptyListOf(leaf).map(_.take(2)))
      .map(bs => FileSkipping.AnyOf(bs))
    Gen.nonEmptyListOf(Gen.frequency(5 -> leaf, 1 -> anyOf)).map(_.take(3))
  }

  test("property: metadata count == filtered scan count for arbitrary predicates") {
    val prop = Prop.forAll(predGen) { preds =>
      val want = {
        val residual = preds.map(FileSkipping.residualOf).reduce(_ && _)
        table.read.filter(residual).count()
      }
      val prof = table.countWhereProfile(preds)
      if (prof.count != want)
        println(s"MISMATCH preds=$preds profile=$prof want=$want")
      prof.count == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pruned read == filtered scan row-for-row for arbitrary predicates") {
    val prop = Prop.forAll(predGen) { preds =>
      val residual = preds.map(FileSkipping.residualOf).reduce(_ && _)
      val want = table.read.filter(residual)
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head
      val got = table.readWhere(preds)
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head
      if (got != want) println(s"MISMATCH preds=$preds got=$got want=$want")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
