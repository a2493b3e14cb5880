package graft

import graft.ops.{Expectation, Expectations}
import org.apache.spark.sql.functions._

/** Expectations: strict-true verdicts (NULL violates), rule-order
  * violation arrays, clean/quarantine partition the batch, audit counts
  * agree with the split, and malformed rule sets reject loudly.
  */
class ExpectationsSpec extends SparkSpec {

  private val rules = Seq(
    Expectation("pos", "v > 0"),
    Expectation("small", "v < 100"),
    Expectation("named", "name IS NOT NULL"))

  private def batch = {
    val sq = spark
    import sq.implicits._
    Seq(
      (1L, 5, "a"),          // clean
      (2L, -3, "b"),         // pos
      (3L, 500, null),       // small + named
      (4L, 7, null)          // named
    ).toDF("id", "v", "name")
  }

  test("violation arrays list failed rules in rule order; NULL verdict violates") {
    val sq = spark
    import sq.implicits._
    val got = Expectations.withViolations(batch, rules)
      .select(col("id"), col(Expectations.ViolationsCol))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq())
    assert(got(2L) == Seq("pos"))
    assert(got(3L) == Seq("small", "named"))
    assert(got(4L) == Seq("named"))
    // NULL predicate result = violation (strict-true)
    val nulls = Expectations.withViolations(
      Seq((1L, Option.empty[Int])).toDF("id", "v"), Seq(Expectation("pos", "v > 0")))
      .select(col(Expectations.ViolationsCol)).as[Seq[String]].head()
    assert(nulls == Seq("pos"))
  }

  test("clean + quarantine partition the batch; audit counts agree") {
    val clean = Expectations.clean(batch, rules)
    val quarantined = Expectations.quarantine(batch, rules)
    assert(clean.columns.toSeq == Seq("id", "v", "name"))
    assert(clean.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(quarantined.count() == 3)
    val a = Expectations.audit(batch, rules).collect().head
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Long]("n_clean") == 1 &&
      a.getAs[Long]("n_quarantined") == 3)
    assert(a.getAs[Long]("viol_pos") == 1 && a.getAs[Long]("viol_small") == 1 &&
      a.getAs[Long]("viol_named") == 2)
  }

  test("rule sets validate: empty, duplicate names, bad names, column clash") {
    intercept[IllegalArgumentException](Expectations.audit(batch, Nil))
    intercept[IllegalArgumentException](Expectations.audit(batch,
      Seq(Expectation("a", "v > 0"), Expectation("a", "v < 9"))))
    intercept[IllegalArgumentException](Expectations.audit(batch,
      Seq(Expectation("no spaces", "v > 0"))))
    intercept[IllegalArgumentException](Expectations.withViolations(
      batch.withColumn(Expectations.ViolationsCol, lit("x")), rules))
  }
}
