package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dml

/** Property tests for the hand-written DML statement parser: round-trip
  * on generated well-formed statements (including string literals that
  * contain commas, quotes, parens, and the word "where"), and total
  * behavior (parse or IllegalArgumentException, never another crash) on
  * arbitrary garbage.
  */
class DmlParserPropSpec extends AnyFunSuite {

  private val identGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))

  // literal payloads that historically break naive SQL splitters
  private val literalGen: Gen[String] = Gen.oneOf(
    "plain", "a,b", "use where needed", "par(en", "nested 'quote' end",
    "trailing space ", "WHERE", "and, or (where)", "x''y")

  private val exprGen: Gen[String] = Gen.oneOf(
    identGen.map(c => s"$c + 1"),
    literalGen.map(l => s"'${l.replace("'", "''")}'"),
    Gen.zip(identGen, literalGen).map { case (c, l) =>
      s"concat($c, '${l.replace("'", "''")}', ',')"
    })

  test("property: generated UPDATE statements round-trip through parse") {
    val gen = for {
      target <- identGen
      nAssign <- Gen.choose(1, 4)
      cols <- Gen.listOfN(nAssign, identGen).map(_.distinct)
      exprs <- Gen.listOfN(cols.length, exprGen)
      where <- Gen.option(Gen.zip(identGen, Gen.choose(0, 99)).map { case (c, v) => s"$c > $v" })
    } yield (target, cols.zip(exprs), where)

    val prop = Prop.forAll(gen) { case (target, assigns, where) =>
      val sql = s"UPDATE $target SET " +
        assigns.map { case (c, e) => s"$c = $e" }.mkString(", ") +
        where.fold("")(w => s" WHERE $w")
      Dml.parse(sql) match {
        case Dml.Update(t, set, w) =>
          t == target && set == assigns && w == where
        case _ => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: parse is total — well-formed or IllegalArgumentException, never another throw") {
    val garbageGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const("UPDATE"),
      Gen.const("DELETE FROM"),
      identGen.map(t => s"UPDATE $t SET"),
      identGen.map(t => s"DELETE FROM $t WHERE"),
      identGen.map(t => s"UPDATE $t SET a = 'unterminated"),
      Gen.asciiPrintableStr.map(s => s"UPDATE t SET v = $s"))
    val prop = Prop.forAll(garbageGen) { s =>
      try { Dml.parse(s); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: INSERT VALUES / SELECT round-trip; malformed column lists reject") {
    val litGen: Gen[String] = Gen.oneOf(
      Gen.choose(0, 999).map(_.toString),
      literalGen.map(l => s"'${l.replace("'", "''")}'"))
    val gen = for {
      target <- identGen
      nCols <- Gen.choose(1, 4)
      cols <- Gen.listOfN(nCols, identGen).map(_.distinct)
      nRows <- Gen.choose(1, 3)
      rows <- Gen.listOfN(nRows, Gen.listOfN(cols.length, litGen))
      withCols <- Gen.oneOf(true, false)
      asSelect <- Gen.oneOf(true, false)
    } yield (target, cols, rows, withCols, asSelect)
    val prop = Prop.forAll(gen) { case (target, cols, rows, withCols, asSelect) =>
      val colList = if (withCols) s"(${cols.mkString(", ")}) " else ""
      if (asSelect) {
        val q = s"SELECT ${cols.mkString(", ")} FROM somewhere WHERE x > 0"
        Dml.parse(s"INSERT INTO $target $colList$q") match {
          case Dml.Insert(t, c, None, Some(sel)) =>
            t == target && c == (if (withCols) cols else Nil) && sel == q
          case _ => false
        }
      } else {
        val tuples = rows.map(_.mkString("(", ", ", ")")).mkString(", ")
        Dml.parse(s"INSERT INTO $target ${colList}VALUES $tuples") match {
          case Dml.Insert(t, c, Some(v), None) =>
            t == target && c == (if (withCols) cols else Nil) && v == tuples
          case _ => false
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
    // malformed column names and duplicate columns reject loudly
    intercept[IllegalArgumentException](Dml.parse("INSERT INTO t (a b) VALUES (1)"))
    intercept[IllegalArgumentException](Dml.parse("INSERT INTO t (a, a) VALUES (1, 2)"))
    // no-space spellings: the column list must not be swallowed into the
    // target name, and VALUES( needs no whitespace
    assert(Dml.parse("INSERT INTO t(id) SELECT id FROM src") ==
      Dml.Insert("t", Seq("id"), None, Some("SELECT id FROM src")))
    assert(Dml.parse("INSERT INTO t(id) VALUES(1), (2)") ==
      Dml.Insert("t", Seq("id"), Some("(1), (2)"), None))
  }

  test("property: DELETE round-trips") {
    val gen = Gen.zip(identGen,
      Gen.option(Gen.zip(identGen, literalGen).map { case (c, l) =>
        s"$c = '${l.replace("'", "''")}'"
      }))
    val prop = Prop.forAll(gen) { case (target, where) =>
      val sql = s"DELETE FROM $target" + where.fold("")(w => s" WHERE $w")
      Dml.parse(sql) match {
        case Dml.Delete(t, w) => t == target && w == where
        case _ => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
