package graft

import graft.ops.BpeTrainer
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must learn EXACTLY the rules a plain
  * single-threaded reference implementation learns (greedy left-to-right
  * merging, (count DESC, pair lex) tie-break), and its model must
  * tokenize unseen words identically.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (the textbook algorithm, in-memory) ----
  private def refSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ "</w>"

  private def refMerge(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    s.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) { out.remove(out.size - 1); out += (a + b) }
      else out += x
    }
    out.toVector
  }

  private def refTrain(words: Map[String, Long], merges: Int, minCount: Long = 2L)
      : (List[(String, String)], Map[String, Vector[String]]) = {
    var syms = words.map { case (w, _) => w -> refSymbols(w) }
    val rules = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (!done && rules.size < merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (w, s) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + words(w)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minCount) done = true
        else { rules += ((a, b)); syms = syms.map { case (w, s) => w -> refMerge(s, a, b) } }
      }
    }
    (rules.toList, syms)
  }

  private def trainBoth(words: Map[String, Long], merges: Int) = {
    val df = words.toSeq.toDF("word", "freq")
    val (model, finalSyms) = BpeTrainer.train(df, merges)
    val (refRules, refSyms) = refTrain(words, merges)
    (model, finalSyms, refRules, refSyms)
  }

  test("learns the classic Sennrich-style merges and matches the reference exactly") {
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (model, finalSyms, refRules, refSyms) = trainBoth(corpus, 10)
    assert(model.rules === refRules)
    val got = finalSyms.select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(got.view.mapValues(_.toVector).toMap === refSyms)
    // the highest-frequency pair family must surface: 'es' from newest+widest (9)
    assert(model.rules.head === (("e", "s")))
  }

  test("greedy left-to-right semantics: 'aaaa' under (a,a) tokenizes [aa, aa, </w>]") {
    val (model, _) = BpeTrainer.train(Seq(("aaaa", 5L)).toDF("word", "freq"), 1)
    assert(model.rules === Seq(("a", "a")))
    val toks = Seq("aaaa", "aaa").toDF("word")
      .select(model.tokenize(col("word")).as("t")).as[Seq[String]].collect()
    assert(toks(0) === Seq("aa", "aa", "</w>"))
    assert(toks(1) === Seq("aa", "a", "</w>"))
  }

  test("model tokenizes UNSEEN words exactly like the reference rule replay") {
    val corpus = Map("hugging" -> 10L, "hugs" -> 5L, "hug" -> 7L, "pug" -> 4L, "pun" -> 12L)
    val (model, _, refRules, _) = trainBoth(corpus, 8)
    assert(model.rules === refRules)
    val unseen = Seq("huggable", "punning", "zug")
    val got = unseen.toDF("word").select(col("word"), model.tokenize(col("word")).as("t"))
      .as[(String, Seq[String])].collect().toMap
    unseen.foreach { w =>
      val want = refRules.foldLeft(refSymbols(w)) { case (s, (a, b)) => refMerge(s, a, b) }
      assert(got(w).toVector === want, s"tokenization of unseen '$w' diverged")
    }
  }

  test("stops early when no pair reaches minCount and on randomized corpora matches the reference") {
    // all words distinct single chars -> no pair ever repeats beyond its own freq=1
    val (m0, _) = BpeTrainer.train(Seq(("ab", 1L)).toDF("word", "freq"), 5)
    assert(m0.rules.isEmpty, "freq-1 corpus must learn nothing at minCount=2")

    // three deterministic pseudo-random corpora (fixed seeds)
    Seq(1, 2, 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd"
      val words = (0 until 12).map { _ =>
        (0 until (2 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.groupBy(identity).map { case (w, ws) => w -> (ws.size * (1 + rnd.nextInt(5))).toLong }
      val (model, finalSyms, refRules, refSyms) = trainBoth(words, 6)
      assert(model.rules === refRules, s"seed $seed: learned rules diverged")
      val got = finalSyms.select("word", "syms").as[(String, Seq[String])].collect().toMap
      assert(got.view.mapValues(_.toVector).toMap === refSyms, s"seed $seed: tokenization diverged")
    }
  }
}
