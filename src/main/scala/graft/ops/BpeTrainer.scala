package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * step after `x_bpe_pairs` (which oracle-checks the first iteration's
  * pair frequencies): run k merge iterations and emit the ordered merge
  * rule list that IS a BPE tokenizer model.
  *
  * Scale design (the reason BPE training fits a 100 TB engine at all):
  * the iteration state is the WORD-FREQUENCY table — vocabulary-bounded,
  * never the corpus. One corpus pass aggregates (word, freq); everything
  * after is O(vocab × word length) per merge:
  *   - pair counting is a map-side explode of adjacent symbol pairs
  *     weighted by word frequency, combine-friendly on the (a, b) key;
  *   - the argmax pair is a 1-row TakeOrdered with a deterministic
  *     (count DESC, a, b) tie-break — the only driver-side data is the
  *     k-rule model itself;
  *   - the merge applies as a higher-order-function fold over each
  *     word's symbol array (left-to-right greedy, the reference BPE
  *     semantics; no UDF — `aggregate` codegen-friendly builtins only);
  *   - the symbol table localCheckpoints per iteration so iteration k
  *     does not re-execute the k−1 merges before it (the same lineage
  *     discipline as the dedup-cluster label propagation).
  *
  * Training never touches floats: frequencies are exact longs, ties
  * break lexicographically, so the learned model is deterministic on any
  * cluster layout.
  */
object BpeTrainer {

  /** An ordered BPE merge-rule list; applying rules in order to a
    * character-split word reproduces training-time tokenization.
    */
  final case class BpeModel(rules: Seq[(String, String)]) {
    /** Tokenize a word column: character symbols + end marker, then the
      * k merges in training order (k narrow column transforms, no UDF).
      */
    def tokenize(word: Column): Column =
      rules.foldLeft(symbols(word)) { case (c, (a, b)) => mergeOnce(c, a, b) }
  }

  /** Character symbols of a word plus the </w> end-of-word marker. */
  def symbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit("</w>")))

  /** One greedy left-to-right merge of adjacent (a, b) → ab over a
    * symbol array, as a pure fold: matching the reference BPE behavior
    * where "aaa" under (a,a) becomes [aa, a], not [a, aa].
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of a word, as (a, b) structs. */
  private def pairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("a"), element_at(syms, i + 2).as("b"))))

  /** Train `merges` BPE rules over a (word, freq) table. Stops early
    * when the best pair's weighted count falls below `minCount`.
    * Returns the model and the final per-word symbol table (word, freq,
    * syms) — the training-corpus tokenization.
    */
  def train(words: DataFrame, merges: Int, minCount: Long = 2L): (BpeModel, DataFrame) = {
    var cur = words
      .select(col("word"), col("freq").cast("long").as("freq"),
        symbols(col("word")).as("syms"))
      .localCheckpoint()
    val rules = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (!done && rules.size < merges) {
      val top = cur
        .select(col("freq"), explode(pairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("c") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        rules += ((a, b))
        cur = cur.withColumn("syms", mergeOnce(col("syms"), a, b)).localCheckpoint()
      }
    }
    (BpeModel(rules.toSeq), cur)
  }
}
