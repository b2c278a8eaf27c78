package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BPE merge-table TRAINING (Sennrich et al. 2016) — the learning
  * half of the tokenizer story (functions.Bpe applies a fixed table;
  * this derives one from the corpus): start from code-point symbols,
  * repeatedly take the corpus-most-frequent adjacent symbol pair
  * (ties to the lexicographically smallest pair, so training is
  * deterministic) and fuse it everywhere.
  *
  * Representation: each vocabulary word is a space-joined symbol
  * STRING (symbols never contain spaces — words are whitespace
  * tokens upstream). The fuse step is then one non-overlapping
  * leftmost string replace of " a b " with " ab " on both engines —
  * exactly BPE's greedy left-to-right merge pass.
  *
  * Scale shape: training runs over the DISTINCT-word vocabulary with
  * counts (Zipf-bounded — orders of magnitude smaller than the
  * corpus; the corpus is touched once for the word counts). Per
  * round: adjacent pairs explode map-side from the symbol strings,
  * one partial-agg exchange on the pair key, argmax via
  * TakeOrderedAndProject, and a ONE-ROW driver handoff (the e7/LogReg
  * bounded-scalar class) feeds the next round's map-side fuse.
  * Rounds chain narrow transforms over the persisted symbol table —
  * no shuffle in the fuse, no window anywhere.
  */
object BpeTrain {

  /** One learned merge: `left`+`right` → `merged` at `rank`,
    * `nOcc` = corpus occurrences when chosen.
    */
  final case class Merge(mergeRank: Int, lhs: String, rhs: String,
      merged: String, nOcc: Long)

  /** Learn `rounds` merges from a (tok, n) word-count vocabulary. */
  def learnMerges(vocab: DataFrame, rounds: Int): Seq[Merge] = {
    val v0 = vocab
      .select(array_join(split(col("tok"), ""), " ").as("w"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var v = v0
    val out = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val pairs = v
        .withColumn("s", split(col("w"), " "))
        .filter(size(col("s")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(s) - 2), " +
            "i -> concat(s[i], ' ', s[i+1]))")).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("c"))
      val top = pairs.orderBy(desc("c"), col("pair")).limit(1).head()
      val pair = top.getString(0)
      val Array(l, rgt) = pair.split(" ", 2)
      val merged = l + rgt
      out += Merge(r, l, rgt, merged, top.getLong(1))
      // Fuse everywhere: non-overlapping leftmost replace (argument
      // symbols ride as COLUMNS, so no literal-escaping hazards).
      v = v.select(trim(call_function("replace",
        concat(lit(" "), col("w"), lit(" ")),
        lit(" " + pair + " "), lit(" " + merged + " "))).as("w"),
        col("n"))
    }
    v0.unpersist()
    out.result()
  }
}
