package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the vocabulary-induction step of
  * tokenizer construction (Sennrich et al. 2016), run over a weighted
  * token-frequency table: each round counts adjacent symbol pairs
  * (weighted by token frequency), merges the most frequent pair
  * everywhere, and records the merge. The learned merge list IS a BPE
  * tokenizer's core artifact.
  *
  * Symbol sequences ride as STRINGS with every symbol wrapped in
  * sentinels: `<h><a><s><h>`. That encoding makes merge application a
  * plain `replace(s, "<a><b>", "<ab>")`: matches can only start at a
  * symbol boundary (corpus symbols never contain the sentinels —
  * enforced), disjoint matches never share characters (so left-to-right
  * non-overlapping replace IS the canonical greedy BPE apply; `[a,a,a]`
  * merges to `[aa, a]`), and both engines' REPLACE agree on those
  * semantics exactly — which keeps the whole training loop inside the
  * hash gate. The per-round argmax is `orderBy(...).limit(1)` — one
  * TakeOrdered row broadcast back into the rewrite, no driver logic in
  * the loop body.
  *
  * Scale shape per round: one explode of adjacent pairs (linear in
  * corpus symbol count — over the DISTINCT-token frequency table, not
  * the corpus, so a 100 TB corpus costs |vocab|·|word| here), one
  * two-phase weighted count, a 1-row top-k, and one map-side rewrite
  * projection. Rounds are a fixed budget, exactly like the k-means and
  * PageRank tiers. */
object Bpe {

  private def symsOf(s: org.apache.spark.sql.Column) =
    split(substring(s, lit(2), length(s) - 2), "><")

  /** Train `rounds` BPE merges over `tokenCounts` (columns `tok`,
    * weight `c`: LongType). Returns (round, pair, merged, cnt): the
    * 1-based merge round, the pair as readable "a b", the merged symbol
    * "ab", and the weighted pair count that won the round. Ties break to
    * the lexicographically smallest pair — deterministic on both
    * engines. */
  def merges(tokenCounts: DataFrame, rounds: Int): DataFrame =
    trainLoop(tokenCounts, rounds)._2.select(col("round"),
      replace(replace(replace(col("pair"), lit("><"), lit(" ")),
        lit("<"), lit("")), lit(">"), lit("")).as("pair"),
      replace(replace(replace(col("pair"), lit("><"), lit("")),
        lit("<"), lit("")), lit(">"), lit("")).as("merged"),
      col("cnt"))

  /** Per-token symbol counts AFTER `rounds` trained merges — the APPLY
    * side of the tokenizer: (tok, n_sym), where n_sym is how many BPE
    * symbols the token encodes to under the learned vocabulary
    * (= sentinel count of the rewritten sequence — one exact integer
    * per token). Runs over the DISTINCT-token table, so applying a
    * 3-merge vocabulary to a 100 TB corpus costs |vocab|·|word| here
    * plus one equi-join wherever the caller weights by corpus counts. */
  def appliedSymbolCounts(tokenCounts: DataFrame, rounds: Int): DataFrame = {
    val seqs = trainLoop(tokenCounts, rounds)._1
    seqs.select(col("tok"),
      (length(col("s")) - length(replace(col("s"), lit("<"), lit("")))).as("n_sym"))
  }

  /** The shared training loop: returns (final rewritten sequences with
    * their token identity, the (round, pair, cnt) merge records). */
  private def trainLoop(tokenCounts: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // sentinel safety: a '<' or '>' inside a token would let a match
    // start mid-symbol and silently corrupt the merge — fail loudly
    val guarded = tokenCounts.select(
      when(col("tok").contains("<") || col("tok").contains(">"),
        raise_error(lit("Bpe.merges: token contains sentinel '<'/'>'")))
        .otherwise(col("tok")).as("tok"),
      col("c"))
    var seqs = guarded.select(col("tok"), col("c"),
      concat(lit("<"),
        concat_ws("><",
          expr("transform(sequence(1, length(tok)), i -> substring(tok, i, 1))")),
        lit(">")).as("s"))
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val sy = symsOf(col("s"))
      val pairs = expr(
        """transform(sequence(1, size(split(substring(s, 2, length(s) - 2), '><')) - 1),
          |  i -> concat('<', element_at(split(substring(s, 2, length(s) - 2), '><'), i),
          |              '><', element_at(split(substring(s, 2, length(s) - 2), '><'), i + 1),
          |              '>'))""".stripMargin)
      val cnt = seqs
        .filter(size(sy) >= 2)
        .select(col("c"), explode(pairs).as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("cnt"))
      val best = cnt.orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(lit(r).as("round"), col("pair"), col("cnt"))
      out = Some(out.fold(best)(_.unionByName(best)))
      seqs = seqs.crossJoin(broadcast(best.select(col("pair").as("__bp"))))
        .select(col("tok"), col("c"),
          replace(col("s"), col("__bp"),
            replace(col("__bp"), lit("><"), lit(""))).as("s"))
    }
    (seqs, out.get)
  }
}
