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
    * their token identity, the (round, pair, cnt) merge records).
    *
    * Round 16 (optimization, guide §3.3/§5): the original loop kept every
    * round LAZY — round r's sequences were
    * `seqs(r-1) ⨯ broadcast(argmax over seqs(r-1))`, so the plan
    * referenced each previous round TWICE and the token-count base
    * subtree appeared ~2^rounds times in the final query (exchange reuse
    * recovered some of the execution, none of the planning). The loop now
    * follows the k-means/centroid bounded-driver-state discipline: the
    * symbol-sequence base materializes ONCE (it feeds every round), each
    * round's 1-row argmax — already a TakeOrdered — is collected to the
    * driver (rounds × 1 row of state) and applied as a LITERAL rewrite,
    * so the final sequences are a linear chain of `rounds` map-side
    * REPLACE projections over the materialized base and the merge-record
    * relation is a local table. Identical training arithmetic and tie
    * rule; q191/q197/q231 measured ~2× faster at sf0.1. */
  private def trainLoop(tokenCounts: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = tokenCounts.sparkSession
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
      .localCheckpoint(true)
    val records = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var dead = false // an empty argmax empties the corpus, as the crossJoin did
    for (r <- 1 to rounds if !dead) {
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
      // the round's winner: ONE row of driver state (the same TakeOrdered
      // the lazy form broadcast), applied back as a literal
      val bestRows = cnt.orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (bestRows.isEmpty) dead = true
      else {
        val pair = bestRows(0).getString(0)
        records += ((r, pair, bestRows(0).getLong(1)))
        seqs = seqs.select(col("tok"), col("c"),
          replace(col("s"), lit(pair),
            lit(pair.replace("><", ""))).as("s"))
      }
    }
    if (dead) seqs = seqs.filter(lit(false))
    import spark.implicits._
    val out = records.toSeq.toDF("round", "pair", "cnt")
    (seqs, out)
  }
}
