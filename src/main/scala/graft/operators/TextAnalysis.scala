package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Text-analysis operators for a training-data pipeline: tokenization,
  * shingling, language-ID heuristic, quality scoring, token counting,
  * document fingerprinting.
  *
  * All column builders are pure Spark higher-order-function expressions —
  * map-side only, codegen-friendly, no UDFs, no shuffles. A 100 TB corpus
  * pays exactly one scan for any combination of these.
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space corpus contract; empty tokens
    * filtered so repeated separators are harmless). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** ALL word n-gram occurrences ("a b" strings) in document order —
    * the language-model event stream (repeats kept, unlike [[shingles]]).
    * Docs shorter than n yield the empty array. */
  def ngramStream(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles ("a b c" strings), the dedup unit.
    * Docs shorter than n shingle to the empty array. */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(ngramStream(toks, n))

  /** Per-token 32-bit hashes (md5-derived, cross-engine stable). */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => HashFunctions.h32(t))

  /** Order-sensitive rolling document fingerprint over token hashes. */
  def fingerprint(toks: Column): Column =
    HashFunctions.rollingFingerprint(tokenHashes(toks))

  /** Stopword list used by quality scoring / language-ID (tiny, fixed —
    * part of the operator contract so oracles can inline it). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Marker words per language for the n-gram/keyword language-ID
    * heuristic; scored by marker hits, argmax with first-wins tie order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "et", "ou"),
    "zh" -> Seq("de", "le", "he"))

  def stopwordCount(toks: Column, stopwords: Seq[String] = Stopwords): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Quality score in [0,1]: length factor x (1 - stopword ratio). A
    * deliberately simple, fully deterministic formula (the point is the
    * single-scan plumbing, not linguistic sophistication). Empty documents
    * score 0.0 — the 0/0 stopword ratio would otherwise be a runtime error
    * under Spark 4's default ANSI mode, on exactly the junk rows a quality
    * score exists to filter. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val stopRatio = stopwordCount(toks).cast("double") / n
    when(size(toks) === 0, lit(0.0))
      .otherwise(least(n / 100.0, lit(1.0)) * (lit(1.0) - stopRatio))
  }

  /** Predicted language: argmax of marker-word hits, ties resolved by the
    * declared marker order (first wins, strict >). */
  def predictedLang(toks: Column): Column = {
    val scored = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Ordered redaction rules (pattern -> replacement token), applied
    * left-to-right — rule order matters when patterns overlap (emails
    * contain digits, so the email rule must run first). Patterns stay in
    * the RE2-compatible subset (no backrefs/lookarounds) so any engine
    * reproduces them. */
  val DefaultRedactions: Seq[(String, String)] = Seq(
    // Full RFC-ish local part (._%+- legal and common: john_doe@, a+tag@) —
    // a narrower class would redact only the tail and leak partial PII
    // ("john_doe@corp.com" -> "john_<EMAIL>"). Mixed case: Bob@Corp.com
    // must not survive either.
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+" -> "<EMAIL>",
    "[0-9]+" -> "<NUM>")

  /** PII-style masking as a single map-side projection: one scan at any
    * corpus size, codegen'd regexp_replace chain, no UDF. */
  def redact(text: Column,
             rules: Seq[(String, String)] = DefaultRedactions): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Regex-based token count (BPE-ish word/number pieces). */
  def regexTokenCount(text: Column, pattern: String = "[a-z0-9]+"): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Approximate top tokens via the [[graft.functions.HeavyHitters]]
    * Misra–Gries summary: ONE scan, O(k) state per partial buffer, no
    * per-distinct-token shuffle row — the scale path for "what dominates
    * this corpus" when the vocabulary itself is too large to group by.
    * Output: (item, count, err) rows, count a lower bound with
    * `true <= count + err` (HeavyHittersSpec pins the guarantees). */
  def topTokensApprox(docs: DataFrame, textCol: String = "text", k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val hh = org.apache.spark.sql.functions.udaf(
      graft.functions.HeavyHitters(k), Encoders.STRING)
    docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(hh(col("tok")).as("hits"))
      .select(explode(col("hits")).as("h"))
      .select(col("h.item"), col("h.count"), col("h.err"))
  }

  /** Lexical diversity per document — the vocabulary-richness member of
    * the quality tier (a low-diversity doc is keyword stuffing or
    * boilerplate; the classic filter thresholds on it beside length and
    * stopword ratio). Two measures, both INTEGER-RATIONAL (the house
    * determinism rule: no libm transcendental under the hash gate, so
    * Simpson's index stands in where Shannon entropy would need a log):
    *  - ttr: type-token ratio |vocab| / n.
    *  - inv_simpson: n² / Σc_i² — the inverse Simpson index, the
    *    "effective vocabulary size" (= |vocab| when tokens are uniform,
    *    -> 1 as one token dominates).
    * Numerators/denominators are exact longs (n < 2^26 per doc keeps n²
    * < 2^53 exact in a double); each measure is ONE IEEE division,
    * rounded — both engines agree bit-for-bit. Scale shape: one
    * (doc, token) count aggregation and one per-doc roll-up, both
    * two-phase with map-side combine; no arrays cross a shuffle. */
  def tokenDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // spread-by-id first (the Dedup lesson): a single-file corpus is ONE
    // input partition, and without the shuffle the whole tokenize+explode
    // runs on one core
    tokenDiversityFromToks(Dedup.docToks(docs, idCol, textCol))

  /** [[tokenDiversity]] over a pre-tokenized [[Dedup.docToks]] relation. */
  def tokenDiversityFromToks(toks: DataFrame): DataFrame = {
    val counts = toks
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    // n² as double·double, not long·long: the factors are exact doubles
    // below 2^26 tokens/doc, and the long product would WRAP silently on a
    // pathological document while the oracle's BIGINT multiply aborts —
    // the double form keeps both engines on the same (finite) arithmetic.
    counts.groupBy("doc_id")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("ssq"))
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tok").cast("double"), 4)
          .as("ttr"),
        round(col("n_tok").cast("double") * col("n_tok").cast("double")
          / col("ssq").cast("double"), 4).as("inv_simpson"))
  }

  /** Corpus-level collocation mining over ADJACENT token pairs: lift =
    * P(a b) / (P(a ·) P(· b)) = (c_ab · N) / (c_first(a) · c_second(b)),
    * where c_ab counts the bigram, c_first/c_second count bigrams by
    * their first/second slot and N is the total bigram count — all four
    * from the ONE bigram relation, so positional marginals are exact
    * (no unigram/bigram denominator mismatch). Lift is the log-free
    * surrogate of PMI (PMI = log2 lift — same ranking, and the house
    * rule keeps libm out of hash-gated queries); lift >> 1 marks a pair
    * that co-occurs far above chance — a phrase. All counts are exact
    * longs; each is cast to double EXACTLY (< 2^53), and the
    * multiply-multiply-divide tree is fixed-shape IEEE, so both engines
    * round identically at any corpus size. Scale shape: three two-phase
    * aggregations over scalar keys plus a 1-row broadcast for N; the
    * c_first/c_second joins are equi-joins on single tokens (Zipf head
    * tokens make big groups but only LINEAR join fan-out — nothing
    * quadratic anywhere). */
  def collocationLift(docs: DataFrame, textCol: String,
                      minCount: Long, minLift: Double): DataFrame =
    // tokenize in its OWN projection (the Dedup.shingleIndex lesson). NO
    // up-front spread repartition here, unlike Dedup's operators: a
    // measured A/B (sf0.1, 32 cores) ran the spread form 2x SLOWER (0.7
    // -> 1.5 s) — the extra exchange + 32 near-empty tasks cost more
    // than single-partition tokenization of a small corpus, and the
    // first aggregation shuffle parallelizes everything downstream
    // anyway. A corpus big enough to need pre-agg parallelism arrives
    // in many input partitions already; callers that DO want an
    // explicit spread pass a repartitioned frame to
    // [[collocationLiftFromToks]].
    collocationLiftFromToks(
      docs.select(tokens(col(textCol)).as("toks")), minCount, minLift)

  /** [[collocationLift]] over a pre-tokenized [[Dedup.docToks]] relation
    * (only the `toks` column is read). */
  def collocationLiftFromToks(toks: DataFrame,
                              minCount: Long, minLift: Double): DataFrame = {
    val pairs = toks
      .select(col("toks").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("a"),
          element_at(col("t"), i + 1).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val tot = cab.agg(sum("c_ab").as("n_bg"))
    val cFirst = cab.groupBy("a").agg(sum("c_ab").as("c_first"))
    val cSecond = cab.groupBy("b").agg(sum("c_ab").as("c_second"))
    cab.join(cFirst, "a").join(cSecond, "b")
      .crossJoin(broadcast(tot))
      .select(concat(col("a"), lit(" "), col("b")).as("bigram"), col("c_ab"),
        round((col("c_ab").cast("double") * col("n_bg").cast("double"))
          / (col("c_first").cast("double") * col("c_second").cast("double")), 4)
          .as("lift"))
      .filter(col("c_ab") >= minCount && col("lift") >= minLift)
  }

  /** Vocabulary coverage / OOV-rate profiling — the "how well does a
    * fixed vocabulary cover this corpus" check run before committing to
    * a tokenizer: build the top-`vocabSize` tokens by corpus frequency
    * (ties broken lexicographically, so the boundary is deterministic),
    * then score every document by its out-of-vocabulary token fraction.
    * Documents with zero tokens have no coverage to measure and are
    * absent from the output.
    *
    * Scale shape: the vocabulary is a two-phase count aggregation ending
    * in TakeOrderedAndProject (vocabSize rows to the driver — bounded
    * state, the centroid discipline), re-broadcast as a build side; the
    * per-doc score is one explode + broadcast left-join + two-phase agg.
    * Nothing bigger than the vocabulary ever leaves an executor. */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__iv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tok").cast("double"), 4)
          .as("oov_frac"))
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A1.1): the document-level
    * heuristic gate a pretraining pipeline applies before any model-based
    * filter. Three of the canonical rules are expressible over this
    * corpus's whitespace tokens, each emitted as its own flag so a
    * pipeline can tune the gate without re-scanning:
    *  - wc_ok: token count within [minTok, maxTok];
    *  - mwl_ok: mean word length within [minMwl, maxMwl] — compared by
    *    INTEGER cross-multiplication (minMwl·n <= Σlen <= maxMwl·n), so
    *    the boundary is exact on both engines, no float quotient;
    *  - stop_ok: at least `minStop` stopword occurrences (the house
    *    6-word list, [[Stopwords]]).
    * `pass` is their conjunction. All map-side integer logic in one
    * projection — the scale shape of a filter that runs before anything
    * expensive. Σlen rides as length(concat_ws('', toks)): the exact sum
    * of token lengths without a per-token aggregate. */
  def gopherFlags(docs: DataFrame, idCol: String, textCol: String,
                  minTok: Long = 50L, maxTok: Long = 100000L,
                  minMwl: Long = 3L, maxMwl: Long = 10L,
                  minStop: Long = 2L): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("long")
    val sumLen = length(concat_ws("", t)).cast("long")
    val stops = stopwordCount(t).cast("long")
    val wcOk = (n >= minTok) && (n <= maxTok)
    val mwlOk = (n > 0) && (lit(minMwl) * n <= sumLen) && (sumLen <= lit(maxMwl) * n)
    val stopOk = stops >= minStop
    docs.select(col(idCol).as("doc_id"),
      wcOk.cast("int").as("wc_ok"),
      mwlOk.cast("int").as("mwl_ok"),
      stopOk.cast("int").as("stop_ok"),
      (wcOk && mwlOk && stopOk).cast("int").as("pass"))
  }

  /** Blocklist gate, summarized per source: how many documents contain
    * at least one listed token, and how many listed-token occurrences
    * there are — the C4-style bad-words filter's dry-run report (run the
    * report first; the gate itself is the same predicate as a filter).
    * The list is compiled INTO the projection as an array-HOF literal
    * chain (codegen'd, no join, no UDF) — the right shape while the list
    * is small; a 10⁵-term list would switch to a broadcast semi-join on
    * exploded tokens. One scan, one two-phase agg. */
  def blocklistStats(docs: DataFrame, srcCol: String, textCol: String,
                     blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    require(blocklist.forall(_.nonEmpty), "blocklist terms must be non-empty")
    val toks = tokens(col(textCol))
    // Column-built predicate, never string interpolation: a term holding
    // a quote or backslash is matched literally instead of escaping the
    // generated SQL (the lit() path has no parser to escape out of).
    val hits = size(filter(col("__toks"),
      x => blocklist.map(t => x === lit(t)).reduce(_ || _)))
    docs
      .select(col(srcCol).as("source"), toks.as("__toks"))
      .select(col("source"), hits.cast("long").as("n_hits"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_hits") > 0).cast("long")).as("flagged_docs"),
        sum(col("n_hits")).as("total_hits"),
        round(sum((col("n_hits") > 0).cast("long")).cast("double")
          / count(lit(1)).cast("double"), 4).as("flag_rate"))
  }

  /** One-scan text profile of a documents table. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("stopword_cnt", stopwordCount(t).cast("long"))
      .withColumn("quality", qualityScore(t))
      .withColumn("pred_lang", predictedLang(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
