package graft.prep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north star): tokenization, quality scoring, language ID,
  * document fingerprinting. All pure Column expressions (codegen'd
  * higher-order functions — no UDFs in these paths), each with an exact
  * DuckDB-SQL-expressible definition so every operator is oracle-checkable.
  */
object TextFunctions {

  /** whitespace tokens */
  def words(text: Column): Column = split(text, " ")

  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish token-count estimate: chars/4, the standard heuristic. */
  def tokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** count of punctuation chars */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** fraction of tokens in the stopword list */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  def stopwordRatio(text: Column): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(words(text), w => array_contains(sw, w))) /
      greatest(wordCount(text), lit(1))
  }

  /** Length/punctuation/stopword quality score in [0,1] — the standard
    * heuristic-quality-filter shape (length-normalized + punct penalty +
    * stopword prior). */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(wordCount(text) / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punctCount(text) / greatest(length(text), lit(1))) +
      lit(0.3) * stopwordRatio(text)

  /** Marker-word language-ID heuristic: per-language function-word lists,
    * predicted language = argmax marker hits with a fixed priority order on
    * ties (en > es > fr > de > zh). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "zh" -> Seq("de", "le", "shi", "zai", "he"))

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOfWords(words(text), markers)

  /** marker-hit count over an already-materialized words array — hot paths
    * must tokenize once in a prior projection and score from the array
    * column, or every per-language score re-splits the text (the
    * shinglesOfWords pitfall; dropped q_langid from 4.5 s to the cost of
    * one split + five array filters at sf0.1) */
  def langScoreOfWords(w: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(w, x => array_contains(m, x)))
  }

  /** argmax over per-language score COLUMNS (priority order on ties) —
    * pass attribute references to already-computed scores, not fresh
    * langScore expressions, so the filter runs once per language */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit(scores.last._1)) { case (acc, (code, s)) =>
      when(s === maxScore, lit(code)).otherwise(acc)
    }
  }

  /** predicted language code (one-shot convenience; see langIdFromScores) */
  def langId(text: Column): Column =
    langIdFromScores(langMarkers.map { case (c, m) => c -> langScore(text, m) })

  /** whole-document fingerprint */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Winnowing-style robust fingerprint: the minimum md5 over all 8-char
    * rolling windows — stable under small edits anywhere but the minimal
    * window. */
  /** min rolling md5 as ONE codegen'd expression — the Column-composed form
    * (`array_min(transform(sequence(...), i -> md5(substring(...))))`)
    * allocates a substring + digest + hex string per window and was the
    * bench's second-hottest scan; see [[graft.functions.WinnowMd5]]. */
  def winnowFingerprint(text: Column): Column =
    graft.functions.VectorFunctions.winnow_md5(text, 8)

  /** word n-gram shingles (distinct) over an already-materialized words
    * array — the dedup unit. Take the words column from a separate
    * projection (`withColumn("_words", words(text))`): referencing
    * `split()` directly here would re-tokenize the text for every
    * element_at in the lambda (measured 2s of 5.5s in minhash at sf0.1). */
  def shinglesOfWords(w: Column, n: Int = 3): Column =
    array_distinct(shinglesOfWordsAll(w, n))

  /** word n-gram shingles WITH duplicates (positional) — repetition metrics
    * need the multiset; dedup wants the distinct [[shinglesOfWords]]. Same
    * materialize-the-words-column caveat applies. */
  def shinglesOfWordsAll(w: Column, n: Int): Column =
    when(size(w) < n, array())
      .otherwise(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))

  /** Normalization for dedup/tokenizer prep: lowercase, digit-run masking
    * to `<num>`, whitespace collapse, trim. Both q_normalize_text and its
    * spec reference THIS definition so they cannot drift. Materialize in
    * its own projection when referenced more than once. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[0-9]+", "<num>"), " +", " "))

  /** convenience form over raw text (fine for one-shot use; hot paths
    * should materialize the words array and call shinglesOfWords) */
  def wordShingles(text: Column, n: Int = 3): Column =
    shinglesOfWords(words(text), n)

  // ------------------------------------------------------------- PII scrub

  /** PII patterns deliberately restricted to syntax with IDENTICAL
    * semantics in Java regex (Spark codegen) and RE2 (DuckDB oracle):
    * character classes, bounded repetition, ASCII `\d`/`\b` — no
    * backreferences, no lookaround (RE2 has neither). */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** count of non-overlapping matches (regexp_extract_all keeps both
    * engines on the same leftmost-non-overlapping scan) */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** mask emails then IPv4s — the order matters (an email's host can
    * contain a dotted quad; masking emails first keeps the verdicts
    * disjoint), so both engines must apply the same sequence */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
      lit(ipv4Re), lit("<IP>"))

  /** BPE symbol-sequence codec (q_bpe_merges): symbols travel as one
    * US-separated string, so the greedy merge fold below is a plain string
    * accumulator. US (0x1F) cannot occur inside `[a-z]+` symbols. */
  val bpeSep = "\u001F"

  /** word → its initial symbol encoding (one symbol per character) */
  def bpeEncode(w: Column): Column =
    concat_ws(bpeSep,
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))

  /** Greedy LEFT-TO-RIGHT merge of adjacent pair (a, b) within one encoded
    * word — Sennrich et al. 2016's sequential rule: after a merge the new
    * symbol `ab` is what the NEXT position compares against, so "aaaaaa"
    * under (a,a) becomes [aa,aa,aa], never [aa,a,aa,a]. Implemented as a
    * codegen'd aggregate() fold: the accumulator's last symbol equals `a`
    * iff the accumulator IS `a` (first symbol) or ends with SEP+`a`
    * (symbols never contain SEP), and merging appends `b` WITHOUT the
    * separator — concatenation is the merge. Single-symbol words skip the
    * fold (empty slice → the initial element). The DuckDB oracle replays
    * the identical fold via list_reduce. */
  def bpeMergeFold(enc: Column, a: String, b: String): Column = {
    val syms = split(enc, bpeSep)
    aggregate(
      slice(syms, lit(2), size(syms) - 1), element_at(syms, lit(1)),
      (acc, x) => when(((acc === lit(a)) || acc.endsWith(bpeSep + a)) &&
          (x === lit(b)),
        concat(acc, x)).otherwise(concat(acc, lit(bpeSep), x)))
  }

  /** Per-doc BPE token count under an ordered merge list — the third
    * deliberate tight-loop UDF (precedent: Dedup's minhash and simhash):
    * the greedy merge fold is inherently sequential per word, and running
    * it as higher-order expressions evaluates interpreted per FOLD STEP
    * (measured 5.5 s warm over 5k docs at sf0.1) where this loop runs
    * once per ROW (~0.2 s). Chain semantics identical to [[bpeMergeFold]]
    * (both are pinned by the same spec); training stays expression-based
    * because it runs over the Heaps-bounded distinct-word vocab, where
    * the interpreted fold is cheap. */
  def bpeTokenCountUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ws: Seq[String]) =>
      var total = 0L
      for (w <- ws) {
        var syms: Array[String] = w.map(_.toString).toArray
        for ((a, b) <- merges) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms)
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = a + b
            else out += x
          syms = out.toArray
        }
        total += syms.length
      }
      total
    }
}
