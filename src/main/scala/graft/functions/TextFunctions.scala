package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * builtin column expressions (codegen'd; no UDFs), so they mirror 1:1
  * into ANSI SQL for oracle checks and stay cheap at 100 TB.
  */
object TextFunctions {

  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Let-binding for expression trees: evaluates `value` once and exposes
    * it to `body` as a lambda variable. Higher-order functions run as
    * CodegenFallback (no common-subexpression elimination), so a subtree
    * referenced N times inside a lambda is otherwise re-evaluated N times
    * per element — for tokens() inside a sliding window that is
    * O(|tokens|^2) per row (measured 275 task-seconds at sf0.01 vs ~4
    * after binding). */
  private def letBind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs + digits + punctuation marks
    * each count as one token (a cheap deterministic stand-in for a real
    * BPE vocab; ~whitespace*1.3 on English text). */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  // ---- readability ---------------------------------------------------

  /** Sentence count: runs of terminal punctuation, floored at 1 so a
    * fragment without punctuation still scores as one sentence. */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("long")

  /** Syllable heuristic: vowel-group runs in the lowercased text (the
    * standard cheap estimator — 'readability' → read·a·bil·i·ty counts
    * its 4 vowel groups), floored at 1. */
  def syllableCount(text: Column): Column =
    greatest(regexp_count(lower(text), lit("[aeiouy]+")), lit(1)).cast("long")

  /** Flesch-Kincaid grade level in exact micro-units:
    * round(1e6 · (0.39·words/sentences + 11.8·syllables/words − 15.59)).
    * The three counts are exact integers and every coefficient is an
    * integral double (390000, 11800000, 15590000), so the grade is ONE
    * fixed double expression over exact longs — engine-replayable. The
    * curation gate for "too academic / too fragmentary" text buckets. */
  def fleschKincaidMicro(text: Column): Column = {
    val w = greatest(tokenCount(text), lit(1)).cast("long")
    val s = sentenceCount(text)
    val y = syllableCount(text)
    round(lit(390000.0) * w.cast("double") / s.cast("double") +
      lit(11800000.0) * y.cast("double") / w.cast("double") -
      lit(15590000.0)).cast("long")
  }

  // ---- language ID ---------------------------------------------------

  /** Tiny per-language stopword signals (top function words). */
  private val stops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por", "para", "con"))

  private def stopHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stops(lang))))

  /** Heuristic language ID over {en,de,fr,es,zh,unknown}: CJK character
    * presence wins for zh; otherwise the language with the most stopword
    * hits (ties break en>de>fr>es); no hits → 'unknown'. */
  def langId(text: Column): Column =
    letBind(tokens(text)) { toks =>
      letBind(array(stopHits(toks, "en"), stopHits(toks, "de"),
        stopHits(toks, "fr"), stopHits(toks, "es"))) { hits =>
        val cjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
        val en = element_at(hits, 1); val de = element_at(hits, 2)
        val fr = element_at(hits, 3); val es = element_at(hits, 4)
        val best = greatest(en, de, fr, es)
        when(cjk > 0, lit("zh"))
          .when(best === 0, lit("unknown"))
          .when(en === best, lit("en"))
          .when(de === best, lit("de"))
          .when(fr === best, lit("fr"))
          .otherwise(lit("es"))
      }
    }

  // ---- quality scoring -----------------------------------------------

  /** Exact integer floor division (both sides ≥ 0 here, so floor ≡
    * truncate and the DuckDB `//` operator computes the same value).
    * A floating `floor(a / b)` can misround when the true quotient sits
    * within half an ulp of an integer; integral divide cannot. */
  private def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(a), expression(b)))
  }

  /** Encoding-damage census — the ftfy-class cleanliness signal a web
    * corpus screens on before training: counts of U+FFFD replacement
    * characters (a decoder already gave up), C1 control codepoints
    * U+0080–U+009F (classic cp1252-as-Latin-1 smoke), and the
    * UTF-8-read-as-Latin-1 lead characters Ã/Â (the "cafÃ©" mojibake
    * family — a heuristic lead, legitimate in e.g. Portuguese, which is
    * why it feeds a RATE, not a verdict by itself). Returns a struct
    * (n_replacement, n_c1_controls, n_moji_leads, damage_ppm, damaged):
    * damage_ppm = ⌊damage·10⁶/len⌋ exact integer parts-per-million;
    * damaged = any U+FFFD, or rate ≥ 5000 ppm (0.5%).
    *
    * Counting is translate-delete arithmetic (len − len(stripped)) —
    * no regex, no unicode-class dialect to disagree across engines;
    * every count replays in SQL as the identical expression. Pure
    * map-side codegen'd column algebra. */
  def encodingDamage(text: Column): Column = {
    val len = length(text).cast("long")
    def gone(matching: String): Column =
      (length(text) - length(translate(text, matching, ""))).cast("long")
    val nRepl = gone("\uFFFD")
    val nC1 = gone((0x80 to 0x9F).map(_.toChar).mkString)
    val nLead = gone("\u00C3\u00C2")
    val ppm = idiv((nRepl + nC1 + nLead) * lit(1000000L),
      greatest(len, lit(1L)))
    struct(nRepl.as("n_replacement"), nC1.as("n_c1_controls"),
      nLead.as("n_moji_leads"), ppm.as("damage_ppm"),
      (nRepl > 0 || ppm >= lit(5000L)).as("damaged"))
  }

  /** Deterministic [0,1] quality score: length saturation, low
    * punctuation density, stopword presence, sane mean word length.
    * Computed entirely in fixed-point micro-units (Long, 1e6 = 1.0)
    * with a single exact double division at the end: every sub-score is
    * floor(rational · 1e6) over non-negative integers, so the value is
    * exact by construction and a cross-engine compare cannot flip at a
    * rounding boundary (the earlier double formulation landed within
    * 1 ulp of a round(·, 6) boundary on ~2/5000 rows at sf0.1).
    * micro/1e6 of an exact integer is one correctly-rounded IEEE-754
    * division — bit-identical in any conforming engine. */
  def qualityScore(text: Column): Column = letBind(tokens(text)) { toks =>
    val S = 1000000L
    val nTok = size(toks).cast("long")
    val nChar = length(text).cast("long")
    val punct = regexp_count(text, lit("[^A-Za-z0-9\\s]"))
    val tokDen = greatest(nTok, lit(1L))
    val charDen = greatest(nChar, lit(1L))
    val lenScore = least(idiv(nTok * S, lit(64L)), lit(S))
    val punctScore = lit(S) - least(idiv(punct * 4L * S, charDen), lit(S))
    val stopScore =
      least(idiv(stopHits(toks, "en").cast("long") * 5L * S, tokDen), lit(S))
    // mean word length m = (nChar − nTok + 1)/nTok vs target 5:
    // |m − 5| / 5 = |num − 5·den| / (5·den) — same rational, integer terms
    val num = nChar - nTok + lit(1L)
    val wordScore = lit(S) -
      least(idiv(abs(num - lit(5L) * tokDen) * S, lit(5L) * tokDen), lit(S))
    idiv(lenScore * 3L + punctScore * 3L + stopScore * 2L + wordScore * 2L,
      lit(10L)).cast("double") / lit(1000000.0)
  }

  /** Gopher-style quality rule bundle (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A — the published
    * web-corpus filter set, trimmed to signals computable without line
    * structure): word-count bounds, mean-word-length band, symbol and
    * digit density caps, stopword presence. Returns a struct of raw
    * signals, per-rule booleans, and an overall `pass`, so pipelines
    * can filter on `pass` or report the failing-rule distribution.
    * Pure builtin column algebra — one tokens pass per row. */
  def gopherStats(text: Column): Column = letBind(tokens(text)) { toks =>
    val nWords = size(toks)
    val nChar = length(text).cast("double")
    val wordChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double")
    val meanLen = wordChars / greatest(nWords.cast("double"), lit(1.0))
    val symFrac = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(nChar, lit(1.0))
    val digFrac = regexp_count(text, lit("[0-9]")).cast("double") /
      greatest(nChar, lit(1.0))
    val wordsOk = nWords >= 50 && nWords <= 100000
    val meanOk = meanLen >= 3.0 && meanLen <= 10.0
    val symOk = symFrac < 0.1
    val digOk = digFrac < 0.2
    val stopOk = stopHits(toks, "en") >= 2
    struct(
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symFrac, 6).as("symbol_frac"),
      round(digFrac, 6).as("digit_frac"),
      wordsOk.as("words_ok"), meanOk.as("mean_len_ok"),
      symOk.as("symbol_ok"), digOk.as("digit_ok"), stopOk.as("stopword_ok"),
      (wordsOk && meanOk && symOk && digOk && stopOk).as("pass"))
  }

  // ---- repetition signals (Gopher-style quality rules) ----------------

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 − |distinct|/|tokens|. High values flag boilerplate/spam — the
    * classic "duplicate line fraction" family of web-corpus filters. */
  def dupTokenFraction(text: Column): Column = letBind(tokens(text)) { toks =>
    when(size(toks) === 0, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"), 6))
  }

  /** Same signal over word n-grams (default bigrams): catches repeated
    * phrases that unigram dedupe misses. */
  def dupNgramFraction(text: Column, n: Int = 2): Column =
    letBind(tokens(text)) { toks =>
      letBind(when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))) { grams =>
        round(lit(1.0) - size(array_distinct(grams)).cast("double") /
          greatest(size(grams), lit(1)).cast("double"), 6)
      }
    }

  // ---- PII redaction ---------------------------------------------------

  /** Redact common PII shapes (emails, IPv4 literals, long digit runs)
    * with typed placeholders. Pure regexp_replace chain — codegen'd,
    * order-sensitive (emails first: they contain dots and digits). The
    * regexes are RE2-compatible so the same patterns run in the DuckDB
    * oracle. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val ip = regexp_replace(email,
      lit("\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"), lit("<IP>"))
    regexp_replace(ip, lit("\\b\\d{9,}\\b"), lit("<PHONE>"))
  }

  /** Typed PII incidence counts on the ORIGINAL text — the audit
    * half of [[redactPii]] (a release data card reports how much PII
    * the scrub removed per source; the redactor alone can't say).
    * Adds two detectors redaction folds into coarser buckets:
    * SSN-shaped 3-2-4 ids and separator-style 3-3-4 phone numbers
    * (disjoint shapes; a dotted phone never has the four octet
    * groups an IPv4 needs). All patterns RE2-compatible so the
    * DuckDB oracle counts with the same regexes. Returns a struct
    * (n_email, n_ssn, n_phone, n_ip) of INT counts; map-only. */
  def piiCounts(text: Column): Column = {
    def cnt(pat: String) =
      size(regexp_extract_all(text, lit(pat), lit(0)))
    struct(
      cnt("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        .as("n_email"),
      cnt("\\b\\d{3}-\\d{2}-\\d{4}\\b").as("n_ssn"),
      cnt("\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b|\\b\\d{9,}\\b")
        .as("n_phone"),
      cnt("\\b\\d{1,3}(\\.\\d{1,3}){3}\\b").as("n_ip"))
  }

  /** Unicode NFC canonicalization (native codegen'd expression —
    * [[NfcNormalize]]): run BEFORE exact/near dedup and hashing, so
    * precomposed and combining-mark renditions of the same text
    * collapse. Fast path skips already-normalized rows. */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(NfcNormalize(expression(text)))
  }

  // ---- confusable-skeleton normalization -------------------------------

  /** Homoglyph source characters for [[confusableSkeleton]]: the
    * Cyrillic and Greek letters that render identically (or nearly so)
    * to a Latin letter — the standard spoofing alphabet (Unicode
    * TR#39's highest-traffic confusables). Public so oracles and
    * external replays embed the identical mapping. Kept 1:1 with
    * [[confusableTo]]. */
  val confusableFrom: String =
    "аеорсхуіѕԁј" + // Cyrillic а е о р с х у і ѕ ԁ ј
      "αονρυκ" // Greek α ο ν ρ υ κ
  /** Latin skeleton targets, positionally matching [[confusableFrom]]. */
  val confusableTo: String = "aeopcxyisdj" + "aovpyk"

  /** Confusable skeleton: lowercase, strip zero-width characters
    * (ZWSP/ZWNJ/ZWJ/BOM — the invisible dedupe-evasion bytes), then map
    * the high-traffic Cyrillic/Greek homoglyphs onto their Latin
    * skeleton. Two visually-identical strings that differ only by
    * script spoofing or invisible characters collapse to one skeleton —
    * the dedupe key that catches adversarial near-duplicates exact and
    * NFC dedupe both miss (NFC is a normalization within one script;
    * the spoofed duplicate *is* NFC-normal). Pure codegen'd column
    * algebra (one regex strip + one translate); the full TR#39 table
    * plugs in at the same two constants. */
  /** The zero-width strip class, RE2-safe (`\x{…}` escapes work in both
    * java.util.regex and RE2, unlike `\uXXXX`) and escaped so the source
    * file carries no invisible characters. */
  val zeroWidthClass: String = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"

  def confusableSkeleton(text: Column): Column =
    translate(
      regexp_replace(lower(text), zeroWidthClass, ""),
      confusableFrom, confusableTo)

  // ---- markup stripping ----------------------------------------------

  /** HTML/markup → text: drop script/style blocks wholesale (their
    * content is code, not prose), strip comments and tags, decode the
    * common entities (`&amp;` LAST, so `&amp;lt;` decodes to the
    * literal `&lt;` it denotes rather than double-decoding to `<`),
    * and collapse whitespace. Map-only column algebra — the first
    * stage of any web-corpus curation chain, before quality scoring
    * and shingling (tag soup poisons both: `<div>` fragments dominate
    * n-gram vocabularies and quality features count markup as punct).
    *
    * Deliberately RE2-safe regexes (no backreferences, no lookaround)
    * so the exact transform replays in engines whose regex dialect is
    * RE2 — the oracle story, same spirit as the portable md5 hashes.
    * This is a curation-grade extractor, not a spec-complete HTML
    * parser: CDATA, conditional comments and malformed nesting are out
    * of scope (a production readability pass plugs in at the same
    * column seam). */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      lit("(?is)<script\\b[^>]*>.*?</script\\s*>"), lit(" "))
    val noStyle = regexp_replace(noScript,
      lit("(?is)<style\\b[^>]*>.*?</style\\s*>"), lit(" "))
    val noComment = regexp_replace(noStyle, lit("(?s)<!--.*?-->"), lit(" "))
    val noTags = regexp_replace(noComment, lit("(?s)<[^>]+>"), lit(" "))
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) =>
        // entity strings contain no regex metacharacters — the same
        // literal pattern string replays under both Java regex and RE2
        regexp_replace(c, lit(e), lit(v)) }
    trim(regexp_replace(ent, lit("\\s+"), lit(" ")))
  }

  // ---- fingerprinting ------------------------------------------------

  /** Whole-document content fingerprint (normalized token stream hash). */
  def contentFingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** Winnowing-lite rolling fingerprint: min hash over a sliding
    * n-token window — stable under small appends, cheap candidate key
    * for near-dup grouping. Token granularity keeps the per-row work at
    * ~|tokens| hashes (a character-k-gram roll costs |chars| substring
    * allocations — measured ~6× slower for the same discrimination on
    * word-shaped text). */
  def rollingFingerprint(text: Column, n: Int = 3): Column =
    letBind(tokens(text)) { toks =>
      // hash each window's tokens directly — no per-window slice array
      // or concat string (same shape as Dedup.hashedShingles)
      array_min(when(size(toks) < n, array(xxhash64(concat_ws(" ", toks))))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => xxhash64((0 until n).map(j => element_at(toks, i + j + 1)): _*))))
    }

  /** Positional k-gram hash stream (token order preserved — winnowing
    * needs window positions, so no distinct/sort here, unlike
    * `Dedup.hashedShingles`). Sub-k documents collapse to one
    * whole-stream gram. `h` maps the gram's tokens to its hash. */
  private def orderedGramHashes(toks: Column, k: Int,
      h: Seq[Column] => Column): Column =
    when(size(toks) < k, array(h(Seq(concat_ws(" ", toks)))))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => h((0 until k).map(j => element_at(toks, i + j + 1)))))

  /** Window minima → distinct fingerprint set. Streams shorter than the
    * window select their single global min. */
  private def winnowOver(grams: Column, w: Int): Column =
    letBind(grams) { g =>
      array_distinct(
        when(size(g) <= w, array(array_min(g)))
          .otherwise(transform(sequence(lit(0), size(g) - w),
            j => array_min(slice(g, j + 1, lit(w))))))
    }

  /** FULL winnowing fingerprint set (Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 §4 — the MOSS algorithm; [[rollingFingerprint]] is the
    * single-global-min "lite" cousin): hash every word k-gram in
    * order, slide a window of `w` consecutive gram hashes, record each
    * window's MINIMUM; the distinct selected hashes are the
    * fingerprint. The paper's guarantee carries over at token
    * granularity: any shared run of ≥ w + k − 1 tokens between two
    * documents shares at least one fingerprint, and expected density
    * is 2/(w+1) of the grams — local, position-robust, and small.
    * Per-row cost is O(grams · w) comparisons, pure column algebra. */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    letBind(tokens(text)) { toks =>
      winnowOver(orderedGramHashes(toks, k, parts => xxhash64(parts: _*)), w)
    }

  /** [[winnowFingerprints]] on a portable 60-bit md5 gram hash (first
    * 15 hex chars of md5 over the space-joined gram — the same
    * cross-engine trick as `Curation.hashSamplePortable`), so any SQL
    * engine replays the exact fingerprint set. The xxhash64 fast path
    * above stays the production default (one fused hash per gram vs
    * md5 + string concat here). */
  def winnowFingerprintsPortable(text: Column, k: Int = 3, w: Int = 4): Column =
    letBind(tokens(text)) { toks =>
      winnowOver(orderedGramHashes(toks, k,
        parts => conv(substring(md5(concat_ws(" ", parts: _*)), 1, 15), 16, 10)
          .cast("long")), w)
    }

  /** Canonical URL for web-corpus dedup and SIEM log joins — the same
    * address crawled as `HTTPS://Www.Ex.COM:443/a/?utm_source=x&b=2&a=1#f`
    * and `https://www.ex.com/a?a=1&b=2` must collapse to ONE key before
    * any URL-level dedup/frequency/blocklist step (CommonCrawl-style
    * pipelines dedup by canonical URL before touching content; a SIEM
    * joins proxy logs on it). Deterministic string algebra, no UDF, no
    * network classes — replayable in SQL:
    *
    *  - scheme and host lowercase (RFC 3986 §6.2.2.1); path case kept;
    *  - default ports dropped (:80 on http, :443 on https);
    *  - fragment dropped;
    *  - tracking params removed (`utm_*`, `gclid`, `fbclid`), the rest
    *    SORTED (reordered duplicates collapse — the dedup trade, not a
    *    semantics claim);
    *  - trailing path slashes trimmed, bare host → "/".
    *
    * Malformed (scheme-less) input returns null — callers keep the raw
    * string alongside. Map-only: ~5 regex extracts per row and one
    * bounded param sort, linear at any corpus size. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = letBind(regexp_replace(rawPath, "/+$", "")) { trimmed =>
      when(trimmed === "", lit("/")).otherwise(trimmed)
    }
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val sortedQ = array_join(array_sort(params), "&")
    when(scheme =!= "" && host =!= "",
      concat(scheme, lit("://"), host, path,
        when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit(""))))
  }

  /** The reference family's URL-dissection function surface
    * (`protocol`/`domain`/`topLevelDomain`/`firstSignificantSubdomain`
    * /`path`/`extractURLParameter`) as pure regex column algebra —
    * map-side, codegen'd, no shuffle. Patterns avoid lookarounds so
    * any RE2-class engine (the oracle included) replays them
    * verbatim. Unmatched parts come back as '' (the family's
    * convention), not null.
    *
    * firstSignificantSubdomain follows the family's simplification
    * for the common case — the label LEFT of the TLD — without the
    * public-suffix list (com.tr-style two-level suffixes resolve to
    * the suffix's own second label); documented divergence, the list
    * is data not code. */
  object Url {
    def protocol(u: Column): Column =
      lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    def domain(u: Column): Column =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    def topLevelDomain(u: Column): Column =
      regexp_extract(domain(u), "\\.([A-Za-z0-9-]+)$", 1)
    def firstSignificantSubdomain(u: Column): Column =
      regexp_extract(domain(u), "([A-Za-z0-9-]+)\\.[A-Za-z0-9-]+$", 1)
    def path(u: Column): Column =
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    def extractParameter(u: Column, name: String): Column = {
      require(name.matches("[A-Za-z0-9_]+"),
        s"extractParameter: unsafe parameter name $name")
      regexp_extract(u, s"[?&]$name=([^&#]*)", 1)
    }
  }
}
