"""Text-analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` column expressions (JVM, codegen) —
language-ID, quality scoring, token counting, and rolling-hash
fingerprinting over a ``documents``-shaped table. Each has an exact ANSI
SQL equivalent (the DuckDB oracles in ``__spark_entry__``), so every
operator here is verified value-for-value against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic stopword marker sets for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS = LANG_MARKERS["en"] + ["for", "with", "that", "this"]

FP_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (so leading/trailing
    whitespace is neutral — identical in Spark and ANSI SQL)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    toks = tokens(F.col(text_col))
    total_len = F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(total_len / F.greatest(F.size(toks), F.lit(1)), 4)
         .alias("avg_token_len"))


def quality_score_col(text: Column) -> Column:
    """The composite quality score as a bare Column — for callers that
    fuse the score into a larger single-pass projection (plans/
    pipeline.py row stages) instead of materializing the per-feature
    frame. MUST stay formula-identical to :func:`quality_scores`'s
    ``quality_score`` (the oracle-checked surface)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    n_chars = F.length(text)
    n_alpha = n_chars - F.length(F.regexp_replace(text, r"[A-Za-z]", ""))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    return (F.least(n_tok / F.lit(20.0), F.lit(1.0)) * 0.4
            + stop_ratio * 0.3 + alpha_ratio * 0.3)


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: stopword ratio, punctuation ratio,
    alpha ratio, and a composite score. Mirrors the shape of standard
    pretraining-corpus quality filters."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    n_alpha = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z]", ""))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    score = quality_score_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"))


def _marker_count(toks: Column, words: list[str]) -> Column:
    # NB: the predicate must be a 1-arg lambda — a second parameter
    # (even defaulted) makes Spark pass the array index into it
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def pred_lang_col(text: Column) -> Column:
    """The argmax language prediction as a bare Column — for callers
    that fuse language ID into a larger single-pass projection (plans/
    pipeline.py row stages). MUST stay decision-identical to
    :func:`lang_id`'s ``pred_lang`` (the oracle-checked surface):
    same marker sets, same alphabetical tie-break."""
    toks = tokens(F.lower(text))
    langs = sorted(LANG_MARKERS)
    pairs = F.array(*[
        F.struct(_marker_count(toks, LANG_MARKERS[l]).alias("s"),
                 F.lit(len(langs) - i).alias("prio"),
                 F.lit(l).alias("lang"))
        for i, l in enumerate(langs)])
    return F.array_max(pairs)["lang"]


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: score per language = matching tokens;
    prediction = argmax with deterministic alphabetical tie-break."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = [_marker_count(toks, words).alias(f"score_{lang}")
              for lang, words in sorted(LANG_MARKERS.items())]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    # argmax via greatest over (score, inverted-lang) struct ordering
    pairs = F.array(*[
        F.struct(F.col(f"score_{l}").alias("s"),
                 F.lit(len(langs) - i).alias("prio"),
                 F.lit(l).alias("lang"))
        for i, l in enumerate(langs)])
    best = F.array_max(pairs)
    return scored.select(id_col, *[f"score_{l}" for l in langs],
                         best["lang"].alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic rolling polynomial hash over the token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc*31 + len(t)*131 + ascii(t[0]))
    % 1e9+7)`` — identical arithmetic is expressible in ANSI SQL, so the
    fingerprint is engine-portable (unlike builtin hash functions)."""
    toks = tokens(F.col(text_col))
    tok_h = F.transform(
        toks, lambda x: (F.length(x).cast("long") * 131
                         + F.ascii(x).cast("long")))
    fp = F.aggregate(
        tok_h, F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(FP_MOD).cast("long"))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# -- PII redaction -----------------------------------------------------------

# Order matters: emails before bare domains, long digit runs (cards)
# before phones. Patterns are deliberately RE2-safe (no lookaround, no
# backreferences) so any engine — Spark's Java regex, DuckDB/RE2 —
# produces identical redactions; that portability is what makes the
# redaction auditable with an independent oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b(?:\d[ -]?){13,16}\d\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails, card-like digit runs, IPv4 addresses, and phone
    numbers with ``<TYPE>`` tokens — chained global regexp_replace,
    pure codegen, no Python."""
    out = text
    for name, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts + the redacted text — the scrub
    stage of a training-data pipeline, with the counts kept for
    filtering decisions (e.g. drop documents above a PII density)."""
    cols = [F.col(id_col)]
    for name, pattern in PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pattern), 0))
            .cast("long").alias(f"n_{name}"))
    cols.append(redact_pii(F.col(text_col)).alias("redacted"))
    return df.select(*cols)


def repetition_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals for quality filtering:

    * ``dup_line_frac`` — 1 - distinct/total lines (boilerplate, menus,
      chat headers repeat lines);
    * ``top_bigram_frac`` — share of the most frequent word bigram
      among all bigram occurrences (degenerate generations repeat one
      phrase).

    Both metrics are per-row array expressions — ZERO shuffles. The
    bigram mode (most frequent bigram's count) is computed per row as
    the longest equal run of the doc's sorted bigram array (exact
    string equality, no hashing): sorting groups equal bigrams
    adjacently, so one fold tracking (prev, run, best) yields the mode
    count. The earlier corpus-wide (doc, bigram) count → per-doc max
    shape shuffled every bigram occurrence twice; the mode of a
    DOCUMENT's own bigrams never needed corpus-wide state (measured
    21.5 s → ~1 s at sf1.0, "2 Exchange → 0").
    """
    text = F.col(text_col)
    lines = F.split(F.col("__t"), "\n")
    n_lines = F.size(lines)

    # STAGED projections: interpreted HOF lambda bodies re-evaluate any
    # non-attribute subtree per element (no CSE), so the word array,
    # the bigram array, and the fold result each materialize as a
    # column before the next step references them — without this the
    # split() re-runs per bigram position and the fold per output
    # reference (the same trap word_hashes documents).
    s1 = df.select(F.col(id_col), text.alias("__t"),
                   F.split(F.trim(text), r"\s+").alias("__words"))
    nw = F.size("__words")
    bigrams = F.when(nw >= 2, F.transform(
        F.sequence(F.lit(0), nw - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("__words"), i + 1, 2)))
    ).otherwise(F.array().cast("array<string>"))
    s2 = s1.select(F.col(id_col), F.col("__t"), bigrams.alias("__bg"))
    # mode count = longest equal run of the sorted bigram array
    run0 = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))
    top_n = F.aggregate(
        F.array_sort(F.col("__bg")), run0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
             .otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
                 .otherwise(F.lit(1).cast("long"))).alias("best")),
        lambda acc: acc["best"])
    s3 = s2.select(F.col(id_col), F.col("__t"),
                   top_n.alias("top_bigram_n"),
                   F.size("__bg").cast("long").alias("n_bigrams"))
    return s3.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines))
                / F.greatest(n_lines, F.lit(1)), 6).alias("dup_line_frac"),
        F.col("top_bigram_n"),
        F.col("n_bigrams"),
        F.round(F.col("top_bigram_n")
                / F.greatest(F.col("n_bigrams"), F.lit(1)), 6)
         .alias("top_bigram_frac"))


# GPT-2-style pretokenizer pattern, restricted to constructs Java regex
# and RE2 tokenize identically (no \p classes, no lookahead): English
# contractions, space-prefixed letter/digit runs, a punctuation/other
# fallback bucket (catches CJK), and whitespace runs.
BPE_ISH_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                   r"| ?[^\sA-Za-z0-9']+|\s+")


def bpe_token_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Token counting with a BPE-ish pretokenizer regex — the budget
    currency of an LLM pipeline is tokens, not characters, and a
    GPT-2-style split tracks real tokenizer counts far better than
    whitespace words. Emits the whitespace count too so the ratio is
    available for filtering (code/CJK-heavy docs skew it)."""
    text = F.col(text_col)
    pieces = F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)
    ws = tokens(text)
    n_pieces = F.size(pieces).cast("long")
    return df.select(
        F.col(id_col),
        n_pieces.alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.round(F.length(text) / F.greatest(n_pieces, F.lit(1)), 6)
         .alias("chars_per_token"))


def corpus_report(df: DataFrame, lang_col: str = "lang",
                  source_col: str = "source", text_col: str = "text",
                  chars_col: str = "n_chars",
                  short_chars: int = 100) -> DataFrame:
    """Per-(lang, source) dataset report card in ONE aggregation pass:
    document counts, character/token mass, and the short-document
    fraction a curation run watches. Shuffle size = the tiny
    (lang, source) grid; token counting is a codegen expression, so the
    scan stays a pure map stage before the single groupBy.

    Means divide two exact integers in double arithmetic (identical in
    any engine) — no float summation order dependence.
    """
    toks = F.size(tokens(F.col(text_col)))
    return (df.groupBy(F.col(lang_col).alias("lang"),
                       F.col(source_col).alias("source"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(chars_col).cast("long").alias("chars_total"),
                   F.sum(toks).cast("long").alias("tokens_total"),
                   F.sum(F.when(F.col(chars_col) < short_chars, 1)
                          .otherwise(0)).cast("long").alias("short_docs"))
              .select("lang", "source", "n_docs", "chars_total",
                      "tokens_total", "short_docs",
                      F.round(F.col("chars_total")
                              / F.col("n_docs").cast("double"), 6)
                       .alias("chars_mean_r"),
                      F.round(F.col("short_docs")
                              / F.col("n_docs").cast("double"), 6)
                       .alias("short_frac_r")))


def chunk_text(df: DataFrame, size: int, overlap: int = 0,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Explode documents into fixed-size character windows with
    ``overlap`` carried between consecutive chunks (stride = size -
    overlap) — the retrieval / context-window prep step.

    Pure codegen: a ``sequence`` of chunk starts + ``transform`` +
    ``explode`` — no shuffle, no Python; fan-out is bounded by
    ceil(len/stride). The trailing chunk keeps its natural short
    length. Deterministic chunk ids = (doc, ordinal).
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    text = F.col(text_col)
    n = F.length(text)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(size)) / F.lit(stride)), F.lit(0))
         .cast("long") * F.lit(stride),
        F.lit(stride))
    chunks = F.transform(
        starts, lambda s, i: F.struct(
            i.cast("long").alias("chunk_id"),
            s.cast("long").alias("chunk_start"),
            F.substring(text, (s + 1).cast("int"), size).alias("chunk")))
    return (df.where(n > 0)
              .select(F.col(id_col), F.explode(chunks).alias("c"))
              .select(id_col, "c.chunk_id", "c.chunk_start", "c.chunk"))


#: RE2-safe URL matcher (no backtracking constructs) — identical
#: semantics in Java regex and DuckDB's RE2.
URL_PATTERN = r"https?://[^\s]+"
_DOMAIN_PATTERN = r"https?://([^/:\s?#]+)"


def url_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document URL inventory: extracted URLs, count, and distinct
    lowercased domains — pure codegen regexp_extract_all, no shuffle."""
    urls = F.coalesce(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0),
        F.array().cast("array<string>"))
    domains = F.array_distinct(F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, _DOMAIN_PATTERN, 1))))
    return df.select(
        F.col(id_col), urls.alias("urls"),
        F.size(urls).cast("long").alias("n_urls"),
        domains.alias("domains"))


def domain_counts(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide domain histogram: docs containing each domain and
    total URL mentions. One explode + one hash aggregation (shuffle
    size = |domains|) — the input for blocklist curation."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    per_url = (df.select(F.col(id_col).alias("doc_id"),
                         F.explode(urls).alias("url"))
                 .select("doc_id",
                         F.lower(F.regexp_extract("url", _DOMAIN_PATTERN,
                                                  1)).alias("domain")))
    return (per_url.groupBy("domain")
                   .agg(F.countDistinct("doc_id").alias("n_docs"),
                        F.count(F.lit(1)).alias("n_urls")))


def blocklisted_domain_pred(text: Column, blocklist: list[str]) -> Column:
    """TRUE when the text mentions any blocklisted domain — the bare
    predicate behind :func:`filter_blocklisted_domains`, exposed for
    single-pass pipeline row stages."""
    # null text has no URLs: keep the document (regexp over NULL is
    # NULL, and size(NULL) would otherwise silently drop the row)
    urls = F.coalesce(
        F.regexp_extract_all(text, F.lit(URL_PATTERN), 0),
        F.array().cast("array<string>"))
    domains = F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, _DOMAIN_PATTERN, 1)))
    bad = F.array(*[F.lit(d.lower()) for d in blocklist])
    return F.size(F.array_intersect(domains, bad)) > 0


def filter_blocklisted_domains(df: DataFrame, blocklist: list[str],
                               text_col: str = "text") -> DataFrame:
    """Drop documents mentioning any blocklisted domain. The blocklist
    is a literal array (KBs even for large lists) evaluated per row —
    no join, no shuffle; at millions of entries switch to a broadcast
    anti-join on the exploded domain table instead."""
    return df.where(~blocklisted_domain_pred(F.col(text_col), blocklist))
