"""Text-analysis column expressions — all JVM-side built-ins, no UDFs.

These power the LLM-data-pipeline operators (SURVEY §7.4.3): character/
word stats, language-ID heuristic, token counting, and document
fingerprinting. Every expression here is deterministic and reproducible
in ANSI SQL (the DuckDB oracle mirrors each one), and stays inside
whole-stage codegen — the 100 TB hot path never leaves the JVM.

Design note on hashing: fingerprints use ``md5`` (hex string) as the
hash family — identical output in Spark and standard SQL engines, unlike
``hash()``/``xxhash64`` whose implementations differ per engine. For a
pure-Spark pipeline where cross-engine parity is not needed,
``F.xxhash64`` is ~10× faster; the structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single other non-space chars.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def normalize_text(text: Column) -> Column:
    """Canonical form for content-level comparison: lowercase, strip
    non-alphanumerics to spaces, squash whitespace runs, trim.

    This is the normalization stage every dedup pipeline runs BEFORE
    hashing/shingling — retyped punctuation, casing, and spacing must not
    defeat near-dup detection. Character classes only (no shorthand like
    ``\\w``), so the same regexes mean the same thing in Java regex
    (Spark) and RE2 (DuckDB/others) and the expression is oracle-safe.
    """
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    squashed = F.regexp_replace(stripped, "  *", " ")
    return F.trim(squashed)


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space delimited corpus)."""
    return F.split(text, " ")


def n_words(text: Column) -> Column:
    return F.size(words(text))


def n_distinct_words(text: Column) -> Column:
    return F.size(F.array_distinct(words(text)))


def avg_word_len(text: Column) -> Column:
    """Mean token length, computed exactly from integer char counts
    (total non-space chars / word count) — no float summation, so the
    value is bit-identical across engines."""
    nw = n_words(text)
    total_chars = F.length(text) - (nw - F.lit(1))
    return (total_chars.cast("double") / nw.cast("double"))


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex (letter runs / digit runs /
    punctuation singletons)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


# --- language ID (n-gram / marker heuristic) -------------------------------

# (lang, markers) — padded-space matching approximates word boundaries.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " la ", " et "]),
    ("es", [" el ", " los ", " y "]),
    ("zh", ["的", "是", "了"]),
]


def _occurrences(padded: Column, marker: str) -> Column:
    """Occurrence count of ``marker`` via length arithmetic — identical
    semantics in any SQL engine (no regex dialect involved)."""
    return (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit("")))) / F.lit(len(marker))


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS:
        score: Column = F.lit(0).cast("double")
        for m in markers:
            score = score + _occurrences(padded, m)
        out[lang] = score.cast("long")
    return out


def predicted_lang(text: Column) -> Column:
    """Argmax over marker scores; all-zero scores → 'und' (undetermined).

    A CASE chain in LANG_MARKERS order: the first language whose score is
    positive and >= every other score wins, so ties resolve to the earlier
    entry — the same chain the SQL oracle spells out.
    """
    scores = lang_scores(text)
    langs = [lang for lang, _ in LANG_MARKERS]
    expr: Column | None = None
    whens = []
    for lang in langs:
        cond = scores[lang] > F.lit(0)
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        whens.append((cond, F.lit(lang)))
    expr = F.when(whens[0][0], whens[0][1])
    for cond, val in whens[1:]:
        expr = expr.when(cond, val)
    return expr.otherwise(F.lit("und"))


# --- quality scoring --------------------------------------------------------

# Characters outside the corpus alphabet (lowercase words + single spaces)
# count as "punctuation/noise". Spelled as a negated class so uppercase,
# digits-in-words, unicode etc. all land in the noise bucket.
PUNCT_RE = "[^a-z0-9 ]"

# Tiny function-word list: enough to separate natural prose from keyword
# soup; membership test is exact (list_filter), not substring counting.
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is"]


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_RE)).cast("bigint")


def digit_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[0-9]")).cast("bigint")


def stopword_count(text: Column) -> Column:
    """Exact token-membership count (not substring occurrences — those
    miss overlapping matches and would differ from any list-based SQL)."""
    return F.size(F.filter(words(text), lambda w: w.isin(*STOPWORDS))).cast("bigint")


def quality_components(text: Column) -> dict[str, Column]:
    """Ratio signals for document quality, each an exact double division
    of two integer counts (bit-identical across engines).

    Zero denominators (an empty document) yield NULL ratios rather than
    a job-killing DIVIDE_BY_ZERO — Spark 4 runs ANSI mode by default and
    this project never disables it; the oracle mirrors with NULLIF."""
    nw = n_words(text).cast("double")
    nc = F.length(text).cast("double")

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den != 0, num / den)

    return {
        "punct_ratio": ratio(punct_count(text).cast("double"), nc),
        "digit_ratio": ratio(digit_count(text).cast("double"), nc),
        "stopword_ratio": ratio(stopword_count(text).cast("double"), nw),
        "type_token_ratio": ratio(n_distinct_words(text).cast("double"), nw),
    }


def quality_score(text: Column) -> Column:
    """Composite heuristic quality in [0, 1] — equal-weight mean of
    (a) length adequacy (full marks at ≥ 50 words), (b) lexical
    diversity, (c) stopword naturalness (full marks at ≥ 5%), and
    (d) punctuation cleanliness (zero marks at ≥ 20% noise chars).
    Fixed operation order; LEAST and arithmetic are IEEE-exact, so the
    oracle reproduces it bit-for-bit.
    """
    c = quality_components(text)
    len_ok = F.least(n_words(text).cast("double") / F.lit(50.0), F.lit(1.0))
    stop_ok = F.least(c["stopword_ratio"] / F.lit(0.05), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(c["punct_ratio"] / F.lit(0.2), F.lit(1.0))
    return (len_ok + c["type_token_ratio"] + stop_ok + punct_ok) * F.lit(0.25)


# --- fingerprinting --------------------------------------------------------

def md5_fingerprint(text: Column) -> Column:
    """Whole-document content hash (hex) — exact-dedup key."""
    return F.md5(text.cast("binary"))


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as strings; < k words → empty array.

    The guard matters: Spark's ``sequence(1, 0)`` counts *down* and would
    fabricate indices.

    Bind-once shape (r12): the tokenized array is wrapped in a 1-element
    array and the shingle construction runs inside a ``transform`` lambda
    over it, so ``split(text)`` is evaluated ONCE per row. The old form
    referenced the split expression from the per-index lambda body, and
    Spark inlines (not CSEs) expressions across lambda boundaries — the
    split re-ran per shingle, O(L·n_shingles) per document (the r11
    _char_trigrams lesson, found in the word path this round; measured
    4.7× on the sf0.1 corpus, identical output)."""

    def build(w: Column) -> Column:
        n = F.size(w)
        seq = F.sequence(F.lit(1), n - F.lit(k - 1))
        arr = F.transform(seq, lambda i: F.array_join(F.slice(w, i, k), " "))
        return F.when(n >= F.lit(k), arr).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(words(text)), build), 1)


def minhash_component(sh: Column, seed: int) -> Column:
    """One MinHash signature component: min over shingles of
    ``md5(seed || ':' || shingle)``.

    ``md5`` keyed by seed is a proper random-permutation family and —
    unlike murmur/xxhash — reproducible in every SQL engine, which is what
    makes the LSH pipeline oracle-checkable end to end."""
    hashed = F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s).cast("binary")))
    return F.array_min(hashed)


# Sequential redaction passes: (name, pattern, replacement). Order is
# load-bearing (IP digits must be consumed before any digit-run rule a
# caller appends) and each pattern counts on the PREVIOUS pass's output —
# the SQL oracle chains CTEs in the identical order. Patterns stick to
# character classes and \b (identical semantics in Java regex and RE2).
REDACTION_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+", "<email>"),
    ("ip", "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+", "<ip>"),
    ("entity", "\\b(customer|supplier)\\b", "<entity>"),
]


def redactions(
    text: Column,
    patterns: list[tuple[str, str, str]] | None = None,
) -> tuple[Column, dict[str, Column]]:
    """PII/denylist scrubbing — the redaction stage of a training-data
    pipeline. Each pattern is counted on the current text, then replaced
    globally; returns (redacted_text, {name: match_count}).

    All JVM-side (regexp_count/regexp_replace in one codegen stage,
    zero shuffle); the counts make the scrub auditable — a corpus-level
    sum of them is the redaction report.
    """
    pats = REDACTION_PATTERNS if patterns is None else patterns
    out = text
    counts: dict[str, Column] = {}
    for name, pat, repl in pats:
        counts[name] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, repl)
    return out, counts
