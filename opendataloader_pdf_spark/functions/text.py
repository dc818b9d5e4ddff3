"""Text analysis functions — all JVM-side column expressions (no Python
in the hot path), so they stay inside whole-stage codegen and have exact
ANSI-SQL oracle twins.

Reference parity: whitespace trim/space compression
(core/processors/TextProcessor.java:58-65, ContentFilterProcessor.java:94-100;
F8), invalid-char replacement (TextProcessor.java:32-44; F9), regex label
grammars (core/utils/BulletedParagraphUtils.java:114-148; §2.8).

Training-pipeline additions (first-class per the build brief): language-ID
(stopword-marker heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), document
fingerprinting (md5 of normalized text — deterministic, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny marker-word lists per language for the n-gram/stopword heuristic.
#: Deliberately small & deterministic so the SQL oracle twin is exact.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

_PUNCT_RE = r"[.,;:!?()\[\]{}\"']"
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def normalize_ws(col: Column) -> Column:
    """Trim + compress runs of whitespace to single spaces (F8)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def replace_invalid(col: Column, replacement: str = "") -> Column:
    """Replace U+FFFD replacement chars (F9)."""
    return F.regexp_replace(col, "�", replacement)


def whitespace_token_count(col: Column) -> Column:
    """Token count by whitespace split of the normalized text."""
    n = normalize_ws(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.split(n, " "))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: words + digits + punctuation marks,
    via one regexp_count — letters runs count ceil(len/4) subword units."""
    words = F.regexp_count(col, F.lit(r"[A-Za-z]{1,4}"))
    digits = F.regexp_count(col, F.lit(r"[0-9]"))
    other = F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))
    return (words + digits + other).cast("int")


def _marker_hits(col: Column, words: list[str]) -> Column:
    lowered = F.lower(col)
    total = F.lit(0)
    for w in words:
        total = total + F.regexp_count(lowered, F.lit(rf"\b{w}\b"))
    return total


def lang_id(col: Column) -> Column:
    """Stopword-marker language heuristic → language code or 'und'.

    Scores each candidate language by marker-word hits; ties break by
    fixed language order (deterministic).
    """
    scores = [(lang, _marker_hits(col, ws)) for lang, ws in LANG_MARKERS.items()]
    best_score = scores[0][1]
    for _, s in scores[1:]:
        best_score = F.greatest(best_score, s)
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length docs,
    penalizes punctuation overload, rewards stopword presence."""
    n = normalize_ws(col)
    length = F.length(n).cast("double")
    n_tokens = whitespace_token_count(col).cast("double")
    punct = F.regexp_count(n, F.lit(_PUNCT_RE)).cast("double")
    stop = _marker_hits(n, LANG_MARKERS["en"]).cast("double")
    len_component = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(0.0))
    punct_component = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    stop_component = F.when(n_tokens > 0, F.least(stop / n_tokens * 5.0, F.lit(1.0))).otherwise(F.lit(0.0))
    return F.round(
        len_component * 0.4 + punct_component * 0.3 + stop_component * 0.3, 6
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of lowercase normalized
    text (md5 is identical across Spark and DuckDB → exact oracle)."""
    return F.md5(F.lower(normalize_ws(col)))


def _words(col: Column) -> Column:
    return F.split(normalize_ws(F.lower(col)), " ")


def dup_word_frac(col: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier word —
    the Gopher/RefinedWeb duplicate-token repetition signal. Pure JVM
    (split + array_distinct), no shuffle, no Python."""
    w = _words(col)
    n = F.size(w).cast("double")
    return F.round(
        F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(w)) / n)
        .otherwise(F.lit(0.0)),
        6,
    )


def dup_bigram_frac(col: Column) -> Column:
    """Duplicate-bigram fraction (Gopher's dup n-gram class, n=2):
    1 − distinct bigrams / total bigrams. Bigrams built with a JVM
    transform over the word array — no explode, no shuffle."""
    # wrap the word array in a struct so the lambda references ONE
    # materialized array (not a re-derived split per element); guard
    # size<2 explicitly — Spark's sequence(0, -1) would generate a
    # DESCENDING sequence, not an empty one
    s = F.struct(_words(col).alias("w"))
    bi = F.when(
        F.size(s["w"]) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(s["w"]) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(s["w"], i + 1), F.element_at(s["w"], i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n = F.size(bi).cast("double")
    return F.round(
        F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(bi)) / n)
        .otherwise(F.lit(0.0)),
        6,
    )


# ---------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------
# One rule list drives BOTH engines: scrub_pii builds the Spark chain
# and scrub_pii_sql renders the DuckDB oracle from the same tuples, so
# the two regex stacks cannot drift. Patterns stay inside the regex
# subset with identical semantics under Java regex (Spark) and RE2
# (DuckDB): character classes + bounded quantifiers, no lookarounds or
# backreferences. Rule order matters and is part of the contract:
# emails first (their local parts may contain digits), SSNs before the
# short phone form (so `123-45-6789` is typed as <SSN>, not half-eaten
# as a phone), long phone forms before short ones.
PII_RULES: list[tuple[str, str]] = [
    # plus-addressing, dotted locals, multi-label domains
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    # SSN with dashes or spaces: 123-45-6789 / 123 45 6789
    (r"[0-9]{3}[ -][0-9]{2}[ -][0-9]{4}", "<SSN>"),
    # 10-digit phones with (), dots, dashes or spaces as separators:
    # (555) 123-4567 / 555.123.4567 / 555 123 4567
    (r"[(]?[0-9]{3}[)]?[ .-][0-9]{3}[ .-][0-9]{4}", "<PHONE>"),
    # short/international-prefix form: +1 555-0123
    (r"[+]?[0-9]{1,2}[ -]?[0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    # bare 9-digit account ids in an ` id NNNNNNNNN` context
    (r" id [0-9]{9}", " id <ID>"),
]


def scrub_pii(col: Column) -> Column:
    """Chained JVM regexp_replace over PII_RULES — codegen'd, no Python.
    False-positive note: digit runs shaped like a separator-grouped
    phone (e.g. inside long dotted decimals) are scrubbed too; for a
    training-corpus redactor that trade is the right default."""
    out = col
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii_sql(expr: str) -> str:
    """The identical scrub as DuckDB SQL, rendered from PII_RULES."""
    out = expr
    for pat, repl in PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
