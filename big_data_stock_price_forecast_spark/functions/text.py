"""Text-analysis expression builders (training-data pipeline surface).

All of these are JVM-side Column expressions (no Python UDFs): tokenize,
shingle, hash, quality metrics, and a heuristic language-ID. Each has an
exact ANSI-SQL twin used by the DuckDB oracle, built from the SAME
constants below, so results match bitwise.

The portable 60-bit hash is ``conv(substr(md5(s),1,15),16,10)``: md5 of
the UTF-8 bytes is engine-independent, and 15 hex chars < 2^60 fit a
signed 64-bit integer in any engine. All downstream sketches (MinHash,
SimHash, fingerprints) are pure integer arithmetic on top of it, so
there is no float-order ambiguity anywhere in the dedup stack.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Small stopword lexicons for the heuristic language-ID
# (SURVEY.md §7 north-star: language-ID as n-gram/stopword heuristic).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans"],
}
EN_STOPWORDS = LANG_PROFILES["en"]

HASH_BITS = 60


def tokens(col: Column) -> Column:
    """Lowercased alnum tokens; empty strings filtered out."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}),"
        f" '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def hash60(col: Column) -> Column:
    """Portable 60-bit integer hash of a string."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (space-joined).
    Docs shorter than n tokens yield an empty array (guarded: Spark's
    ``sequence(1, 0)`` counts DOWN instead of producing empty).
    ``tok`` is let-bound before the per-position lambda: composed
    directly over ``tokens(...)`` (as :func:`~..operators.dedup.
    with_shingles` does) the raw expression would re-tokenize the
    document once per shingle — O(tokens²) per doc (see expr.let_)."""
    from .expr import let_

    def _sh(t: Column) -> Column:
        sh = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
        return F.array_distinct(
            F.when(F.size(t) >= n, sh).otherwise(
                F.array().cast("array<string>")
            )
        )

    return let_(tok, _sh)


def sql_shingles(tok_expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"({tok_expr})[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1), i -> {parts}))"
    )


def pos_shingles(tok: Column, n: int = 3) -> Column:
    """POSITIONAL word n-gram shingles — like :func:`shingles` but
    without the distinct, so element ``i`` (0-based) is exactly the
    n-gram starting at token ``i``. Required by span-level operators
    (``doc_dup_ngram_spans``) where array index IS the token offset;
    the distinct in :func:`shingles` re-orders repeated shingles
    differently per engine. Same ``let_`` binding (O(tokens) per doc,
    not O(tokens²)) and same short-doc empty-array guard."""
    from .expr import let_

    def _sh(t: Column) -> Column:
        sh = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
        return F.when(F.size(t) >= n, sh).otherwise(
            F.array().cast("array<string>")
        )

    return let_(tok, _sh)


def sql_pos_shingles(tok_expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"({tok_expr})[i+{j}]" for j in range(n))
    return (
        f"list_transform("
        f"range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1), i -> {parts})"
    )


def fingerprint(col: Column) -> Column:
    """Polynomial rolling-hash document fingerprint over UTF-8-ish chars:
    ``h = (h*257 + code) mod (2^31-1)`` folded left-to-right — integer
    math, exact in any engine. Used for order-sensitive content identity
    (exact-dup detection robust to storage layout, cheap grouping key)."""
    codes = F.transform(F.split(col, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 257 + c.cast("long")) % F.lit(2147483647),
    )


def sql_fingerprint(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), ch -> ascii(ch))), "
        f"(acc, c) -> (acc * 257 + CAST(c AS BIGINT)) % 2147483647)"
    )


# PII / denylist scrub rules: (name, regex, replacement). Regexes are
# restricted to the syntax subset Java regex (Spark) and RE2 (DuckDB)
# interpret identically: character classes, \d, \b, bounded repetition,
# top-level alternation — no lookaround, no backrefs. Counts are taken
# per-rule on the ORIGINAL text (rules are independent detectors);
# replacement is applied sequentially in list order. The replacement
# tokens contain no digits/@ so later rules never re-match an earlier
# rule's output.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # denylist stand-in: a real pipeline loads these from config
    ("denied", r"\b(customer|vector)\b", "<TERM>"),
]


def scrub_col(col: Column) -> Column:
    """Text with every SCRUB_RULES pattern replaced, in rule order.
    Pure JVM expression (chained regexp_replace) — the scan streams
    through codegen with no Python in the loop."""
    out = col
    for _, pat, rep in SCRUB_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_counts(col: Column) -> dict[str, Column]:
    """Per-rule match counts on the original text."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("int")
        for name, pat, _ in SCRUB_RULES
    }


def sql_scrub(expr: str) -> str:
    out = expr
    for _, pat, rep in SCRUB_RULES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def sql_scrub_counts(expr: str) -> dict[str, str]:
    return {
        name: f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS INT)"
        for name, pat, _ in SCRUB_RULES
    }


def lang_scores(tok: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (duplicates count — frequency
    matters for short texts)."""
    def _hits(words: list[str]):
        # closure factory: a default-arg lambda would change the HOF
        # lambda's arity as seen by PySpark
        return lambda t: t.isin(*words)

    return {
        lang: F.size(F.filter(tok, _hits(words)))
        for lang, words in LANG_PROFILES.items()
    }


def predicted_lang(tok: Column) -> Column:
    """Argmax language by stopword hits; alphabetical tie-break;
    'und' (undetermined) when no profile scores a hit."""
    scores = lang_scores(tok)
    # fold in reverse-alphabetical order with >= so the final winner is
    # the alphabetically-first among score ties — deterministic
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_PROFILES, reverse=True):
        s = scores[lang]
        best_lang = F.when((s >= best_score) & (s > 0), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(best_score, s)
    return best_lang


def sql_lang_case(tok_expr: str) -> str:
    """DuckDB twin of predicted_lang: same reverse-alphabetical fold."""
    hits = {
        lang: (
            "len(list_filter({t}, t -> t IN ({w})))".format(
                t=tok_expr,
                w=", ".join(f"'{w}'" for w in words),
            )
        )
        for lang, words in LANG_PROFILES.items()
    }
    expr_lang, expr_score = "'und'", "0"
    for lang in sorted(LANG_PROFILES, reverse=True):
        s = hits[lang]
        expr_lang = (
            f"CASE WHEN ({s}) >= ({expr_score}) AND ({s}) > 0"
            f" THEN '{lang}' ELSE ({expr_lang}) END"
        )
        expr_score = f"greatest({expr_score}, {s})"
    return expr_lang
