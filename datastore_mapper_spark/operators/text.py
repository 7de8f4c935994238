"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are pure JVM expressions (whole-stage-codegen friendly) returning
Columns, so they compose into any select/filter — the engine's version
of the reference's per-entity map callback doing text munging.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram-free heuristic
#: language ID.  Order fixes the argmax tie-break.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}

TOKEN_PATTERN = "[a-z0-9]+"  # BPE-ish lowercase word/number pieces


def toks(text) -> Column:
    return F.split(text, " ")


def stopword_hits(text, lang: str) -> Column:
    """Count of this language's stopwords present in the text (distinct)."""
    return F.size(
        F.array_intersect(
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]), toks(text)
        )
    )


def predicted_lang(text) -> Column:
    """Argmax of stopword hits with fixed precedence (en,de,es,fr,zh)."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    langs = list(STOPWORDS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs[langs.index(lang) + 1:]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def n_tokens(text) -> Column:
    return F.size(toks(text))


def distinct_ratio(text) -> Column:
    return F.size(F.array_distinct(toks(text))).cast("double") / n_tokens(text)


def quality_score(text) -> Column:
    """Composite quality in [0,1]: length saturation + lexical diversity
    + stopword presence.  Deterministic single-op FP arithmetic."""
    length_term = F.least(F.lit(1.0), n_tokens(text).cast("double") / 100.0)
    stop_term = F.least(
        F.lit(1.0),
        stopword_hits(text, "en").cast("double") * 5 / n_tokens(text),
    )
    return F.round(
        0.5 * length_term + 0.3 * distinct_ratio(text) + 0.2 * stop_term, 6
    )


def regex_token_count(text, pattern: str = TOKEN_PATTERN) -> Column:
    """Token count by regex extraction (the BPE-ish pre-tokenizer)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def token_fingerprint_term() -> Column:
    """Per-token fingerprint term over an exploded ``tok`` column —
    order-independent (set-hash) so it is invariant to token order and
    reproducible in any SQL dialect (no engine hash functions)."""
    first_c = F.ascii(F.col("tok"))
    last_c = F.ascii(F.expr("right(tok, 1)"))
    ln = F.length("tok")
    return (ln * 31 + first_c) * (ln * 37 + last_c)


FINGERPRINT_MOD = 1_000_003
