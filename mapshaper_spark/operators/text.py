"""Text-analysis operators for document pipelines (all pure column
expressions — JVM-side regexp/string kernels, no Python):

- token_count / char metrics
- quality_score: length / punctuation / stopword-ratio heuristic
- lang_id: marker-word n-gram heuristic (argmax of per-language counts)
- fingerprint: md5 of whitespace-normalized lowercase text (md5 exists with
  identical semantics in DuckDB, keeping the op oracle-checkable)

Every function returns (df with extra columns); formulas are chosen to be
expressible 1:1 in ANSI SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "on", "for")

LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(r"\S+"), 0)


def token_count(df: DataFrame, text_col: str, out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens_col(F.col(text_col))))


def _count_matches(text: Column, words) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def quality_score(df: DataFrame, text_col: str, out: str = "quality") -> DataFrame:
    """Deterministic quality heuristic in [0, 1]:
    0.4 * min(1, n_tokens/100) + 0.3 * (1 - punct_ratio) + 0.3 * min(1, 4*stopword_ratio)
    — the standard length/punctuation/stopword-density trio, with every term
    a plain SQL expression."""
    text = F.col(text_col)
    toks = F.size(tokens_col(text))
    n_chars = F.length(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[,;:!?.]", ""))
    stop = _count_matches(text, STOPWORDS)
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = stop.cast("double") / F.greatest(toks, F.lit(1)).cast("double")
    length_term = F.least(F.lit(1.0), toks.cast("double") / F.lit(100.0))
    score = (F.lit(0.4) * length_term + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
             + F.lit(0.3) * F.least(F.lit(1.0), F.lit(4.0) * stop_ratio))
    return df.withColumn(out, F.round(score, 6))


def lang_id(df: DataFrame, text_col: str, out: str = "lang_pred") -> DataFrame:
    """Argmax of marker-word hit counts; ties resolved by language-key order
    (deterministic CASE cascade, replicable in SQL)."""
    text = F.col(text_col)
    counts = {lang: _count_matches(text, words) for lang, words in LANG_MARKERS.items()}
    best = None
    best_count = None
    for lang, cnt in counts.items():
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            cond = cnt > best_count
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_count = F.when(cond, cnt).otherwise(best_count)
    best = F.when(best_count > 0, best).otherwise(F.lit("und"))
    return df.withColumn(out, best)


def fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out, F.md5(norm))


def text_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Single-pass fused form of token_count + quality_score + lang_id +
    fingerprint: ONE tokenizing regex pass and ONE union marker-word
    extraction pass feed every count via array higher-order functions
    (hash-identical to the individual operators, which each re-scanned the
    text — the 7-regex-passes-per-row plan VERDICT r01 flagged)."""
    text = F.col(text_col)
    # pass 1: tokens; pass 2: all marker/stopword hits in one union regex
    # (disjoint \b..\b spans -> same per-word counts as separate passes)
    vocab = list(dict.fromkeys(
        list(STOPWORDS) + [w for ws in LANG_MARKERS.values() for w in ws]))
    union_pat = r"\b(" + "|".join(vocab) + r")\b"
    marks = F.regexp_extract_all(F.lower(text), F.lit(union_pat), 0)
    df = (df.withColumn("__toks", tokens_col(text))
          .withColumn("__marks", marks))

    def nmatch(words):
        ws = list(words)
        return F.size(F.filter(F.col("__marks"), lambda m: m.isin(*ws)))

    toks = F.size("__toks")
    n_chars = F.length(text)
    # translate() is a plain char-map scan — same count as the regexp
    # char-class replace at a fraction of the cost
    punct = n_chars - F.length(F.translate(text, ",;:!?.", ""))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = nmatch(STOPWORDS).cast("double") / \
        F.greatest(toks, F.lit(1)).cast("double")
    length_term = F.least(F.lit(1.0), toks.cast("double") / F.lit(100.0))
    score = (F.lit(0.4) * length_term + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
             + F.lit(0.3) * F.least(F.lit(1.0), F.lit(4.0) * stop_ratio))

    best = None
    best_count = None
    for lang, words in LANG_MARKERS.items():
        cnt = nmatch(words)
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            cond = cnt > best_count
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_count = F.when(cond, cnt).otherwise(best_count)
    best = F.when(best_count > 0, best).otherwise(F.lit("und"))

    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return (df.withColumn("n_tokens", toks)
            .withColumn("quality", F.round(score, 6))
            .withColumn("lang_pred", best)
            .withColumn("fingerprint", F.md5(norm))
            .drop("__toks", "__marks"))
