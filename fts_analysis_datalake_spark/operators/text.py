"""Text-analysis operators for the LLM-data pipeline (SURVEY.md §2.10
D8-D13): normalization, tokenization, n-grams, TF-IDF, language-ID
heuristic, quality scoring, token counting, fingerprinting.

All pure Catalyst expressions (split/explode/higher-order funcs) — the
hot path stays JVM-side; at 100 TB the only shuffles are the
(doc, term) and term aggregations, which combine map-side first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish token pattern: runs of letters, runs of digits, or single
# non-space punctuation — the common approximation of subword splits.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Tiny per-language seed stopword profiles for the n-gram/stopword LID
# heuristic. Public common-words lists, truncated.
LID_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "zu", "mit", "den", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "zh": [],  # zh is detected by CJK codepoints, not stopwords
}


def normalize_text(c: Column) -> Column:
    """D8: lower -> strip non-alnum -> collapse/trim whitespace."""
    out = F.lower(c)
    out = F.regexp_replace(out, "[^a-z0-9 ]", " ")
    out = F.regexp_replace(out, " +", " ")
    return F.trim(out)


def tokens(c: Column) -> Column:
    """D9: whitespace tokenization to array<string> (drops empties)."""
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count_bpe_ish(c: Column) -> Column:
    """BPE-ish token count via regex matching (no vocab needed)."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def ngrams(token_col: Column, n: int) -> Column:
    """D11: word n-gram shingles as space-joined strings — pure
    higher-order expressions, no explode until the caller wants rows.

    Evaluation hygiene (measured 30x): the shingle builder iterates
    over INDICES, so if ``token_col`` (typically the whole
    normalize->split->filter chain) appeared inside the index lambda
    it would be re-evaluated once per shingle — O(tokens^2) regex
    work per document. Binding the token array as a lambda VARIABLE
    (transform over a 1-element array wrapper) forces exactly one
    evaluation per row; the inner lambda then slices the
    already-materialized value.
    """

    def build(toks: Column) -> Column:
        count = F.size(toks) - (n - 1)
        # Guard: Spark's sequence(1, 0) steps DOWNWARD ([1, 0]) —
        # short docs must yield an empty shingle list, not bogus
        # slices.
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(token_col), build), 1)


def stopword_ratio(token_col: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in the given stopword list."""
    hits = F.size(F.filter(token_col, lambda t: t.isin(*stopwords) if stopwords else F.lit(False)))
    return hits.cast("double") / F.greatest(F.size(token_col), F.lit(1))


def cjk_ratio(c: Column) -> Column:
    """Fraction of characters in the CJK unified block (zh detector)."""
    # Literal codepoints (not \u escapes) so the same pattern string
    # works in both Java regex (Spark) and RE2 (DuckDB oracle).
    cjk = F.length(F.regexp_replace(c, "[^一-鿿]", ""))
    return cjk.cast("double") / F.greatest(F.length(c), F.lit(1))


def quality_score(text_col: Column) -> Column:
    """D13-style composite quality score in [0,1]: combines length
    band, alphanumeric ratio and mean word length band. Deterministic
    integer/double arithmetic only."""
    n_chars = F.length(text_col)
    toks = tokens(normalize_text(text_col))
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    alnum_ratio = F.length(F.regexp_replace(text_col, "[^a-zA-Z0-9]", "")).cast(
        "double"
    ) / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_chars.cast("double") / n_tokens
    len_ok = F.when((n_chars >= 50) & (n_chars <= 5000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_word_len >= 3.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    return (len_ok + word_ok + alnum_ratio) / 3.0


def doc_term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode normalized tokens to (id, term, tf) — the base relation
    for TF-IDF and vocabulary statistics."""
    return (
        df.select(F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str, quantize: float = 1e9) -> DataFrame:
    """D10: (id, term, tf, df, tfidf) with ln(N/df) quantized to 1e-9
    (cross-engine libm drift, see scalar_functions.py)."""
    tf = doc_term_freqs(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    docfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.floor(F.log(F.col("n_docs").cast("double") / F.col("df")) * quantize + F.lit(0.5)) / quantize
    return (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * idf)
        .drop("n_docs")
    )


def language_id(text_col: Column, toks_col: Column | None = None) -> Column:
    """Heuristic language ID: CJK ratio -> zh; else argmax stopword
    overlap among latin-script profiles; 'und' when nothing matches.

    Pass a pre-materialized token-array column via ``toks_col`` when
    calling in a projection: higher-order functions run interpreted
    (no codegen, no common-subexpression elimination), so inlining the
    tokenizer here would re-normalize and re-split the text once per
    language profile."""
    toks = toks_col if toks_col is not None else tokens(normalize_text(text_col))
    scores = {
        lang: stopword_ratio(toks, words) for lang, words in LID_PROFILES.items() if words
    }
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang, score in sorted(scores.items()):  # stable order -> deterministic ties
        better = score > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, score).otherwise(best_score)
    return F.when(cjk_ratio(text_col) > 0.3, F.lit("zh")).otherwise(best)


# ------------------------------------------------------------------ SQL twins
# DuckDB equivalents of the ops above, kept adjacent for traceability.
# DuckDB regexp_replace needs the 'g' flag (Spark replaces globally by
# default); list indices are 1-based like Spark's slice.


def sql_normalize_text(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', ' ', 'g'),"
        f" ' +', ' ', 'g'))"
    )


def sql_tokens(col: str) -> str:
    return f"list_filter(str_split({sql_normalize_text(col)}, ' '), t -> t <> '')"


def sql_ngrams(tokens_expr: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 0)),"
        f" i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))"
    )


def min_shingle_fingerprint(token_col: Column, n: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    1-permutation MinHash usable as a near-dup blocking key; md5 is
    identical across engines."""
    return F.array_min(F.transform(ngrams(token_col, n), lambda s: F.md5(s)))
