"""Text-analysis functions for the training-data pipeline, Spark-native.

Everything here is built from pyspark.sql.functions (JVM-side, whole-stage
codegen) — no Python UDFs. Each has an exact ANSI-SQL spelling used by the
DuckDB oracle in __spark_entry__.py, so semantics are pinned cross-engine:
token = non-empty run split on single spaces; stopword sets are explicit
literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny deterministic stopword panels per language (oracle-mirrored literals)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "it": ("il", "la", "che", "di", "non"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empty strings removed (split-on-space semantics)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """share of tokens in the language's stopword panel."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / mean-token-length quality features (F6 analog —
    the reference tosses reads by length at
    /root/reference/scripts/score_real_classification.py:25-52)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    return df.withColumns(
        {
            "n_chars_m": F.length(c),
            "n_tokens": n_tok,
            "mean_token_len": F.round(
                (F.length(c) - (n_tok - F.lit(1)))
                / F.greatest(n_tok, F.lit(1)).cast("double"),
                4,
            ),
        }
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 — public:
    documents dominated by one repeated n-gram are low-quality) as
    ALL-INTEGER per-doc signals, ratio-free so the oracle compare never
    touches cross-engine float formatting:

    n_words / n_distinct_words / top_word_count,
    n_bigrams / n_distinct_bigrams / top_bigram_count.

    Fully relational: word + adjacent-bigram arrays from one split,
    exploded, ONE groupBy per granularity — no UDF. At 10^12 docs the
    shuffle key should be xxhash64(gram) (same note as line_dedup).
    """
    words = F.split(F.col(text_col), " ")
    bigrams = F.transform(
        F.when(
            F.size(words) >= 2, F.sequence(F.lit(0), F.size(words) - 2)
        ).otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    base = df.select(
        F.col(id_col).alias("id"), words.alias("w"), bigrams.alias("b")
    )

    def _stats(col: str, prefix: str) -> DataFrame:
        g = (
            base.select("id", F.explode_outer(col).alias("g"))
            .groupBy("id", "g")
            .agg(F.count("g").alias("c"))  # count(g): null rows → 0
        )
        return g.groupBy("id").agg(
            F.sum("c").alias(f"n_{prefix}"),
            F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).alias(
                f"n_distinct_{prefix}"
            ),
            F.max("c").alias(f"top_{prefix}_count"),
        )

    out = _stats("w", "words").join(_stats("b", "bigrams"), "id")
    return out.select(
        F.col("id").alias(id_col),
        "n_words",
        "n_distinct_words",
        "top_words_count",
        "n_bigrams",
        "n_distinct_bigrams",
        "top_bigrams_count",
    )


def lang_score_columns(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword hit counts — the n-gram-panel language-ID
    heuristic (discriminative-token classification, rkmh hpv16 analog
    /root/reference/src/rkmh.cpp:2666-2678)."""
    out: dict[str, Column] = {}
    toks = tokens(F.col(text_col))
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[f"score_{lang}"] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def predict_lang(text_col: str = "text") -> Column:
    """argmax language by stopword hits; ties → lexicographically first
    language (deterministic, oracle-mirrorable)."""
    scores = lang_score_columns(text_col)
    pairs = F.array(
        *[
            F.struct(c.alias("score"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items(), key=lambda kv: kv[0].split("_")[1])
        ]
    )
    # max by (score, reversed-lang) then take lang: sort desc by score,
    # asc by lang — array_sort on struct sorts ascending field-wise, so
    # negate score.
    best = F.array_sort(
        F.transform(
            pairs,
            lambda p: F.struct(
                (-p["score"]).alias("neg"), p["lang"].alias("lang")
            ),
        )
    )[0]["lang"]
    return best
