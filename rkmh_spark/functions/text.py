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
    """Whitespace tokens, empty strings removed (split-on-space semantics).

    Spelled with array_remove, NOT F.filter(..., lambda): identical
    semantics (removes every '' element), but array_remove is a regular
    codegen'd collection expression while lambda higher-order functions
    run interpreted — measured ~2× on explode-heavy consumers
    (gopher_quality_filter's token stats, r4)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(c, " "), "")


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


def _adjacent_bigrams(words: Column) -> Column:
    """Adjacent-pair bigram array ("w1 w2") of a word array; empty for
    arrays shorter than 2.

    Spelled zip_with(slice(w,1,n-1), slice(w,2,n-1)) rather than
    transform(sequence, i -> element_at(w, i)…): a higher-order function
    evaluates its ARGUMENT expressions once per row, but an element_at(w,
    i) INSIDE the lambda re-evaluates ``w`` per element when ``w`` is
    itself an expression (split/array_remove) and subexpression
    elimination doesn't reach the interpreted lambda path — measured as
    a quadratic-per-row blowup (22.9 s quality_filter) in r4."""
    n = F.size(words)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array = the
    multiset's top count — computed with one F.aggregate scan (JVM,
    zero shuffle). Empty array → 0."""
    init = F.struct(
        F.lit(0).alias("run"),
        F.lit(0).alias("mx"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, w):
        run = F.when(acc["prev"].eqNullSafe(w), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            run.alias("run"),
            F.greatest(acc["mx"], run).alias("mx"),
            w.alias("prev"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["mx"])


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_keys: bool = False,
    impl: str = "groupby",
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 — public:
    documents dominated by one repeated n-gram are low-quality) as
    ALL-INTEGER per-doc signals, ratio-free so the oracle compare never
    touches cross-engine float formatting:

    n_words / n_distinct_words / top_word_count,
    n_bigrams / n_distinct_bigrams / top_bigram_count.

    Two spellings, identical output (pytest-pinned):

    - ``impl="groupby"`` (default): explode → codegen'd hash aggregation.
      Measured FASTER at bench scale (3.0 s vs 5.0 s at sf0.1/local[32]):
      whole-stage codegen beats the projection's interpreted higher-order
      lambdas. ``hash_keys=True`` makes its shuffle key xxhash64(gram) —
      8 bytes instead of the string (VERDICT r3 #3).
    - ``impl="project"``: ZERO-EXCHANGE projection — every signal is a
      per-doc array expression (size / array_distinct / longest-equal-run
      over the sorted array via one F.aggregate scan). No shuffle at all,
      so on a network-bound cluster at 10^12 docs this trades ~1.6× map
      CPU for zero exchange — the right spelling when the shuffle tier,
      not CPU, is the bottleneck. Higher-order functions run interpreted
      (outside codegen), which is the measured CPU cost.
    """
    words = F.split(F.col(text_col), " ")
    if impl == "project":
        bigrams2 = _adjacent_bigrams(words)
        return df.select(
            F.col(id_col),
            F.size(words).alias("n_words"),
            F.size(F.array_distinct(words)).alias("n_distinct_words"),
            _max_run_length(F.array_sort(words)).alias("top_words_count"),
            F.size(bigrams2).alias("n_bigrams"),
            F.size(F.array_distinct(bigrams2)).alias("n_distinct_bigrams"),
            _max_run_length(F.array_sort(bigrams2)).alias("top_bigrams_count"),
        )
    if impl != "groupby":
        raise ValueError(f"impl must be 'project' or 'groupby', got {impl!r}")
    base = df.select(
        F.col(id_col).alias("id"),
        words.alias("w"),
        _adjacent_bigrams(words).alias("b"),
    )

    def _stats(col: str, prefix: str) -> DataFrame:
        exploded = base.select("id", F.explode_outer(col).alias("g"))
        if hash_keys:
            # explode_outer's null marker (empty array) must STAY null —
            # xxhash64(null) is the seed hash, which would count as a gram
            exploded = exploded.select(
                "id",
                F.when(
                    F.col("g").isNotNull(), F.xxhash64("g")
                ).alias("g"),
            )
        g = (
            exploded
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


# Gopher's English stopword panel for the "must contain ≥2 of these"
# rule (Rae et al. 2021 §A1.1, public)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
) -> DataFrame:
    """The Gopher keep/drop decision (Rae et al. 2021 §A1.1, public) as
    ONE zero-shuffle projection — the training-pipeline's end-to-end
    filtering step (VERDICT r3 #7).

    Every signal here — including the repetition fractions — is computed
    over the SAME empty-filtered token stream (``tokens()``), so runs of
    whitespace can never register as a dominant repeated "word" (r4
    review finding: the earlier spelling mixed raw-split grams with
    filtered-token denominators). Repetition top-counts use the
    explode → codegen'd groupBy shape (measured ~2× faster than the
    interpreted sorted-array run-length scan at sf0.1, same lesson as
    repetition_signals' impl choice), left-joined back per doc. r5: the
    word and bigram chains share ONE tagged explode — one scan, one
    tokenization, one shuffle, one join (the r4 spelling ran separate
    word/bigram chains: two extra document scans and an extra join;
    the two gram-stat chains dominated the query's bench cost).

    Per-document fail flags, every threshold spelled as an INTEGER
    cross-multiplication (no ratios cross the oracle gate):
    - fail_word_count:    n_words outside [min_words, max_words]
    - fail_mean_word_len: mean token length outside [3, 10]
                          (sum_word_chars vs bounds × n_words)
    - fail_symbol_ratio:  '#' occurrences > 0.1·n_words OR '...'
                          occurrences > 0.1·n_words (per-symbol, the
                          paper's "either" rule — not a combined sum)
    - fail_alpha_ratio:   words containing an alphabetic char < 0.8·n_words
    - fail_stopwords:     < 2 tokens from the Gopher stopword panel
    - fail_top_word:      top token count > 0.2·n_words   (repetition)
    - fail_top_bigram:    top token-bigram count > 0.18·n_bigrams
    keep = no flag set. min/max word bounds are parameters because the
    published 50-word floor is corpus-calibrated (the sf fixtures are
    ~20-word snippets).
    """
    c = F.col(text_col)
    toks = tokens(c)
    nw = F.size(toks)
    sum_word_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, v: acc + v
    )
    n_hash_marks = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_ellipsis = F.size(F.split(c, r"\.\.\.")) - 1
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    bigrams = _adjacent_bigrams(toks)

    # one tagged gram stream: k=0 words, k=1 bigrams — a single explode/
    # shuffle computes both per-doc top counts (per-kind max can't mix:
    # the groupBy key includes k)
    tagged = F.concat(
        F.transform(
            toks, lambda t: F.struct(F.lit(0).alias("k"), t.alias("g"))
        ),
        F.transform(
            bigrams, lambda b: F.struct(F.lit(1).alias("k"), b.alias("g"))
        ),
    )
    stats = (
        df.select(F.col(id_col).alias("id"), F.explode(tagged).alias("t"))
        # r6: count on xxhash64(gram) — the shuffle key is 8 bytes
        # instead of the gram string (same contract as
        # repetition_signals' hash_keys; a collision could only merge
        # two grams WITHIN one document's counts). Only the per-doc max
        # count leaves the aggregation, so the gram text is never needed.
        .select("id", F.col("t.k").alias("k"), F.xxhash64("t.g").alias("g"))
        .groupBy("id", "k", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("k") == 0, F.col("c"))).alias("top_word"),
            F.max(F.when(F.col("k") == 1, F.col("c"))).alias("top_bigram"),
        )
    )
    q = df.select(
        F.col(id_col).alias("id"),
        nw.alias("nw"),
        sum_word_chars.alias("swc"),
        n_hash_marks.alias("n_hash"),
        n_ellipsis.alias("n_ell"),
        n_alpha_words.alias("n_alpha"),
        n_stop.alias("n_stop"),
        F.size(bigrams).alias("n_bigrams"),
    )
    nw = F.col("nw")
    out = (
        q.join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            nw.alias("n_words"),
            ((nw < min_words) | (nw > max_words)).alias("fail_word_count"),
            (
                (F.col("swc") < min_mean_word_len * nw)
                | (F.col("swc") > max_mean_word_len * nw)
            ).alias("fail_mean_word_len"),
            (
                (F.col("n_hash") * 10 > nw) | (F.col("n_ell") * 10 > nw)
            ).alias("fail_symbol_ratio"),
            (F.col("n_alpha") * 5 < nw * 4).alias("fail_alpha_ratio"),
            (F.col("n_stop") < 2).alias("fail_stopwords"),
            (F.coalesce("top_word", F.lit(0)) * 5 > nw).alias(
                "fail_top_word"
            ),
            (
                F.coalesce("top_bigram", F.lit(0)) * 50
                > F.col("n_bigrams") * 9
            ).alias("fail_top_bigram"),
        )
    )
    return out.withColumn(
        "keep",
        ~(
            F.col("fail_word_count")
            | F.col("fail_mean_word_len")
            | F.col("fail_symbol_ratio")
            | F.col("fail_alpha_ratio")
            | F.col("fail_stopwords")
            | F.col("fail_top_word")
            | F.col("fail_top_bigram")
        ),
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
