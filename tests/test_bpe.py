"""Real-BPE tokenizer semantics (Sennrich-style merges)."""

from rkmh_spark.functions.bpe import (
    EOW,
    bpe_token_counts,
    encode_text,
    encode_word,
    train_bpe,
)


def test_training_learns_frequent_pairs_first():
    # 'aa' dominates: the first merge must be ('a', 'a')
    merges = train_bpe(["aaaa aaaa aaaa bc"], n_merges=3)
    assert merges[0] == ("a", "a")


def test_merges_are_deterministic():
    texts = ["the quick brown fox the quick dog", "the lazy dog sleeps"]
    m1 = train_bpe(texts, n_merges=50)
    m2 = train_bpe(list(texts), n_merges=50)
    assert m1 == m2


def test_encode_applies_merges_by_rank():
    merges = [("a", "b"), ("ab", "c"), ("c", EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    # 'abc' → a b c </w> → ab c </w> → abc </w>
    assert encode_word("abc", ranks) == ["abc", EOW]
    # 'cc' → c c </w> → c + c</w>  (rank-2 merge fires on the later pair)
    assert encode_word("cc", ranks) == ["c", "c" + EOW]


def test_fully_trained_vocab_gives_one_token_per_word():
    texts = ["alpha beta alpha beta alpha"] * 3
    merges = train_bpe(texts, n_merges=200)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_text("alpha beta", ranks) == ["alpha" + EOW, "beta" + EOW]


def test_spark_counts_match_local_encoder(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown cat naps under the warm sun"),
        (2, ""),
        (3, "unseen zzzz qqqq words"),
    ]
    train = [t for _, t in texts[:2]]
    merges = train_bpe(train, n_merges=60)
    ranks = {p: i for i, p in enumerate(merges)}
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(df, merges).collect()
    }
    for d, t in texts:
        assert got[d] == len(encode_text(t, ranks)), (d, t)
    assert got[2] == 0
