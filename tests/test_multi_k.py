"""P5 multi-k shingle concat (reference ``-k 12 -k 14``,
/root/reference/src/rkmh.cpp:296-303): the sketch over a tuple of k sizes
must equal the bottom-s of the CONCATENATED per-k hash multisets."""

import numpy as np

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.shingles import (
    bottom_s_sketch,
    shingle_hashes,
    sketch_texts_batch,
)
from rkmh_spark.operators.signatures import compute_signatures
from rkmh_spark.sources.pages import pages_dataframe

KS = (6, 10)
CFG = DedupConfig(k=KS, sketch_size=48, num_bands=24, band_rows=4)


def _oracle_sketch(text: str) -> np.ndarray:
    parts = [shingle_hashes(text, kk, CFG.hash_seed) for kk in KS]
    return bottom_s_sketch(np.concatenate(parts), CFG.sketch_size).view(np.int64)


def test_multi_k_kernel_matches_concat_oracle():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs today",
        "sphinx of black quartz judge my vow",
        "",
        "tiny",  # shorter than k=6 AND k=10 → empty
        "sevench",  # 7 bytes: k=6 contributes 2 shingles, k=10 none
    ]
    sketches, minhashes, counts = sketch_texts_batch(
        texts, KS, CFG.sketch_size, CFG.hash_seed, num_bins=CFG.num_perms
    )
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(sketches[i], _oracle_sketch(t), err_msg=t)
        expected_count = sum(max(len(t.encode()) - kk + 1, 0) for kk in KS)
        assert counts[i] == expected_count
        assert (len(minhashes[i]) == 0) == (expected_count == 0)


def test_multi_k_through_spark_signatures(spark):
    pages = pages_dataframe(spark, n_clusters=8, seed=21)
    texts = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    sigs = compute_signatures(pages, CFG)
    got = {r["url"]: np.array(r["sketch"], dtype=np.int64) for r in sigs.collect()}
    for u, t in texts.items():
        np.testing.assert_array_equal(got[u], _oracle_sketch(t), err_msg=u)


def test_multi_k_is_not_single_k():
    t = "the quick brown fox jumps over the lazy dog"
    multi = _oracle_sketch(t)
    single6 = bottom_s_sketch(shingle_hashes(t, 6), CFG.sketch_size)
    assert not np.array_equal(multi, single6.view(np.int64))
