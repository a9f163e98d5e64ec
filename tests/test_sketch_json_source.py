"""S10 as a SOURCE: the reference declares -F/-R (classify from
pre-calculated hashes) but its load_hashes exits(1) unimplemented
(rkmh.cpp:552-582,639-640). Here the JSON sketches round-trip and feed
classify directly — parity-plus, tested."""

import dataclasses

import pytest

from rkmh_spark.config import TEST_CONFIG
from rkmh_spark.functions.sinks import read_sketch_json, write_sketch_json
from rkmh_spark.operators.classify import classify_pages
from rkmh_spark.operators.signatures import compute_signatures
from rkmh_spark.sources.pages import pages_dataframe


def _sig_map(df):
    return {
        r["url"]: (tuple(r["sketch"]), tuple(r["minhash"]), r["n_shingles"])
        for r in df.collect()
    }


def test_sketch_json_roundtrip(spark, tmp_path):
    pages = pages_dataframe(spark, n_clusters=8, dup_rate=0.5, seed=44)
    sigs = compute_signatures(pages, TEST_CONFIG)
    path = str(tmp_path / "sk")
    write_sketch_json(sigs, TEST_CONFIG, path)
    loaded = read_sketch_json(spark, path, TEST_CONFIG)
    assert _sig_map(loaded) == _sig_map(sigs)


def test_sketch_json_metadata_mismatch_raises(spark, tmp_path):
    pages = pages_dataframe(spark, n_clusters=4, dup_rate=0.5, seed=45)
    sigs = compute_signatures(pages, TEST_CONFIG)
    path = str(tmp_path / "sk")
    write_sketch_json(sigs, TEST_CONFIG, path)
    other = dataclasses.replace(TEST_CONFIG, hash_seed=7)
    with pytest.raises(ValueError, match="metadata mismatch"):
        read_sketch_json(spark, path, other)
    # no cfg → no check, loads fine
    assert read_sketch_json(spark, path).count() == sigs.count()


def test_classify_from_loaded_sketches_matches_recompute(spark, tmp_path):
    pages = pages_dataframe(spark, n_clusters=10, dup_rate=0.7, seed=46)
    half = pages.where("url < 'https://site0005'")
    rest = pages.subtract(half)
    ref_sigs = compute_signatures(half, TEST_CONFIG)
    q_sigs = compute_signatures(rest, TEST_CONFIG)
    path = str(tmp_path / "panel")
    write_sketch_json(ref_sigs, TEST_CONFIG, path)
    loaded_refs = read_sketch_json(spark, path, TEST_CONFIG)

    a = sorted(
        map(tuple, classify_pages(q_sigs, ref_sigs, TEST_CONFIG).collect())
    )
    b = sorted(
        map(tuple, classify_pages(q_sigs, loaded_refs, TEST_CONFIG).collect())
    )
    assert a == b and len(a) > 0


def test_sketch_json_null_metadata_rejected(spark, tmp_path):
    """ADVICE r3: rows with NULL kmer/hashSeed/sketchSize (corrupt or
    foreign JSON) must FAIL validation — != predicates would three-value-
    logic them past the guard."""
    path = str(tmp_path / "corrupt")
    spark.createDataFrame(
        [('{"name":"u1","sketches":[1,2,3]}',)], "value string"
    ).write.mode("overwrite").text(path)
    with pytest.raises(ValueError, match="metadata mismatch"):
        read_sketch_json(spark, path, TEST_CONFIG)
    # still loads fine without a cfg (validation is opt-in)
    assert read_sketch_json(spark, path).count() == 1
