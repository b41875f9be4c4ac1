"""Property tests for the non-SQL-expressible dedup operators
(SURVEY.md §5.5): MinHash-LSH and SimHash.

The fixture has no byte-identical duplicates (verified), so exact-dup
properties use a constructed corpus (shifted-id copies); near-dup
properties use the corpus's natural high-shingle-Jaccard pairs
(bimodal: ~28 pairs >= 0.8, everything else ~0).

Verified properties:
1. identical texts -> identical MinHash signatures;
2. signature agreement rate approximates exact shingle-Jaccard;
3. LSH candidates contain every natural Jaccard>=0.8 pair (recall)
   without approaching all-pairs blowup (precision floor);
4. identical texts -> identical SimHash; natural near-dups -> small
   Hamming distance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_analysis_datalake_spark.catalog import load_table
from fts_analysis_datalake_spark.operators.dedup import (
    exact_jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_table,
    simhash_table_pandas,
)

SF_SMALL = "/root/testdata/sf0.001"
SHINGLE_N = 3


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    dup = docs.filter((F.col("doc_id") % 5) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(dup).cache()


@pytest.fixture(scope="module")
def sigs(spark, docs):
    return minhash_signatures(docs, "doc_id", "text", num_hashes=32).cache()


@pytest.fixture(scope="module")
def natural_high_pairs(spark, docs):
    """All natural pairs with shingle-Jaccard >= 0.8 (exhaustive)."""
    all_pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    high = exact_jaccard_for_pairs(docs, "doc_id", "text", all_pairs, SHINGLE_N).filter(
        F.col("jaccard") >= 0.8
    )
    return {(r.id_a, r.id_b) for r in high.collect()}


def test_identical_texts_same_signature(spark, docs_with_dups):
    sigs_dup = minhash_signatures(docs_with_dups, "doc_id", "text", num_hashes=32)
    pairs = docs_with_dups.filter(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    joined = (
        pairs.join(sigs_dup.withColumnsRenamed({"doc_id": "id_a", "sig": "sig_a"}), "id_a")
        .join(sigs_dup.withColumnsRenamed({"doc_id": "id_b", "sig": "sig_b"}), "id_b")
    )
    assert joined.count() == 100
    assert joined.filter(F.col("sig_a") != F.col("sig_b")).count() == 0


def test_signature_agreement_tracks_jaccard(spark, docs, sigs, natural_high_pairs):
    # Mix of near-dup pairs and unrelated pairs.
    rows = [(int(a), int(b)) for a, b in sorted(natural_high_pairs)[:20]]
    rows += [(i, i + 100) for i in range(0, 100, 7)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long").distinct()
    jac = exact_jaccard_for_pairs(docs, "doc_id", "text", pairs, SHINGLE_N)
    agree = (
        pairs.join(sigs.withColumnsRenamed({"doc_id": "id_a", "sig": "sig_a"}), "id_a")
        .join(sigs.withColumnsRenamed({"doc_id": "id_b", "sig": "sig_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
                / F.size("sig_a")
            ).alias("agreement"),
        )
    )
    out = jac.join(agree, ["id_a", "id_b"]).collect()
    assert len(out) > 20
    # 32 hashes -> per-pair stddev sqrt(j(1-j)/32) <= 0.09; 0.35 is >3 sigma.
    for r in out:
        assert abs(r.agreement - r.jaccard) <= 0.35, (r.id_a, r.id_b, r.jaccard, r.agreement)


def test_lsh_recall_of_high_jaccard_pairs(spark, docs, sigs, natural_high_pairs):
    assert natural_high_pairs, "fixture should contain natural near-dup pairs"
    cands = lsh_candidate_pairs(sigs, "doc_id", num_hashes=32, bands=8)
    cand_set = {(r.id_a, r.id_b) for r in cands.collect()}
    missed = natural_high_pairs - cand_set
    assert not missed, f"LSH missed {len(missed)}/{len(natural_high_pairs)} high-Jaccard pairs"
    n_docs = docs.count()
    assert len(cand_set) < n_docs * (n_docs - 1) / 2 * 0.2, "candidate blowup"


@pytest.mark.parametrize(
    "impl", [simhash_table, simhash_table_pandas], ids=["catalyst", "pandas_udf"]
)
def test_simhash_properties(spark, docs, docs_with_dups, natural_high_pairs, impl):
    simhash_table = impl  # noqa: F841 — shadow so the body tests either impl
    sim_dup = simhash_table(docs_with_dups, "doc_id", "text")
    pairs = docs_with_dups.filter(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    j = (
        pairs.join(sim_dup.withColumnsRenamed({"doc_id": "id_a", "simhash": "sh_a"}), "id_a")
        .join(sim_dup.withColumnsRenamed({"doc_id": "id_b", "simhash": "sh_b"}), "id_b")
        .select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("ham"))
    )
    hams = [r.ham for r in j.collect()]
    assert len(hams) == 100 and all(h == 0 for h in hams)

    # Natural near-dups: small Hamming distance (token multisets differ
    # by a handful of words).
    sim = simhash_table(docs, "doc_id", "text")
    rows = [(int(a), int(b)) for a, b in sorted(natural_high_pairs)]
    near = spark.createDataFrame(rows, "id_a long, id_b long")
    j2 = (
        near.join(sim.withColumnsRenamed({"doc_id": "id_a", "simhash": "sh_a"}), "id_a")
        .join(sim.withColumnsRenamed({"doc_id": "id_b", "simhash": "sh_b"}), "id_b")
        .select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("ham"))
    )
    near_hams = [r.ham for r in j2.collect()]
    assert near_hams and sum(near_hams) / len(near_hams) <= 16, near_hams


def test_dedup_pipeline_report_identities(spark):
    """The one-row pipeline report must satisfy the survivor
    accounting identities: every cluster has >= 2 members, members
    never exceed docs, and kept = docs - members + clusters."""
    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR_SMALL

    _load_all()
    r = REGISTRY["q_dedup_pipeline_report"].fn(spark, SF_DIR_SMALL).first()
    assert r.n_docs > 0
    assert 0 <= r.n_members <= r.n_docs
    assert r.n_clusters <= r.n_members // 2 or r.n_members == 0
    assert r.n_kept == r.n_docs - r.n_members + r.n_clusters
    assert r.n_kept <= r.n_docs


def test_minhash_md5_pairs_find_planted_dups(spark):
    """E275: every planted re-delivery (doc_id + 1000000, 2-token
    suffix) must survive banding + exact verify — byte-identical
    prefixes agree on every minhash, so recall on planted dups is
    deterministic 100%, not probabilistic."""
    from pyspark.sql import functions as F

    from fts_analysis_datalake_spark.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR_SMALL

    _load_all()
    df = REGISTRY["q_minhash_lsh_md5_pairs"].fn(spark, SF_DIR_SMALL)
    planted = (
        df.filter((F.col("id_b") - F.col("id_a")) == 1000000)
        .select("id_a")
        .collect()
    )
    found = {r.id_a for r in planted}
    import duckdb

    expected = {
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM read_parquet('{SF_DIR_SMALL}/documents.parquet')"
            " WHERE doc_id % 10 = 0"
        )
        .fetchall()
    }
    assert expected <= found, expected - found
    # jaccard of a planted pair is high but < 1 (the 2-token suffix
    # adds shingles to one side only)
    jq = (
        df.filter((F.col("id_b") - F.col("id_a")) == 1000000)
        .agg(F.min("jaccard_q").alias("mn"), F.max("jaccard_q").alias("mx"))
        .first()
    )
    assert 0.5 <= jq.mn <= jq.mx < 1.0
