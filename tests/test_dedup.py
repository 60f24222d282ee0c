"""Dedup operator semantics on controlled fixtures + driver documents."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pcornet_data_curation_spark.functions import hashing as H
from pcornet_data_curation_spark.operators.dedup import (
    duplicate_groups,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

SF = "/root/testdata/sf0.001"

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different content about astronomy telescopes and distant galaxies"),
    (5, "another unrelated document regarding cooking recipes and kitchen tools"),
    (6, None),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).toPandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3, 4, 5, 6, 7]  # 2 removed, min-id survives
    groups = duplicate_groups(docs).toPandas()
    assert len(groups) == 1 and groups["n_docs"].iloc[0] == 2 and groups["min_id"].iloc[0] == 1


def test_spark_xxhash64_twin(spark):
    """functions.hashing.spark_xxhash64_longs must be bit-exact vs
    Spark's F.xxhash64 over long children — it is the foundation of the
    sessionless ivf_fit_pandas oracle twin."""
    vals = [0, 1, -1, 42, 7, 123456789, -987654321, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v",
        F.xxhash64(F.col("v").cast("long")).alias("h1"),
        F.xxhash64(F.col("v").cast("long"), F.lit(42).cast("long")).alias("h2"),
    )
    for r in df.collect():
        assert H.spark_xxhash64_longs(r["v"]) == r["h1"]
        assert H.spark_xxhash64_longs(r["v"], 42) == r["h2"]


def test_minhash_unit():
    s1 = H.minhash_signature(DOCS[0][1])
    s2 = H.minhash_signature(DOCS[1][1])
    s3 = H.minhash_signature(DOCS[2][1])
    s4 = H.minhash_signature(DOCS[3][1])
    assert s1 == s2  # identical docs → identical signatures
    sim13 = sum(a == b for a, b in zip(s1, s3)) / len(s1)
    sim14 = sum(a == b for a, b in zip(s1, s4)) / len(s1)
    assert sim13 > 0.6 > sim14
    real_j = H.jaccard(set(H.word_shingles(DOCS[0][1])), set(H.word_shingles(DOCS[2][1])))
    assert abs(sim13 - real_j) < 0.25  # minhash estimates jaccard


def test_minhash_lsh_pairs(spark, docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p or 5 in p for p in got)


def test_simhash_pairs(spark, docs):
    pairs = simhash_pairs(docs, max_hamming=6).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (1, 2) in got
    assert pairs.set_index(["id_a", "id_b"]).loc[(1, 2), "hamming"] == 0
    assert not any({4, 5} <= {a, b} for a, b in got)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    got = {(a, b): j for a, b, j in zip(pairs.id_a, pairs.id_b, pairs.jaccard)}
    assert got[(1, 2)] == 1.0
    want_13 = H.jaccard(set(H.word_shingles(DOCS[0][1])), set(H.word_shingles(DOCS[2][1])))
    assert got[(1, 3)] == pytest.approx(want_13, abs=1e-4)
    assert (4, 5) not in got


def test_ngram_jaccard_string_ids(spark, docs):
    """The grid keeps the pre-rewrite type-generic id contract: string
    doc keys (urls) pair and order exactly like longs — the output id
    type follows the input, diagonal ordering uses the same string
    comparison as the old join (< on UTF-8 order), and the capped
    path's hot-row union stays type-consistent."""
    sdocs = docs.withColumn("doc_id", F.concat(F.lit("url-"), F.col("doc_id")))
    base = ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    got = ngram_jaccard_pairs(sdocs, threshold=0.3).toPandas()
    assert got.id_a.map(type).eq(str).all()
    want = sorted((f"url-{a}", f"url-{b}", j) for a, b, j in
                  zip(base.id_a, base.id_b, base.jaccard))
    assert sorted(zip(got.id_a, got.id_b, got.jaccard)) == want
    capped = ngram_jaccard_pairs(sdocs, threshold=0.3, max_shingle_df=1000).toPandas()
    assert sorted(zip(capped.id_a, capped.id_b, capped.jaccard)) == want


def test_ngram_jaccard_chunked_kernel_identical(spark):
    """The grid kernel bounds its transient expansion arrays by
    processing A-side rows in product-row chunks (memory insurance for
    larger-than-bench inputs). Forcing a tiny chunk must give the
    IDENTICAL pair set and bit-identical jaccard values on the sf0.01
    table — chunk boundaries may split a document's shingle rows, so
    this pins the weighted re-unique merge."""
    import pcornet_data_curation_spark.operators.dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    old = D._JACCARD_CHUNK_ROWS
    D._JACCARD_CHUNK_ROWS = 97  # force many chunks per cell
    try:
        chunked = ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    finally:
        D._JACCARD_CHUNK_ROWS = old
    key = lambda p: sorted(zip(p.id_a, p.id_b, p.jaccard))  # noqa: E731
    assert key(base) == key(chunked)
    assert len(base) > 0  # the fixture must actually exercise pairs


def test_embedding_dup_exact_vs_lsh(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = embedding_dup_pairs(emb, threshold=0.97).toPandas()
    lsh = embedding_dup_pairs(emb, threshold=0.97, n_planes=4).toPandas()
    exact_set = {(a, b) for a, b in zip(exact.id_a, exact.id_b)}
    lsh_set = {(a, b) for a, b in zip(lsh.id_a, lsh.id_b)}
    assert lsh_set <= exact_set  # LSH returns a subset (no false positives)
    if exact_set:
        assert len(lsh_set) / len(exact_set) >= 0.3  # some recall


def test_ngram_jaccard_df_cap(spark, docs):
    """A document-frequency cap above every real df leaves results
    identical; a tight cap only LOWERS jaccard (drops hot shingles from
    the intersection) and never invents pairs."""
    base = ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    same = ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_df=1000).toPandas()
    key = lambda p: sorted(zip(p.id_a, p.id_b, p.jaccard.round(6)))
    assert key(base) == key(same)
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=2).toPandas()
    got = {(a, b): j for a, b, j in zip(capped.id_a, capped.id_b, capped.jaccard)}
    full = {(a, b): j for a, b, j in zip(base.id_a, base.id_b, base.jaccard)}
    assert set(got) <= {(1, 2), (1, 3), (2, 3)}  # no invented pairs
    for p, j in got.items():
        assert j <= full.get(p, 1.0) + 1e-9  # lower bound, never higher


def test_embedding_dup_auto_routes_to_multiseed(spark):
    """Above max_exact_rows the exact request must route to the
    MULTISEED sign-LSH union (ADVICE r2: the single 12-plane table's
    ≈0.28 recall at θ=0.95 was a silent 72% miss rate) and warn:
    routed pairs ⊆ exact, recall ≥ the single-table route, and the
    injected cosine-1.0 copies are found (identical vectors share
    every bucket in every table)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dups = emb.where(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    both = emb.unionByName(dups)
    exact = embedding_dup_pairs(both, threshold=0.95, max_exact_rows=0).toPandas()
    with pytest.warns(RuntimeWarning, match="multiseed"):
        routed = embedding_dup_pairs(
            both, threshold=0.95, max_exact_rows=10, dim=64
        ).toPandas()
    single = embedding_dup_pairs(
        both, threshold=0.95, n_planes=12, dim=64
    ).toPandas()
    exact_set = {(a, b) for a, b in zip(exact.id_a, exact.id_b)}
    routed_set = {(a, b) for a, b in zip(routed.id_a, routed.id_b)}
    single_set = {(a, b) for a, b in zip(single.id_a, single.id_b)}
    assert routed_set <= exact_set
    assert single_set <= routed_set  # multiseed union ⊇ its first table
    injected = {(int(v), int(v) + 1000000) for v in dups.toPandas().vec_id - 1000000}
    assert injected <= routed_set  # identical copies always bucket together


def test_exact_dedup_vs_duckdb_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = exact_dedup(docs).count()
    want = duckdb.sql(
        f"""with s as (select min(doc_id) doc_id from '{SF}/documents.parquet' group by text)
            select count(*) from s"""
    ).fetchone()[0]
    assert got == want


def test_connected_components_vs_union_find(spark):
    from pcornet_data_curation_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4), (40, 41)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }

    # oracle: plain union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


def test_connected_components_long_chain_logarithmic(spark):
    """Adversarial 1000-hop chain: min-label propagation needs one
    shuffle round per hop (1000 rounds); the large-star/small-star
    alternation must label the whole chain within 20 alternations
    (O(log n) bound) — max_iter=20 raises on failure."""
    from pcornet_data_curation_spark.operators.dedup import connected_components

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    # local_finish_edges=0 forces the distributed star loop — the
    # O(log n) bound under test (the default threshold would resolve
    # this chain driver-side and bypass the loop entirely)
    got = connected_components(pairs, max_iter=20, local_finish_edges=0).toPandas()
    assert len(got) == n + 1
    assert (got["component"] == 0).all()


def test_connected_components_local_finish_matches_distributed(spark):
    """The bounded driver-side union-find finish (default path at
    bench scale) must label EXACTLY like the distributed large-star/
    small-star fixpoint — same (node, component) set on a graph mixing
    chains, stars, merged clusters, isolated self-pairs, and reversed
    edge orientations."""
    from pcornet_data_curation_spark.operators.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(0, 40)]          # long chain
        + [(100, 100 + j) for j in range(1, 9)]      # star
        + [(205, 204), (203, 204), (201, 202), (202, 203)]  # reversed chain
        + [(300, 300), (301, 301)]                   # self-pairs
        + [(40, 100)]                                # merge chain into star
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, local_finish_edges=0).collect()
    }
    assert local == dist


def test_connected_components_self_pairs_and_empty(spark):
    """Self-pairs label themselves; an empty pair set yields an empty
    labeling (no driver-side crash in the fixpoint loop)."""
    from pcornet_data_curation_spark.operators.dedup import connected_components

    selfp = spark.createDataFrame([(7, 7), (8, 8)], "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(selfp).collect()}
    assert got == {7: 7, 8: 8}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_near_dedup_survivors(spark, docs):
    from pcornet_data_curation_spark.operators.dedup import near_dedup_survivors

    # DOCS fixture: 1=2 exact dups, 3 near-dup of them, 4/5 unique,
    # 6=None and 7="" (shingle-less docs carry the sentinel signature
    # and are EXCLUDED from pairing — unrelated empty docs are not
    # duplicates of each other, so both survive)
    out = near_dedup_survivors(docs, threshold=0.5).toPandas()
    ids = set(out["doc_id"])
    assert ids == {1, 4, 5, 6, 7}


def test_embedding_multiseed_recall(spark):
    """Stacking independent hyperplane tables strictly widens recall of
    the sign-LSH path toward the exact pair set, with zero false
    positives (every candidate is exact-cosine verified in-bucket)."""
    from pcornet_data_curation_spark.operators.dedup import (
        embedding_dup_pairs_multiseed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = embedding_dup_pairs(emb, threshold=0.97, max_exact_rows=0).toPandas()
    one = embedding_dup_pairs(emb, threshold=0.97, n_planes=4, dim=64).toPandas()
    multi = embedding_dup_pairs_multiseed(
        emb, threshold=0.97, n_planes=4, seeds=(42, 43, 44, 45), dim=64
    ).toPandas()
    ex = {(a, b) for a, b in zip(exact.id_a, exact.id_b)}
    s1 = {(a, b) for a, b in zip(one.id_a, one.id_b)}
    s4 = {(a, b) for a, b in zip(multi.id_a, multi.id_b)}
    assert s1 <= s4 <= ex  # monotone, never false-positive
    if ex:
        assert len(s4) / len(ex) >= len(s1) / len(ex)
        assert len(s4) / len(ex) >= 0.5  # 4 tables recover the majority


def test_shingleless_docs_never_pair(spark):
    """Empty/short docs carry sentinel signatures (all-MAX minhash,
    simhash 0); they must NOT band together as pairwise duplicates —
    the old behavior collapsed every <k-word doc into one component."""
    from pcornet_data_curation_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dedup_survivors,
        simhash_pairs,
    )

    rows = [
        (1, "hello world"),            # < 3 words: no 3-shingles
        (2, "buy now"),
        (3, None),
        (4, ""),
        (5, "   \t  "),
        (6, "a completely ordinary document with plenty of words inside it"),
        (7, "a completely ordinary document with plenty of words inside it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = minhash_lsh_pairs(df, threshold=0.8).toPandas()
    assert set(map(tuple, mh[["id_a", "id_b"]].values)) == {(6, 7)}
    sh = simhash_pairs(df, max_hamming=3).toPandas()
    # simhash pairs 1-2 only if their real token hashes collide (they
    # don't); the sentinel docs 3-5 must never appear at all
    assert not set(sh["id_a"]) & {3, 4, 5} and not set(sh["id_b"]) & {3, 4, 5}
    # survivors: every shingle-less doc survives untouched
    surv = set(near_dedup_survivors(df).toPandas()["doc_id"])
    assert {1, 2, 3, 4, 5}.issubset(surv) and surv & {6, 7} == {6}
