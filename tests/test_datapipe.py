"""Training-data operator tests: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    simhash,
    simhash_near_pairs,
)
from sequin_spark.datapipe.multimodal import attach_media, decode_media, frame_sample
from sequin_spark.datapipe.similarity import ann_lsh_topk, brute_force_topk
from sequin_spark.datapipe.text import langid, quality_score


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text="The  quick brown fox jumps over the lazy dog and runs far away home"),
            Row(doc_id=3, text=base.replace("lazy", "sleepy")),
            Row(doc_id=4, text="completely different words about spark engines and data pipelines here"),
        ]
    )


def test_exact_dedup_normalizes(spark, docs):
    out = exact_dedup(docs)
    rows = {r.keep_id: r.dup_count for r in out.collect()}
    # doc 2 differs only in case/whitespace → same hash as doc 1
    assert rows[1] == 2
    assert rows[3] == 1 and rows[4] == 1


def test_minhash_finds_near_dupes(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs            # exact dup always collides
    assert (1, 4) not in pairs        # unrelated doc shouldn't
    # a one-word edit in a LONG doc keeps Jaccard ≈ 0.92 — at 4 bands × 2
    # rows the miss probability is (1-J²)⁴ ≈ 0.05%, robust to the choice
    # of permutation family. (The 14-word fixture pair sits at J ≈ 0.6,
    # the S-curve threshold, where collision is a coin flip by design.)
    long_base = " ".join(f"token{i}" for i in range(40))
    long_docs = spark.createDataFrame([
        Row(doc_id=21, text=long_base),
        Row(doc_id=22, text=long_base.replace("token20", "edited")),
    ])
    long_pairs = {(r.doc_a, r.doc_b)
                  for r in minhash_candidate_pairs(long_docs).collect()}
    assert (21, 22) in long_pairs


def test_minhash_short_docs_dont_crash(spark, docs):
    """Docs with < shingle_k words must yield empty shingles / null
    signatures, not an ANSI INVALID_ARRAY_INDEX from a descending
    sequence() — one short doc in an incoming batch must not kill it."""
    from sequin_spark.datapipe.dedup import minhash_signatures

    short = spark.createDataFrame(
        [Row(doc_id=10, text="hi"), Row(doc_id=11, text="one two"), Row(doc_id=12, text="")]
    )
    sigs = {r.doc_id: r.sig1 for r in minhash_signatures(short).collect()}
    assert sigs == {10: None, 11: None, 12: None}
    # and short docs mixed into a corpus never become candidates
    pairs = minhash_candidate_pairs(docs.unionByName(short)).collect()
    assert all(r.doc_a not in (10, 11, 12) and r.doc_b not in (10, 11, 12) for r in pairs)


def test_simhash_hamming(spark, docs):
    pairs = simhash_near_pairs(simhash(docs), max_hamming=2).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got              # identical normalized text → distance 0
    ham = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert ham[(1, 2)] == 0


def test_simhash_pigeonhole_equals_allpairs(spark, sf_dir):
    """The chunk-bucketed candidate join + exact verify must equal the
    naive all-pairs join — bucketing is a pure physical optimization."""
    from sequin_spark.cdc import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    sim = simhash(docs, hex_digits=15).cache()
    bucketed = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(sim, max_hamming=4, nbits=60).collect()
    }
    a, b = sim.alias("a"), sim.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    naive = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
        .collect()
    }
    assert bucketed == naive


def test_ngram_jaccard_lsh_pairs(spark, docs):
    from sequin_spark.datapipe.dedup import ngram_jaccard_lsh_pairs

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_lsh_pairs(docs, n=2, threshold=0.1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical normalized text
    assert all(a < b for a, b in pairs)
    assert (1, 4) not in pairs  # unrelated docs never become candidates


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    from sequin_spark.cdc import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id) for r in brute_force_topk(emb, queries, k=3).collect()
    }
    approx = {
        (r.q_id, r.n_id) for r in ann_lsh_topk(emb, queries, k=3, n_planes=4).collect()
    }
    # sign-random-projection with 4 planes: expect meaningful overlap with
    # the exact top-k (recall >= 20% on random data is a sanity floor)
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall suspiciously low: {recall}"


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import ann_ivf_topk, ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id) for r in brute_force_topk(emb, queries, k=3).collect()}
    # build once (sample-fit), reuse across query batches — the scale lifecycle
    index = ivf_index(emb, n_centroids=8, max_train_rows=300)
    ivf = {
        (r.q_id, r.n_id)
        for r in ann_ivf_topk(emb, queries, k=3, n_probe=4, index=index).collect()
    }
    assert len(ivf) == len(exact)
    recall = len(exact & ivf) / len(exact)
    # probing half the lists on random data: expect solid recall
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # second batch against the SAME index: no refit, still sane results
    q2 = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    again = ann_ivf_topk(emb, q2, k=3, n_probe=4, index=index)
    assert again.count() == 15


def test_ann_ivf_det_matches_shape(spark, sf_dir):
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import ann_ivf_det_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = ann_ivf_det_topk(emb, queries, k=3, n_centroids=4, n_probe=2, iters=1)
    rows1 = sorted((r.q_id, r.n_id, r.rnk) for r in r1.collect())
    # deterministic: an identical second run returns identical rows
    r2 = ann_ivf_det_topk(emb, queries, k=3, n_centroids=4, n_probe=2, iters=1)
    rows2 = sorted((r.q_id, r.n_id, r.rnk) for r in r2.collect())
    assert rows1 == rows2 and len(rows1) == 15


def test_langid_votes(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of a house in to"),
            Row(doc_id=2, text="der hund und die katze ist das"),
            Row(doc_id=3, text="xyzzy plugh"),
        ]
    )
    got = {r.doc_id: r.predicted_lang for r in langid(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "und"


def test_quality_score_keep_flag(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the data of the system and the model in the world " * 5),
            Row(doc_id=2, text="x 1 2 3"),
        ]
    )
    got = {r.doc_id: r for r in quality_score(df).collect()}
    assert bool(got[1].keep) is True
    assert bool(got[2].keep) is False


def test_multimodal_plumbing(spark, docs):
    media = attach_media(docs, "text")
    decoded = decode_media(media)
    rows = {r.doc_id: r for r in decoded.collect()}
    assert rows[1].status == "stub_decoded"
    assert rows[1].n_bytes == len(
        "the quick brown fox jumps over the lazy dog and runs far away home"
    )
    assert rows[1].width == rows[1].n_bytes % 640 + 1
    frames = frame_sample(media, every_n=2)
    assert frames.count() > 0


def test_multimodal_stub_gate(spark, docs, monkeypatch):
    import sequin_spark.datapipe.multimodal as mm

    monkeypatch.setattr(mm, "FAKE_DECODE", False)
    media = attach_media(docs, "text")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        mm.decode_media(media).collect()


def test_connected_components_transitive(spark):
    """A~B, B~C (no A~C pair) must collapse into ONE cluster; disjoint
    pairs stay separate; representatives = min id; singletons keep."""
    from sequin_spark.datapipe.dedup import (
        cluster_representatives,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11), (20, 12)],
        "doc_a long, doc_b long",
    )
    comps = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 12: 12, 20: 12}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 10, 11, 12, 20, 99]], "doc_id long")
    reps = {
        r["doc_id"]: (r["keep"], r["cluster_id"])
        for r in cluster_representatives(connected_components(pairs), docs).collect()
    }
    assert reps[1] == (True, 1) and reps[2] == (False, 1) and reps[7] == (False, 1)
    assert reps[99] == (True, 99)  # singleton: unpaired doc keeps itself
    assert sum(1 for k, _ in reps.values() if k) == 4  # 3 reps + 1 singleton


def test_connected_components_long_chain(spark):
    """A 12-node path graph (worst-case diameter) still converges."""
    from sequin_spark.datapipe.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12, 0, -1)], "doc_a long, doc_b long"
    )
    out = connected_components(pairs).collect()
    assert {r["cluster_id"] for r in out} == {1}
    assert len(out) == 13


def test_sample_to_budget_deterministic(spark, sf_dir):
    """Hash sampling: rerun identical; rates track the budget split;
    unweighted strata drop entirely."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.curation import sample_to_budget

    docs = load_table(spark, sf_dir, "documents")
    a = sample_to_budget(docs, {"en": 1.0}, budget_tokens=5_000)
    b = sample_to_budget(docs, {"en": 1.0}, budget_tokens=5_000)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())
    assert {r["stratum"] for r in a.collect()} == {"en"}  # others unweighted
    # sampled token volume lands near the budget (hash-uniform)
    got = a.groupBy().sum("n_tokens").collect()[0][0]
    assert 2_500 < got < 7_500


def test_pack_sequences_layout(spark, sf_dir):
    """Offsets are per-bucket running sums; seq boundaries honor
    seq_len; every doc is placed exactly once."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.curation import pack_sequences
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = pack_sequences(docs, seq_len=100, n_buckets=4).cache()
    assert out.count() == docs.count()
    rows = out.orderBy("bucket", "doc_id").collect()
    by_bucket = {}
    for r in rows:
        expect = by_bucket.get(r["bucket"], 0)
        assert r["offset"] == expect, r
        assert r["seq_id"] == r["offset"] // 100
        by_bucket[r["bucket"]] = expect + r["n_tokens"]
    out.unpersist()


def test_incremental_dedup_batch_vs_corpus(spark, sf_dir):
    """New-batch dedup: copies map to their source doc; novel docs
    (no corpus counterpart) come back with duplicate_of = null."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.dedup import incremental_dedup
    from pyspark.sql import functions as F

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = corpus.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(9001, "completely unrelated nonsense tokens qq ww ee rr tt yy uu ii oo pp")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup(
        copies.unionByName(novel), corpus, threshold=0.5
    ).collect()}
    for r in out.values():
        if r["doc_id"] == 9001:
            assert r["duplicate_of"] is None
        else:
            assert r["duplicate_of"] == r["doc_id"] - 5000  # exact copy → its source
            assert r["jaccard"] == 1.0


def test_incremental_dedup_against_loaded_index(spark, sf_dir, tmp_path):
    """The persistable index path: build once, save, load, ingest — the
    corpus is never re-shingled at ingest time, and results match the
    direct (corpus-DataFrame) path exactly."""
    from pyspark.sql import functions as F

    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.dedup import (
        DedupIndex,
        build_dedup_index,
        incremental_dedup,
    )

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = corpus.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    idx_path = str(tmp_path / "dedup_index")
    build_dedup_index(corpus).save(idx_path)

    loaded = DedupIndex.load(spark, idx_path)
    via_index = incremental_dedup(batch, index=loaded, threshold=0.5)
    direct = incremental_dedup(batch, corpus, threshold=0.5)
    assert sorted(map(tuple, via_index.collect())) == sorted(map(tuple, direct.collect()))
    # band partitioning on disk → an ingest probing band=1 prunes 3/4
    import os
    assert any(d.startswith("band=") for d in os.listdir(idx_path + "/bands"))


def test_semdedup_marks_semantic_duplicates(spark):
    """SemDeDup: near-identical embeddings in the same cluster are marked
    duplicates of the lowest-id anchor; distant vectors survive."""
    from pyspark.sql import Row

    from sequin_spark.datapipe.similarity import semdedup

    def vec(base, eps=0.0):
        return [float(base[i]) + (eps if i == 0 else 0.0) for i in range(8)]

    a = [1, 0, 0, 0, 0, 0, 0, 0]
    b = [0, 1, 0, 0, 0, 0, 0, 0]
    rows = [
        Row(vec_id=1, embedding=vec(a)),
        Row(vec_id=2, embedding=vec(a, eps=0.01)),   # ≈ duplicate of 1
        Row(vec_id=3, embedding=vec(b)),             # orthogonal — kept
        Row(vec_id=4, embedding=vec(a, eps=0.02)),   # ≈ duplicate of 1
    ]
    out = {r.vec_id: r for r in semdedup(
        spark.createDataFrame(rows), k=2, threshold=0.95, iters=1
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert not out[1].is_dup and out[1].dup_of is None   # anchor survives
    assert out[2].is_dup and out[2].dup_of == 1
    assert out[4].is_dup and out[4].dup_of in (1, 2)     # same near-dup set
    assert not out[3].is_dup                              # orthogonal kept
    # every duplicate's anchor is itself kept or chains to a kept anchor
    kept = {i for i, r in out.items() if not r.is_dup}
    assert all(r.dup_of in out for r in out.values() if r.is_dup)
    assert kept  # at least the anchors survive


def test_semdedup_auto_k_and_index_warm_path(spark, sf_dir):
    """auto-k scales k with corpus size (bounded clusters at any N);
    a saved SemDedupIndex reproduces the cold-run output exactly; the
    large-k broadcast-join assignment matches the literal path."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import (
        SemDedupIndex,
        _assign_via_join,
        as_double,
        assign_to_centroids,
        det_centroids,
        semdedup,
        semdedup_auto_k,
    )

    # auto-k formula: floor at k_min, then ceil(N / target)
    assert semdedup_auto_k(500, 125) == 16
    assert semdedup_auto_k(10_000, 125) == 80
    assert semdedup_auto_k(10_001, 125) == 81

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.col("vec_id").alias("_id"), as_double("embedding").alias("v"))
    cents = det_centroids(e, 8, 1, id_col=None)

    # broadcast-join assignment == literal-expression assignment
    lit = sorted(map(tuple, assign_to_centroids(e, cents).select("_id", "c_id").collect()))
    jn = sorted(map(tuple, _assign_via_join(e, cents).select("_id", "c_id").collect()))
    assert lit == jn

    # index warm path == cold run
    import os
    idx_path = "/tmp/semdedup_idx_test"
    idx = SemDedupIndex(
        centroids=cents,
        assignments=assign_to_centroids(e, cents).select("_id", "c_id"),
    )
    idx.save(idx_path)
    loaded = SemDedupIndex.load(spark, idx_path)
    assert loaded.centroids == cents
    warm = sorted(map(tuple, semdedup(emb, threshold=0.3, index=loaded).collect()))
    cold = sorted(map(tuple, semdedup(emb, k=8, threshold=0.3, iters=1).collect()))
    assert warm == cold
    assert os.path.isdir(os.path.join(idx_path, "assignments"))


def test_pq_adc_recall_and_encoding(spark, sf_dir):
    """PQ (similarity.py): codes are within-range, the prebuilt-codes
    path matches on-the-fly encoding, and ADC recall vs exact L2-ish
    ranking is sane for m=4/ksub=8 on random data."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    books = pq_codebooks(emb, m=16, ksub=16, iters=2, dims=64)
    assert len(books) == 16 and all(1 <= len(b) <= 16 for b in books)

    codes = pq_encode(emb, books, dims=64).cache()
    row = codes.first()
    assert len(row.code) == 16 and all(0 <= c < 16 for c in row.code)

    # prebuilt-codes search == on-the-fly search (the index lifecycle)
    on_the_fly = {(r.q_id, r.n_id, r.rnk)
                  for r in pq_adc_topk(emb, queries, books, k=3).collect()}
    prebuilt = {(r.q_id, r.n_id, r.rnk)
                for r in pq_adc_topk(emb, queries, books, k=3,
                                     codes=codes).collect()}
    assert on_the_fly == prebuilt and len(prebuilt) == 30

    # ADC approximates L2; exact L2 top-3 per query for comparison
    from sequin_spark.datapipe.similarity import as_double
    q = queries.select(F.col("vec_id").alias("q_id"),
                       as_double("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("n_id"),
                   as_double("embedding").alias("nv"))
    l2 = F.aggregate(F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("n_id").asc())
    exact = {
        (r.q_id, r.n_id)
        for r in q.crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
        .withColumn("d", l2)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3).collect()
    }
    approx = {(t[0], t[1]) for t in prebuilt}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"PQ ADC recall suspiciously low: {recall}"
    codes.unpersist()


def test_pq_and_ivfpq_index_persistence(spark, sf_dir, tmp_path):
    """PQIndex / IVFPQIndex save→load reproduces the from-scratch search
    exactly (the maintained-index lifecycle: fit+encode once per corpus,
    every later search loads)."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import (
        IVFPQIndex,
        PQIndex,
        ann_ivfpq_topk,
        build_ivfpq_index,
        build_pq_index,
        pq_adc_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    pq = build_pq_index(emb, m=8, ksub=8, iters=1, dims=64)
    pq.save(str(tmp_path / "pq"))
    loaded = PQIndex.load(spark, str(tmp_path / "pq"))
    assert loaded.books == pq.books
    fresh = sorted(map(tuple, pq_adc_topk(
        emb, queries, pq.books, k=3).collect()))
    warm = sorted(map(tuple, pq_adc_topk(
        emb, queries, loaded.books, k=3, codes=loaded.codes).collect()))
    assert fresh == warm and len(warm) == 15

    ivf = build_ivfpq_index(emb, n_centroids=4, m=8, ksub=8, dims=64)
    ivf.save(str(tmp_path / "ivfpq"))
    lo = IVFPQIndex.load(spark, str(tmp_path / "ivfpq"))
    assert lo.cent_rows == ivf.cent_rows and lo.books == ivf.books
    fresh = sorted(map(tuple, ann_ivfpq_topk(
        emb, queries, k=3, n_probe=2, index=ivf).collect()))
    warm = sorted(map(tuple, ann_ivfpq_topk(
        emb, queries, k=3, n_probe=2, index=lo).collect()))
    assert fresh == warm and len(warm) == 15
    # corpus parquet is partitioned by inverted list (probe pruning)
    import os
    assert any(d.startswith("c_id=")
               for d in os.listdir(tmp_path / "ivfpq" / "corpus"))


def test_ivfpq_recall_and_probe_restriction(spark, sf_dir):
    """IVF-PQ composite: results are a subset of the probed lists and
    recall vs exact L2 stays sane despite double approximation."""
    from pyspark.sql import Window

    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import (
        ann_ivfpq_topk,
        as_double,
        assign_to_centroids,
        det_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    got = ann_ivfpq_topk(emb, queries, k=3, n_centroids=8, n_probe=4).collect()
    assert len(got) == 30 and all(1 <= r.rnk <= 3 for r in got)

    # every reported neighbor must live in one of the query's probed lists
    e = emb.select(F.col("vec_id").alias("_id"),
                   as_double("embedding").alias("v"))
    cents = det_centroids(e, 8, 1, id_col=None)
    assign = {r._id: r.c_id for r in assign_to_centroids(e, cents).collect()}
    probes = {}
    for q in queries.collect():
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip([float(x) for x in q.embedding], c)), cid)
            for cid, c in cents
        )
        probes[q.vec_id] = {cid for _, cid in dists[:4]}
    for r in got:
        assert assign[r.n_id] in probes[r.q_id]

    # recall floor vs exact L2 top-3
    q = queries.select(F.col("vec_id").alias("q_id"), as_double("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("n_id"), as_double("embedding").alias("nv"))
    l2 = F.aggregate(F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("n_id").asc())
    exact = {
        (r.q_id, r.n_id)
        for r in q.crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
        .withColumn("d", l2).withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3).collect()
    }
    approx = {(r.q_id, r.n_id) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"IVF-PQ recall suspiciously low: {recall}"


def test_temperature_mix_flattens_head(spark, sf_dir):
    """α=0.5 smoothing: the low-resource stratum's sampled share must
    exceed its natural share; selection is deterministic; per-stratum
    sampled counts track keep_p · n_docs."""
    from sequin_spark.datapipe.curation import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_mix(docs, budget_docs=200).collect()
    rows = {r.stratum: r for r in out}
    n_total = sum(r.n_docs for r in out)
    smallest = min(out, key=lambda r: r.n_docs)
    # smoothed target share > natural share for the tail stratum
    assert smallest.target_share > smallest.n_docs / n_total
    # shares sum to ~1
    assert abs(sum(r.target_share for r in out) - 1.0) < 1e-3
    # determinism
    again = {r.stratum: r for r in temperature_mix(docs, budget_docs=200).collect()}
    for s, r in rows.items():
        assert again[s].n_sampled == r.n_sampled
    # hash selection lands near keep_p · n (3-sigma binomial tolerance)
    import math

    for r in out:
        exp = r.keep_p * r.n_docs
        tol = 3 * math.sqrt(max(exp, 1)) + 2
        assert abs(r.n_sampled - exp) <= tol, (r.stratum, r.n_sampled, exp)


def test_ann_recall_bounds_and_self_agreement(spark, sf_dir):
    """recall == 1.0 when the approx result IS the ground truth; the
    IVF-probed result's recall is in (0, 1] and counts only true
    intersections."""
    from sequin_spark.datapipe.similarity import (
        ann_ivf_det_topk,
        ann_recall,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    ground = brute_force_topk(emb, queries, k=5)
    perfect = ann_recall(ground, ground, k=5).collect()
    assert all(r.recall == 1.0 and r.n_hits == 5 for r in perfect)

    approx = ann_ivf_det_topk(emb, queries, k=5, n_centroids=8, n_probe=2, iters=1)
    got = ann_recall(ground, approx, k=5).collect()
    assert {r.q_id for r in got} == {r.q_id for r in perfect}
    for r in got:
        assert 0 <= r.n_hits <= 5
        assert r.recall == round(r.n_hits / 5, 4)


def test_perplexity_buckets_terciles(spark, sf_dir):
    """Buckets partition the corpus into ~equal thirds ordered by nll."""
    from sequin_spark.datapipe.text import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = perplexity_buckets(docs).collect()
    by = {}
    for r in out:
        by.setdefault(r.bucket, []).append(r.nll)
    assert set(by) == {"head", "middle", "tail"}
    n = len(out)
    for b, vals in by.items():
        assert abs(len(vals) - n / 3) <= n * 0.05 + 2, (b, len(vals), n)
    # strict ordering between buckets (exact for tercile thresholds)
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])


def test_bigram_hash_collision_guard_fires(spark, monkeypatch):
    """The LM scoring passes join on a 64-bit bigram hash instead of
    the two word strings (r14 key narrowing); the in-plan guard must
    fail LOUDLY if two distinct bigrams ever share a hash, never merge
    their terms silently.  Forced here with a deliberately degenerate
    hash (every bigram → 0)."""
    from sequin_spark.datapipe import text as text_mod

    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], "doc_id long, text string")
    monkeypatch.setattr(text_mod, "_bigram_hash",
                        lambda w1, w2: F.lit(0).cast("long"))
    with pytest.raises(Exception, match="collision"):
        text_mod.bigram_lm_scores(docs).collect()


def test_bigram_hash_keyed_terms_passthrough(spark):
    """With the real xxhash64 key the guard is inert: every distinct
    bigram keeps exactly its own term value."""
    from sequin_spark.datapipe import text as text_mod

    terms = spark.createDataFrame(
        [("a", "b", 1.5), ("b", "c", -0.25), ("a", "c", 0.0)],
        "w1 string, w2 string, nll_term double")
    got = text_mod.hash_keyed_terms(terms, "nll_term").collect()
    assert sorted(r.nll_term for r in got) == [-0.25, 0.0, 1.5]
    assert len({r._h2 for r in got}) == 3


def test_unimax_waterfilling(spark):
    from sequin_spark.datapipe.curation import unimax_allocation

    rows = [(i, "tiny") for i in range(10)] + \
           [(100 + i, "small") for i in range(50)] + \
           [(1000 + i, "big") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # capacities: tiny 20, small 100, big 1000 (E=2). Budget 600:
    #  tiny: 20*3=60 <= 600 → capped (prefix 20)
    #  small: 100*2=200 <= 580 → capped (prefix 120)
    #  big: 1000*1=1000 > 480 → share frozen at 480
    out = {r.stratum: r for r in
           unimax_allocation(df, budget_docs=600, max_epochs=2).collect()}
    assert out["tiny"].capped and out["tiny"].alloc == 20.0 and out["tiny"].epochs == 2.0
    assert out["small"].capped and out["small"].alloc == 100.0
    assert not out["big"].capped and out["big"].alloc == 480.0
    assert out["big"].epochs == round(480 / 500, 4)
    # total allocation exhausts the budget when any stratum is uncapped
    assert sum(r.alloc for r in out.values()) == 600.0

    # budget above total capacity → everything capped at max_epochs
    all_capped = {r.stratum: r for r in
                  unimax_allocation(df, budget_docs=10_000, max_epochs=2).collect()}
    assert all(r.capped and r.epochs == 2.0 for r in all_capped.values())


def test_probe_media_headers_real_containers(spark):
    """Header probing parses REAL container bytes — a genuine PNG
    (zlib-deflated IDAT via stdlib), a stdlib-written WAV, and
    spec-built JPEG/GIF/BMP headers — plus unknown/truncated blobs,
    through the full Arrow mapInPandas path."""
    import io
    import struct
    import wave
    import zlib

    from sequin_spark.datapipe.multimodal import (
        probe_header,
        probe_media_headers,
    )

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # real 3x2 grayscale PNG, fully valid (decodable by any viewer)
    raw = b"".join(b"\x00" + bytes([10, 20, 30]) for _ in range(2))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    # real WAV via the stdlib writer: 1 channel, 22050 Hz
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(b"\x00\x00" * 10)
    wav = buf.getvalue()
    # structurally-valid JPEG marker stream: SOI, APP0, SOF0 640x480x3
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 480, 640) + bytes([3, 1, 0x11, 0]))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 128, -64) + b"\x00" * 8

    assert probe_header(png) == {
        "format": "png", "width": 3, "height": 2, "n_channels": 1,
        "sample_rate": None, "status": "probed"}
    assert probe_header(wav)["format"] == "wav"
    assert probe_header(wav)["sample_rate"] == 22050
    assert probe_header(wav)["n_channels"] == 1
    assert probe_header(jpeg) == {
        "format": "jpeg", "width": 640, "height": 480, "n_channels": 3,
        "sample_rate": None, "status": "probed"}
    assert probe_header(gif)["width"] == 320
    assert probe_header(bmp) == {
        "format": "bmp", "width": 128, "height": 64, "n_channels": None,
        "sample_rate": None, "status": "probed"}  # top-down BMP: |h|
    assert probe_header(b"plain text")["status"] == "unrecognized"
    assert probe_header(b"\x89PNG\r\n\x1a")["status"] == "unrecognized"

    # end-to-end through Spark: binary column → Arrow → probe schema
    rows = [(1, "image", png, "raw", len(png)),
            (2, "audio", wav, "raw", len(wav)),
            (3, "image", jpeg, "raw", len(jpeg)),
            (4, "text", b"not media", "raw", 9)]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, blob binary, "
              "meta_format string, n_bytes long")
    got = {r["doc_id"]: r.asDict() for r in
           probe_media_headers(media).collect()}
    assert got[1]["format"] == "png" and got[1]["width"] == 3
    assert got[2]["sample_rate"] == 22050
    assert got[3]["height"] == 480
    assert got[4]["status"] == "unrecognized"
    assert got[4]["width"] is None


def test_top_principal_component_is_dominant_eigendirection(spark):
    """The quantized power iteration converges to the dominant
    eigendirection of XᵀX: compare against numpy's exact
    eigendecomposition on a synthetic corpus with a planted dominant
    direction; sign-canonical and unit-norm."""
    import numpy as np

    from sequin_spark.datapipe.similarity import top_principal_component

    rng = np.random.default_rng(5)
    dom = rng.normal(size=16)
    dom /= np.linalg.norm(dom)
    # 400 vectors: strong component along `dom` + small isotropic noise
    coeffs = rng.normal(scale=5.0, size=(400, 1))
    xs = coeffs * dom + rng.normal(scale=0.3, size=(400, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(xs)],
        "vec_id long, embedding array<float>")
    got = np.array(top_principal_component(df, dims=16, iters=8))
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4
    # eigenvector of the uncentered second moment, up to sign
    m = (xs.astype(np.float32).astype(np.float64)).T @ \
        (xs.astype(np.float32).astype(np.float64))
    evals, evecs = np.linalg.eigh(m)
    top = evecs[:, -1]
    assert abs(abs(float(got @ top)) - 1.0) < 1e-3
    # sign canon: the largest-|component| dim is positive
    mi = int(np.argmax(np.abs(got)))
    assert got[mi] > 0


def test_remove_top_component_orthogonalizes(spark):
    """x' = x − (x·v)v has (near-)zero component along v — exact up to
    the 1e-6 quantization of v — and leaves orthogonal content alone."""
    import numpy as np

    from sequin_spark.datapipe.similarity import remove_top_component

    v = [0.6, 0.8, 0.0]
    df = spark.createDataFrame(
        [(0, [2.0, 1.0, 3.0]), (1, [-1.0, 4.0, 0.5])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: np.array(r["debiased"])
           for r in remove_top_component(df, v).collect()}
    va = np.array(v)
    for i, x in ((0, np.array([2.0, 1.0, 3.0])),
                 (1, np.array([-1.0, 4.0, 0.5]))):
        assert abs(float(out[i] @ va)) < 1e-9
        # orthogonal part untouched
        want = x - (x @ va) * va
        assert np.allclose(out[i], want, atol=1e-9)


def test_embed_int8_quantize_error_bound(spark, sf_dir):
    """Scalar quantization error is bounded by scale/2 per element, so
    the per-dim mean must be too; ranges sane."""
    from sequin_spark.queries_datapipe import q_embed_int8_quantize

    rows = q_embed_int8_quantize(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 64
    for r in rows:
        scale = (r["dim_max"] - r["dim_min"]) / 255.0
        assert r["dim_max"] >= r["dim_min"]
        assert r["mean_abs_err"] <= scale / 2 + 1e-9, r


def test_ngram_containment_finds_fragments(spark, sf_dir):
    """A half-length fragment must surface with containment ≈ 1.0 while
    its Jaccard sits near 0.5 — the case plain near-dup misses."""
    from sequin_spark.datapipe.dedup import ngram_containment_lsh_pairs
    from sequin_spark.queries_datapipe import _docs_with_fragments

    pairs = ngram_containment_lsh_pairs(
        _docs_with_fragments(spark, sf_dir), n=2, threshold=0.7,
        bands=4, rows_per_band=2, shingle_k=3).collect()
    assert pairs, "no containment pairs found"
    frag_pairs = [r for r in pairs
                  if r["doc_small"] >= 20000
                  and r["doc_large"] == r["doc_small"] - 20000]
    assert frag_pairs, "no fragment-parent pair recalled by LSH"
    for r in frag_pairs:
        assert r["containment"] >= 0.95, r
        assert r["jaccard"] <= 0.75, r  # the gap containment closes
    # doc_small is always the smaller gram set → containment >= jaccard
    assert all(r["containment"] >= r["jaccard"] for r in pairs)


def test_ewma_anomaly_dyadic_exactness(spark):
    """The truncated α=1/2 EWMA must be EXACT double arithmetic: a
    hand-computed dyadic sum equals the operator's output bit-for-bit,
    and flags fire on planted spikes/drops."""
    import datetime

    from sequin_spark.streaming.rollup import ewma_anomaly

    base = datetime.datetime(2024, 1, 1)
    rows = []
    counts = [8] * 20
    counts[15] = 100   # spike
    counts[18] = 1     # drop
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append(("api", base + datetime.timedelta(hours=h,
                                                          seconds=i)))
    df = spark.createDataFrame(rows, "series string, ts timestamp")
    out = {r["bucket"].hour + 24 * (r["bucket"].day - 1): r
           for r in ewma_anomaly(df, "series", horizon=12).collect()}
    # bucket 15: trailing 12 buckets are all 8 → ewma = 8 * (1 - 2^-12)
    want = sum(8 / (1 << k) for k in range(1, 13))
    assert out[15]["ewma_prior"] == want  # exact, not approx
    assert out[15]["status"] == "spike"
    assert out[18]["status"] == "drop"
    assert out[14]["status"] == "normal"
    # warm-up rows (fewer than 12 predecessors) are withheld
    assert min(out) == 12


def test_epoch_shuffle_permutes_per_epoch(spark, sf_dir):
    """Same shard placement every epoch; different within-shard order
    between epochs; each (epoch, shard) position sequence is 1..n."""
    from sequin_spark.queries_datapipe import q_corpus_epoch_shuffle

    rows = q_corpus_epoch_shuffle(spark, sf_dir).collect()
    by_epoch = {}
    shard_of = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = (
            r["shard"], r["position"])
        prev = shard_of.setdefault(r["doc_id"], r["shard"])
        assert prev == r["shard"], "shard placement moved between epochs"
    e0, e1 = by_epoch[0], by_epoch[1]
    assert set(e0) == set(e1)
    # the orders genuinely differ between epochs
    assert any(e0[d][1] != e1[d][1] for d in e0)
    # positions are a dense 1..n per (epoch, shard)
    from collections import defaultdict
    per_shard = defaultdict(list)
    for d, (s, p) in e0.items():
        per_shard[s].append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_dhash_pinned_value(spark):
    """The dHash kernel's strided-byte grid is deterministic: pin the
    hash of a known string against an independent pure-Python replay."""
    import numpy as np

    from sequin_spark.datapipe.multimodal import attach_media, dhash_media

    text = "the quick brown fox jumps over the lazy dog " * 7

    def ref_dhash(t: str) -> int:
        b = t.encode()
        n = len(b)
        stride = max(1, n // 72)
        idx = (np.arange(72, dtype=np.int64) * stride) % n
        grid = np.frombuffer(b, dtype=np.uint8)[idx].reshape(8, 9)
        bits = (grid[:, 1:].astype(int) > grid[:, :-1].astype(int))
        return sum(1 << i for i, v in enumerate(bits.reshape(-1)[:63]) if v)

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = dhash_media(attach_media(df, "text")).collect()[0]
    assert got.dhash == ref_dhash(text) == 2767843322059674548


def test_phash_banding_exact_recall(spark):
    """Pigeonhole guarantee: banded candidates find EVERY pair with
    hamming <= 6 — cross-check against a brute-force all-pairs scan."""
    import itertools

    from sequin_spark.datapipe.multimodal import phash_near_dup_pairs

    # hashes engineered around the threshold: 0, 1-bit, 6-bit, 7-bit,
    # and 63-bit flips from a base value
    base = 0x2A51_F00D_BEEF_1234 & ((1 << 63) - 1)
    flips = [0, 1 << 5, (1 << 5) | (1 << 20), 0x3F, 0x7F,
             (1 << 62) | (1 << 61), (1 << 63) - 1]
    hashes = [(i, base ^ f) for i, f in enumerate(flips)]
    df = spark.createDataFrame(hashes, "doc_id long, dhash long")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in phash_near_dup_pairs(df, max_hamming=6).collect()}
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(hashes, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 6:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want and len(want) >= 5


def test_phash_planted_near_dup_found(spark, docs):
    """A one-byte perturbation of equal length keeps the stride, so the
    perturbed copy pairs with its source at small hamming distance."""
    from pyspark.sql import functions as F

    from sequin_spark.datapipe.multimodal import (attach_media, dhash_media,
                                                  phash_near_dup_pairs)

    twisted = docs.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat(F.substring("text", 1, 5), F.lit("#"),
                 F.expr("substring(text, 7)")).alias("text"))
    media = attach_media(docs.unionByName(twisted), "text")
    pairs = phash_near_dup_pairs(dhash_media(media), max_hamming=6)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    for r in docs.select("doc_id").collect():
        assert (r.doc_id, r.doc_id + 100) in found


def test_chunk_windows_cover_every_token(spark):
    """Chunking invariants: stride-spaced starts, every token inside at
    least one window, 25% overlap between neighbours, content hash is
    the chunk's md5."""
    import hashlib

    from sequin_spark.queries_datapipe import q_corpus_chunk_windows

    # run the registry query on the real fixture dir at the tiny scale
    rows = q_corpus_chunk_windows(spark, "/root/testdata/sf0.001").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.chunk_idx)
        starts = [r.start_tok for r in doc_rows]
        assert starts == [i * 24 for i in range(len(starts))]
        # coverage: last window reaches the final token
        last = doc_rows[-1]
        n_tokens = last.start_tok + last.n_tok
        assert all(r.n_tok == 32 for r in doc_rows[:-1]) or n_tokens <= 32 * len(doc_rows)
        # neighbouring windows overlap by window - stride = 8 tokens
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert b.start_tok - a.start_tok == 24


def test_matryoshka_recall_monotone_in_dim(spark):
    """Recall@10 must be monotone non-decreasing in the truncation
    dimension (more dims → never worse retrieval on average here), and
    every recall sits in [0, 1]."""
    from sequin_spark.queries_datapipe import q_embed_matryoshka_recall

    rows = {r.dim: r.recall_at_10 for r in
            q_embed_matryoshka_recall(spark, "/root/testdata/sf0.001")
            .collect()}
    assert set(rows) == {8, 16, 32}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert rows[8] <= rows[16] <= rows[32]


def test_quality_keeper_prefers_original_over_degraded_copy(spark):
    """The ' the '->' thy ' re-crawl edit lowers the copy's stopword
    ratio, so in every original+copy cluster the ORIGINAL (lower id,
    higher quality) must be the keeper — and never by tie-break alone."""
    from sequin_spark.queries_datapipe import q_dedup_quality_keeper

    rows = q_dedup_quality_keeper(spark, "/root/testdata/sf0.001").collect()
    assert rows
    pair_clusters = [r for r in rows if r.n_members == 2
                     and r.cluster_id % 25 == 0 and r.cluster_id < 10000]
    assert pair_clusters  # original+copy clusters exist
    for r in pair_clusters:
        assert r.keeper_doc_id == r.cluster_id  # the original, not +10000


def test_decontaminate_semantic_finds_planted_leaks(spark):
    """Every scaled eval copy must be flagged at cosine exactly 1.0
    (positive scaling preserves both the LSH bucket and the cosine);
    no random corpus vector reaches the 0.9 threshold."""
    from sequin_spark.queries_datapipe import q_decontaminate_semantic

    rows = q_decontaminate_semantic(spark, "/root/testdata/sf0.001").collect()
    planted = {(r.corp_id, r.eval_id) for r in rows if r.corp_id >= 50000}
    assert planted == {(i + 50000, i) for i in range(20)}
    assert all(r.cos == 1.0 for r in rows if r.corp_id >= 50000)
    assert all(r.corp_id >= 50000 for r in rows)  # no false positives here


def test_readability_integer_replay(spark):
    """The Flesch score is an exact integer rational: replay it."""
    from sequin_spark.datapipe.text import readability

    text = "The cat sat on the mat. It was a very good cat! Was it?"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = readability(docs).collect()[0]
    s, w, y = r["n_sentences"], r["n_words"], r["n_syllables"]
    num = max(0, 206835 * s * w - 1015 * w * w - 84600 * y * s)
    den = 1000 * s * w
    hh = (200 * num + den) // (2 * den)
    assert r["flesch"] == hh / 100.0
    assert r["band"] == ("easy" if hh >= 6000 else
                         "medium" if hh >= 3000 else "hard")
    assert s == 3  # three [.!?] runs


def test_char_entropy_bounds(spark):
    """Uniform chars maximize entropy (ln 4 for 4 symbols); a single
    repeated char is zero; mixed text sits between."""
    import math

    from sequin_spark.datapipe.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abcdabcd"), (3, "aabb ccdd aabb")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0
    assert out[2]["entropy"] == round(math.log(4), 4)
    assert out[1]["n_distinct_chars"] == 1
    # spaces excluded from the distribution
    assert out[3]["n_chars"] == 12
    assert 0.0 < out[3]["entropy"] <= round(math.log(4), 4)


def test_span_corruption_layout_invariants(spark):
    """Spans are disjoint, sentinel ids are dense in start order, and
    the selected-token fraction lands near the configured rate."""
    from sequin_spark.datapipe.curation import span_corruption

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(200))) for i in range(20)],
        ["doc_id", "text"])
    spans = span_corruption(docs, rate_pct=15).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    total_masked = 0
    for d, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r["span_start"])
        assert [r["mask_id"] for r in rs] == list(range(len(rs)))
        for a, b in zip(rs, rs[1:]):
            # disjoint AND non-adjacent (adjacent picks coalesce)
            assert a["span_start"] + a["span_len"] < b["span_start"]
        total_masked += sum(r["span_len"] for r in rs)
    frac = total_masked / (20 * 200)
    assert 0.10 < frac < 0.20  # hash-binomial around 0.15
    # determinism: identical rerun
    again = span_corruption(docs, rate_pct=15).collect()
    assert sorted(map(tuple, spans)) == sorted(map(tuple, again))


def test_span_corruption_matches_python_replay(spark):
    """The mask is a pure keyed-PRF function of (doc, position):
    replay the selection + islands coalescing in Python exactly."""
    import hashlib
    import re

    from sequin_spark.datapipe.curation import span_corruption

    docs = {7: "the quick brown fox jumps over the lazy dog again and again",
            9: "  spaced   out   tokens  here  "}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = sorted(map(tuple, span_corruption(df, rate_pct=30).collect()))

    expected = []
    for d, text in docs.items():
        norm = re.sub(r"\s+", " ", text.lower())
        toks = norm.split(" ")
        picked = []
        for pos, tok in enumerate(toks):
            if tok == "":
                continue
            h = int(hashlib.md5(f"{d}|{pos}|sc1".encode())
                    .hexdigest()[:15], 16)
            if h % 100 < 30:
                picked.append(pos)
        spans, start, prev = [], None, None
        for p in picked:
            if start is None:
                start, prev = p, p
            elif p == prev + 1:
                prev = p
            else:
                spans.append((start, prev - start + 1))
                start, prev = p, p
        if start is not None:
            spans.append((start, prev - start + 1))
        for mid, (s, ln) in enumerate(sorted(spans)):
            expected.append((d, mid, s, ln))
    assert got == sorted(expected)


def test_global_row_number_matches_sorted_order(spark):
    """curation.global_row_number (the range-partitioned two-pass
    zipWithIndex, r9 verdict task #1) must reproduce the exact global
    row_number over a total order — including duplicate sort keys
    resolved by the tiebreak column — while never planning a
    single-partition window."""
    import random

    from sequin_spark.datapipe.curation import global_row_number

    rng = random.Random(7)
    rows = [(i, rng.randrange(50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["rk"]
           for r in global_row_number(df, ["v", "id"], "rk").collect()}
    want = {id_: i + 1
            for i, (id_, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))}
    assert got == want


def test_global_row_number_plan_has_no_single_partition_window(spark):
    import contextlib
    import io
    import re

    from sequin_spark.datapipe.curation import global_row_number

    df = spark.range(1000).withColumn("v", F.pmod(F.col("id") * 37, F.lit(97)))
    out = global_row_number(df, ["v", "id"], "rk")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
    # the within-partition window must be keyed on the shuffle pid
    assert re.search(r"Window.*_pid", plan), plan


def test_prefix_max_exclusive_matches_serial_scan(spark):
    """curation.prefix_max_exclusive must equal the serial exclusive
    running max (the watermark recurrence), with NULL for the globally
    first row, across partition boundaries."""
    import random

    from sequin_spark.datapipe.curation import prefix_max_exclusive

    rng = random.Random(13)
    rows = [(i, rng.randrange(10**6)) for i in range(3000)]
    df = spark.createDataFrame(rows, "seq long, ts long")
    got = {r["seq"]: r["pm"]
           for r in prefix_max_exclusive(df, "seq", "ts", "pm").collect()}
    acc, want = None, {}
    for seq, ts in sorted(rows):
        want[seq] = acc
        acc = ts if acc is None else max(acc, ts)
    assert got == want


def test_kmeans_clusters_matches_numpy_lloyd(spark):
    """Integer fixed-point Lloyd vs an independent numpy replay —
    quantize, smallest-id seeding, lowest-index tiebreak, floor-mean
    update, and the final-assignment semantics must all agree."""
    import math

    import numpy as np

    from sequin_spark.datapipe.similarity import kmeans_clusters

    rng = np.random.default_rng(7)
    k, iters, dim, n = 3, 2, 4, 40
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_clusters(df, k=k, iters=iters).collect()}

    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    cents = [q[j].copy() for j in range(k)]

    def assign():
        d = np.stack([((q - c) ** 2).sum(axis=1) for c in cents])
        return d.argmin(axis=0), d.min(axis=0)  # argmin → lowest index

    for _ in range(iters):
        cl, _ = assign()
        for j in range(k):
            m = q[cl == j]
            if len(m):
                cents[j] = np.array([
                    math.floor(s / len(m)) for s in m.sum(axis=0)])
    cl, d2 = assign()
    want = {i: (int(cl[i]), int(d2[i])) for i in range(n)}
    assert got == want


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """Two identical seed vectors: the duplicate's cluster goes empty
    on update (ties go to the lower index) but its centroid must
    survive, and every row must still get a cluster in range."""
    from sequin_spark.datapipe.similarity import kmeans_clusters

    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [10.0, 10.0]),
            (3, [10.1, 10.0]), (4, [0.2, 0.1])]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    out = kmeans_clusters(df, k=3, iters=2).collect()
    assert len(out) == 5
    assert all(0 <= r["cluster"] < 3 for r in out)
    # during iterations the 0-index tiebreak empties cluster 1, so its
    # centroid (0,0) must SURVIVE the update — in the final assignment
    # it wins its duplicate back at distance exactly 0 (had the empty
    # cluster's centroid been zeroed out or dropped, vec 1 would land
    # elsewhere or the argmin would see < k centroids)
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[1]["cluster"] == 1 and by_id[1]["dist2"] == 0


def test_ann_index_append_vs_rebuild_recall(spark, sf_dir, tmp_path):
    """r11 verdict task #9: appending new vectors to a FROZEN quantizer
    must serve searches with recall comparable to a full rebuild over
    the grown corpus — and the drift audit must (a) stay quiet for
    in-distribution appends, (b) flag out-of-distribution ones."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.similarity import (
        ann_ivf_det_topk,
        append_to_index,
        brute_force_topk,
        build_semdedup_index,
        index_drift_audit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)      # 80%: the fitted corpus
    newv = emb.filter(F.col("vec_id") % 5 == 0)      # 20%: in-dist appends
    idx = build_semdedup_index(base, k=8, iters=1)

    appended = append_to_index(idx, newv)
    rebuilt = build_semdedup_index(emb, k=8, iters=1)
    # the appended index covers the whole corpus
    assert appended.assignments.count() == emb.count()

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id)
             for r in brute_force_topk(emb, queries, k=3).collect()}

    def recall(index):
        got = {(r.q_id, r.n_id)
               for r in ann_ivf_det_topk(emb, queries, k=3, n_probe=4,
                                         index=index).collect()}
        return len(exact & got) / len(exact)

    r_app, r_reb = recall(appended), recall(rebuilt)
    # same-distribution appends: the frozen quantizer serves within a
    # modest margin of the rebuilt one (both probe half the lists)
    assert r_app >= r_reb - 0.15, (r_app, r_reb)
    assert r_app >= 0.4

    # drift audit: in-distribution appends mostly unflagged...
    quiet = index_drift_audit(idx, base, newv).collect()
    flagged_quiet = sum(1 for r in quiet if r.refit_flagged)
    assert flagged_quiet <= len(quiet) // 2, quiet
    # ...a genuinely shifted distribution (3x-scaled vectors: squared
    # assignment distance grows ~9x) trips the flag
    shifted = newv.select(
        "vec_id",
        F.expr("transform(embedding, x -> x * float(3.0))").alias("embedding"))
    loud = index_drift_audit(idx, base, shifted).collect()
    assert sum(1 for r in loud if r.refit_flagged) >= flagged_quiet
    assert any(r.refit_flagged for r in loud)
