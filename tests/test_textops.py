"""Training-data ops: DataFrame builders vs their SQL twins + structural
invariants for the hash-based ops (which have no DuckDB oracle)."""
import pyspark.sql.functions as F
import pytest

from newsspark import textops
from newsspark.contract_sql import SPARK_SQL

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _views(spark):
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")


def _pdf_sorted(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].astype(str).sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize(
    "builder,sql_name",
    [
        (lambda s, docs, emb: textops.dedup_exact(docs), "dedup_exact"),
        (lambda s, docs, emb: textops.token_count(docs), "token_count"),
        (lambda s, docs, emb: textops.jaccard_adjacent(docs), "jaccard_adjacent"),
        (lambda s, docs, emb: textops.doc_fingerprint(docs), "doc_fingerprint"),
        (lambda s, docs, emb: textops.ann_bruteforce_topk(emb), "ann_bruteforce_topk"),
    ],
)
def test_builder_equals_sql_twin(spark, docs, emb, builder, sql_name):
    _views(spark)
    a = _pdf_sorted(builder(spark, docs, emb))
    b = _pdf_sorted(spark.sql(SPARK_SQL[sql_name]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()


def test_minhash_lsh_finds_planted_duplicates(spark):
    rows = []
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango ") * 3
    for i in range(20):
        rows.append((i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(40))))
    rows.append((100, base))
    rows.append((101, base))                              # exact dup
    rows.append((102, base.replace("kilo", "variant", 1)))  # near dup (1 token)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in textops.dedup_minhash_lsh(df).collect()}
    assert (100, 101) in pairs
    assert (100, 102) in pairs or (101, 102) in pairs
    # unrelated docs never collide on all-band keys
    assert all(a >= 100 and b >= 100 for a, b in pairs)


def test_md5_hash_variant_matches_production_xxhash_pairs(spark, docs):
    """The driver's oracle-checked entries run hash_fn="md5_60"; the library
    default is xxhash64. Both must find the SAME verified duplicate pairs
    (hash choice only perturbs chance band collisions, which Jaccard
    verification removes), and the raw LSH candidate sets must each recall
    every verified pair."""
    d = docs.limit(300)
    ver_xx = {(r["doc_a"], r["doc_b"])
              for r in textops.dedup_pipeline(d, hash_fn="xxhash64").collect()}
    ver_md5 = {(r["doc_a"], r["doc_b"])
               for r in textops.dedup_pipeline(d, hash_fn="md5_60").collect()}
    assert ver_xx == ver_md5
    assert len(ver_xx) > 0  # the fixture corpus plants near-dups
    cand_xx = {(r["doc_a"], r["doc_b"])
               for r in textops.dedup_minhash_lsh(d, hash_fn="xxhash64").collect()}
    cand_md5 = {(r["doc_a"], r["doc_b"])
                for r in textops.dedup_minhash_lsh(d, hash_fn="md5_60").collect()}
    assert ver_xx <= cand_xx and ver_xx <= cand_md5


def test_simhash_md5_variant_is_60_bit_and_discriminative(spark):
    base = " ".join(f"word{j}" for j in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("word7", "changed")),
         (3, " ".join(f"other{j}" for j in range(60)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["simhash"]
           for r in textops.simhash64(df, hash_fn="md5_60").collect()}
    assert all(0 <= v < (1 << 60) for v in got.values())

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(got[1], got[2]) <= 12
    assert hamming(got[1], got[3]) > 12


def test_simhash_near_duplicates_have_small_hamming(spark):
    base = " ".join(f"word{j}" for j in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("word7", "changed")),
         (3, " ".join(f"other{j}" for j in range(60)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in textops.simhash64(df).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[1], got[2]) <= 12
    assert hamming(got[1], got[3]) > 12


def test_ann_bruteforce_self_consistency(spark, emb):
    out = textops.ann_bruteforce_topk(emb, n_queries=5, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(5))
    for q, rows in by_q.items():
        sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_ann_lsh_neighbors_subset_of_bucket_and_ranked(spark, emb):
    out = textops.ann_lsh_topk(emb, n_queries=10, k=5).collect()
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 5
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_ann_lsh_recall_against_bruteforce(spark, emb):
    brute = textops.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    lsh = textops.ann_lsh_topk(emb, n_queries=10, k=5, n_planes=4).collect()
    brute_top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rank"] == 1}
    lsh_by_q = {}
    for r in lsh:
        lsh_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1 for q, n in brute_top1.items() if n in lsh_by_q.get(q, set())
    )
    # 4 hyperplanes -> 16 buckets over 500 vectors: top-1 recall is imperfect
    # by design but must be well above chance
    assert hits >= 3, (hits, brute_top1, {k: sorted(v) for k, v in lsh_by_q.items()})


def test_ann_ivf_recall_against_bruteforce(spark, emb):
    brute = textops.ann_bruteforce_topk(emb, n_queries=10, k=5).collect()
    ivf = textops.ann_ivf_topk(emb, n_queries=10, k=5).collect()
    brute_top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rank"] == 1}
    ivf_by_q = {}
    for r in ivf:
        ivf_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing 4/16 cells must recover most true top-1 neighbors
    hits = sum(1 for q, n in brute_top1.items() if n in ivf_by_q.get(q, set()))
    assert hits >= 5, (hits, brute_top1)
    for r in ivf:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 5
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_ann_ivf_partitions_corpus(spark, emb):
    """Every query scans only its probed cells: the candidate set per query
    must be a strict subset of the corpus (the IVF win)."""
    out = textops.ann_ivf_topk(emb, n_queries=3, k=1000, n_probe=1).collect()
    n = emb.count()
    per_q = {}
    for r in out:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q and all(c < n * 0.5 for c in per_q.values()), per_q


def test_ann_uses_broadcast_join(spark, emb):
    plan = textops.ann_bruteforce_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan


def test_lang_id_and_quality_shapes(spark, docs):
    li = textops.lang_id(docs).limit(20).collect()
    assert all(r["lang_pred"] in ("ko", "en", "es", "de", "und") for r in li)
    qs = textops.quality_score(docs).limit(20).collect()
    assert all(r["n_tokens"] > 0 for r in qs)


def test_embedding_cosine_dedup_exact_and_lsh_subset(spark, emb):
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in textops.dedup_embedding_cosine(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in textops.dedup_embedding_cosine(
            emb, threshold=0.4, use_lsh=True
        ).collect()
    }
    assert exact, "threshold 0.4 should yield some pairs on sf0.001"
    assert lsh <= exact  # LSH candidates never invent pairs
    # cos≈0.4 pairs sit at ~66 degrees — hyperplane collision probability is
    # intentionally low there; only sanity-check it's non-zero
    assert len(lsh) >= len(exact) // 10


def test_embedding_cosine_lsh_finds_true_near_duplicates(spark, emb):
    # plant a near-identical pair (cos ~0.9997) — the actual near-dup regime
    # LSH is built for; it MUST surface it
    base = [r for r in emb.where("vec_id = 0").collect()][0]["embedding"]
    near = [v + (0.01 if i % 7 == 0 else 0.0) for i, v in enumerate(base)]
    planted = spark.createDataFrame(
        [(9000, base), (9001, near)], "vec_id long, embedding array<float>"
    )
    all_vecs = emb.select("vec_id", "embedding").unionByName(planted)
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in textops.dedup_embedding_cosine(
            all_vecs, threshold=0.99, use_lsh=True
        ).collect()
    }
    assert (9000, 9001) in lsh
    assert (0, 9000) in lsh and (0, 9001) in lsh


def test_dedup_pipeline_verifies_candidates(spark):
    # 60 DISTINCT tokens so truncation genuinely halves the token set
    words = [f"w{j:03d}" for j in range(60)]
    base = " ".join(words)
    rows = [(i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(40)))
            for i in range(20)]
    rows += [(100, base), (101, base),
             (102, base.replace("w030", "variant", 1)),
             (103, " ".join(words[:30]))]  # half-overlap: candidate but low jaccard
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in textops.dedup_pipeline(df, jaccard_threshold=0.8).collect()}
    assert out[(100, 101)] == 1.0
    assert (100, 102) in out and out[(100, 102)] >= 0.8
    assert all(a >= 100 for a, _ in out)
    # the half-doc may collide in LSH but must be filtered by the verify stage
    assert (100, 103) not in out and (101, 103) not in out


def test_ivf_plan_is_constant_size_in_k(spark, emb):
    """The r1 IVF embedded the centroid model as a plan literal — O(K x dim)
    literals, a plan-size killer at real IVF scale (K ~= sqrt(n)).  The
    vectorized rewrite must keep the plan O(1) in K: same plan text size at
    K=4 and K=64, assignment via ArrowEvalPython, probe join broadcast."""
    model_small = textops.ivf_train(emb, n_centroids=4, lloyd_iters=1)
    model_big = textops.ivf_train(emb, n_centroids=64, lloyd_iters=1)
    plans = {}
    for name, m in (("small", model_small), ("big", model_big)):
        df = textops.ann_ivf_topk(emb, n_queries=3, k=2, model=m)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plans["big"]
    assert "Broadcast" in plans["big"]
    # K=64 has 16x the centroids of K=4; the plan must not grow with it
    # (allow slack for unrelated formatting noise)
    assert len(plans["big"]) < len(plans["small"]) * 1.05, (
        len(plans["small"]), len(plans["big"])
    )


def test_ivf_pretrained_model_reuse_matches_inline_training(spark, emb):
    model = textops.ivf_train(emb, n_centroids=16, lloyd_iters=2)
    reused = textops.ann_ivf_topk(emb, n_queries=5, k=3, model=model).collect()
    inline = textops.ann_ivf_topk(emb, n_queries=5, k=3).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"]) for r in rows
    )
    assert key(reused) == key(inline)


def test_ivf_prebuilt_index_matches_inline(spark, emb):
    """The FAISS decomposition: search over a persisted ivf_index must equal
    the inline path exactly."""
    model = textops.ivf_train(emb, n_centroids=16, lloyd_iters=2)
    idx = textops.ivf_index(emb, model).persist()
    try:
        idx.count()
        via_index = textops.ann_ivf_topk(
            emb, n_queries=5, k=3, model=model, index=idx
        ).collect()
        inline = textops.ann_ivf_topk(emb, n_queries=5, k=3).collect()
        key = lambda rows: sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in rows
        )
        assert key(via_index) == key(inline)
    finally:
        idx.unpersist()


def test_dedup_components_transitive_chain(spark):
    """a~b and b~c verified but a~c below threshold: components must still
    merge all three (transitive closure), keeping the min doc_id."""
    # one token changed per hop (positions far apart): token jaccard
    # a~b = b~c = 39/41 ~= 0.951, a~c = 38/42 ~= 0.905 — a 0.93 threshold
    # keeps the hops and drops the direct a~c edge; 8 narrow bands give the
    # ~0.85-shingle-sim hops near-certain LSH recall
    base = [f"tok{j}" for j in range(40)]
    b = base.copy()
    b[10] = "chgx"
    c = b.copy()
    c[30] = "chgy"
    texts = [(10, " ".join(base)), (11, " ".join(b)), (12, " ".join(c))] + [
        (i, " ".join(f"u{i}_{j}" for j in range(40))) for i in range(5)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = textops.dedup_pipeline(df, jaccard_threshold=0.93, bands=8)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (10, 11) in got and (11, 12) in got
    assert (10, 12) not in got  # below threshold directly
    comp = {r["doc_id"]: (r["component_id"], r["keep"])
            for r in textops.dedup_components(pairs).collect()}
    assert comp[10] == (10, True)
    assert comp[11] == (10, False)
    assert comp[12] == (10, False)  # transitivity
    assert set(comp) == {10, 11, 12}


def test_dedup_components_partition_invariant(spark, docs):
    """Iterative CC must be deterministic regardless of input partitioning
    (min-aggregation is order-insensitive; labels converge to the same
    fixpoint)."""
    d = docs.limit(200)
    def run(df):
        rows = textops.dedup_components(
            textops.dedup_pipeline(df, hash_fn="md5_60")
        ).collect()
        return sorted((r["doc_id"], r["component_id"], r["keep"]) for r in rows)
    ref = run(d)
    assert ref  # fixture corpus plants duplicates
    assert run(d.repartition(1)) == ref
    assert run(d.repartition(7)) == ref


def test_lsh_exact_prepass_bounds_identical_mega_cluster(spark):
    """The 100TB scale-killer guard (VERDICT r2 #1): a cluster of B
    IDENTICAL documents must produce O(B) star edges, never O(B²) clique
    pairs, and dedup_components must still merge the whole cluster."""
    b = 500
    base = " ".join(f"tok{j}" for j in range(40))
    rows = [(i, base) for i in range(b)]
    rows += [(1000 + i, f"doc {i} " + " ".join(f"u{i}_{j}" for j in range(40)))
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs_df, oversized = textops.minhash_lsh_candidates(df)
    pairs = {(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()}
    # star form: exactly B-1 edges (rep=0 -> members), not B*(B-1)/2
    assert pairs == {(0, i) for i in range(1, b)}
    assert oversized.count() == 0  # collapsed before banding: no mega bucket
    # the verified pipeline keeps all star edges at jaccard exactly 1.0
    ver = textops.dedup_pipeline(df)
    comp = {r["doc_id"]: (r["component_id"], r["keep"])
            for r in textops.dedup_components(ver).collect()}
    assert set(comp) == set(range(b))
    assert all(c == 0 for c, _ in comp.values())
    assert comp[0] == (0, True) and not any(
        keep for d, (_, keep) in comp.items() if d != 0
    )


def test_lsh_max_bucket_sidelines_oversized_buckets(spark):
    """With the exact pre-pass disabled, an identical cluster forms one
    oversized bucket per band; max_bucket must sideline it (quarantine rows,
    zero pairs) instead of exploding B²/2 pair structs in one task."""
    b = 120
    base = " ".join(f"tok{j}" for j in range(40))
    rows = [(i, base) for i in range(b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs_df, oversized = textops.minhash_lsh_candidates(
        df, pre_dedup_exact=False, max_bucket=100
    )
    assert pairs_df.count() == 0
    quarantined = oversized.collect()
    assert len(quarantined) == 4  # one per band (identical docs share all 4)
    assert all(r["n_ids"] == b for r in quarantined)
    # raising the cap re-admits the bucket: unguarded clique semantics
    full, none_over = textops.minhash_lsh_candidates(
        df, pre_dedup_exact=False, max_bucket=None
    )
    assert full.count() == b * (b - 1) // 2
    assert none_over.count() == 0


def test_lsh_guards_are_noop_on_standard_corpus(spark, docs):
    """The guards must not change the candidate pair set on a corpus with no
    exact duplicates and no oversized buckets — pins the driver oracle:
    DUCK_SQL['dedup_minhash_lsh'] replays the UNguarded semantics."""
    d = docs.limit(300)
    guarded = {(r["doc_a"], r["doc_b"])
               for r in textops.dedup_minhash_lsh(d, hash_fn="md5_60").collect()}
    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in textops.dedup_minhash_lsh(
            d, hash_fn="md5_60", pre_dedup_exact=False, max_bucket=None
        ).collect()
    }
    assert guarded == unguarded and len(guarded) > 0


def test_ivf_fixed_variant_matches_production_path_on_same_centroids(spark, emb):
    """ann_ivf_topk_fixed (oracle twin: HOF sequential-fold scoring) must
    return exactly what the production numpy-matmul path returns when fed
    the same fixed centroid model — pins the two implementations to one
    semantics, and pins a sane recall floor vs oracled brute force."""
    import numpy as np

    cents = np.array(
        [[textops.ivf_fixed_centroid_component(c, j) for j in range(64)]
         for c in range(16)]
    )
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"]) for r in rows
    )
    fixed = key(textops.ann_ivf_topk_fixed(emb).collect())
    prod = key(textops.ann_ivf_topk(emb, model=cents).collect())
    assert fixed == prod
    bf = {(r["query_id"], r["neighbor_id"])
          for r in textops.ann_bruteforce_topk(emb).collect()}
    fx = {(q, n) for q, _, n, _ in fixed}
    assert len(bf & fx) / len(bf) >= 0.4  # 4/16 probes, untrained quantizer


def test_host_stats_salted_hot_host_corpus_and_plan_shape(spark):
    """Skew pattern (VERDICT r2 #7): a planted 90%-one-host corpus through
    the explicit salt -> partial -> final two-phase must (a) equal the naive
    single-phase aggregation exactly and (b) show the salted plan shape —
    shuffle 1 keyed by (host, salt) so the hot host spreads over n_salts
    reducers, shuffle 2 keyed by host carrying only partial rows."""
    rows = [(i, "hot.example.com" if i % 10 else f"cold{i % 7}.org",
             100 + i % 50) for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id long, host string, n_chars long")
    salted = textops.host_stats_salted(df, n_salts=16)
    naive = (
        df.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("host")
    )
    assert salted.collect() == naive.collect()
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(host" in plan
    assert "_salt" in plan  # the widened first-shuffle key


def test_dedup_lines_planted_boilerplate(spark):
    """Lines above the frequency threshold vanish from every doc, unique and
    below-threshold lines survive in original order, and an all-boilerplate
    doc still yields a (empty-text) row — the op is total."""
    boiler = "Subscribe to our newsletter."
    shared2 = "shared by exactly two docs"
    rows = [
        (0, f"unique zero\n{boiler}\nzero tail"),
        (1, f"{boiler}\nunique one\n{shared2}"),
        (2, f"{shared2}\n{boiler}"),
        (3, f"unique three\n{boiler}"),
        (4, f"{boiler}\nunique four"),
        (5, boiler),  # nothing but boilerplate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.dedup_lines(docs, max_frac=0.5).toPandas()
    got = dict(zip(out["doc_id"], out["text_kept"]))
    # boiler in 6/6 docs (> 0.5) removed; shared2 in 2/6 (<= 0.5) kept
    assert got[0] == "unique zero\nzero tail"          # order preserved
    assert got[1] == f"unique one\n{shared2}"
    assert got[2] == shared2
    assert got[5] == ""                                 # total, not dropped
    assert len(out) == 6
    n = dict(zip(out["doc_id"], zip(out["n_kept"], out["n_removed"])))
    assert n[0] == (2, 1) and n[5] == (0, 1) and n[2] == (1, 1)


def test_dedup_lines_builder_equals_sql_twin(spark):
    """The DataFrame builder over the synthesized lined input must equal the
    oracle-checked SQL twin row for row."""
    from newsspark.contract_sql import _LINED_SPARK

    _views(spark)
    lined = spark.sql(
        f"SELECT doc_id, {_LINED_SPARK} AS text FROM documents"
    )
    a = _pdf_sorted(textops.dedup_lines(lined, max_frac=0.1))
    b = _pdf_sorted(spark.sql(SPARK_SQL["dedup_lines"]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()


def test_unigram_logprob_buckets_semantics(spark):
    """Tercile cut is by mean token log-prob: rare-token-heavy docs land in
    lower buckets than common-token docs, buckets partition the corpus into
    near-equal thirds, and avg_logprob is strictly negative."""
    _views(spark)
    out = spark.sql(SPARK_SQL["unigram_logprob_buckets"]).toPandas()
    assert len(out) == 500
    sizes = out["bucket"].value_counts().to_dict()
    assert set(sizes) == {1, 2, 3} and max(sizes.values()) - min(sizes.values()) <= 1
    assert (out["avg_logprob"] < 0).all()
    # bucket order tracks the score: every bucket-1 doc scores <= every
    # bucket-3 doc (ntile over the rounded mean, doc_id tiebreak)
    assert out[out.bucket == 1]["avg_logprob"].max() <= \
        out[out.bucket == 3]["avg_logprob"].min()


def test_incremental_new_docs_drops_exact_recrawls(spark):
    """Every 3rd batch doc re-arrives byte-identical and must be dropped by
    the snapshot anti-join; revised docs pass with a new content hash."""
    _views(spark)
    out = spark.sql(SPARK_SQL["incremental_new_docs"]).toPandas()
    ids = set(out["doc_id"] - 1000000)
    assert ids == {i for i in range(500) if i % 3 != 0}
    corpus_hashes = set(
        r["h"] for r in spark.sql("SELECT md5(text) h FROM documents").collect()
    )
    assert not (set(out["content_hash"]) & corpus_hashes)


def test_compression_ratio_semantics(spark):
    """Repetitive text compresses far below unique-ish text; empty text
    yields a NULL ratio row (total); live output matches the frozen fixture
    byte-for-byte on the golden corpus."""
    import json

    rows = [
        (0, "spam spam spam " * 50),
        (1, "the quick brown fox jumps over the lazy dog once only"),
        (2, ""),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.compression_ratio(docs).collect()}
    assert out[0]["ratio"] < 0.1 < out[1]["ratio"]
    assert out[2]["ratio"] is None and out[2]["n_chars"] == 0
    assert out[3]["ratio"] is None  # null text -> treated as empty, total

    golden = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    live = {r["doc_id"]: (r["n_chars"], r["comp_len"])
            for r in textops.compression_ratio(golden).collect()}
    with open("tests/fixtures/golden/compression.jsonl") as f:
        frozen = {d["doc_id"]: (d["n_chars"], d["comp_len"])
                  for d in map(json.loads, f)}
    assert live == frozen


def test_stratified_sample_exact_quotas(spark):
    """Every language stratum contributes EXACTLY ceil(n_lang/10) docs —
    quota-exact where Bernoulli sampling only hits the rate in
    expectation — and re-running yields the identical sample (no RNG)."""
    _views(spark)
    a = spark.sql(SPARK_SQL["stratified_sample"]).toPandas()
    b = spark.sql(SPARK_SQL["stratified_sample"]).toPandas()
    assert a.values.tolist() == b.values.tolist()
    per_lang = a.groupby("lang").agg(n=("doc_id", "size"),
                                     n_lang=("n_lang", "max"))
    for _, row in per_lang.iterrows():
        assert row["n"] == -(-row["n_lang"] // 10)


def test_corpus_length_profile_matches_numpy(spark):
    """The rank-arithmetic percentiles equal the lower-median / ceil-rank
    discrete percentiles computed directly."""
    import math

    _views(spark)
    out = {r["lang"]: r
           for r in spark.sql(SPARK_SQL["corpus_length_profile"]).collect()}
    docs = spark.sql(
        "SELECT lang, size(split(trim(lower(text)), '\\s+')) AS n FROM documents"
    ).toPandas()
    for lang, grp in docs.groupby("lang"):
        xs = sorted(grp["n"])
        n = len(xs)
        assert out[lang]["n_docs"] == n
        assert out[lang]["p50_tokens"] == xs[(n + 1) // 2 - 1]  # lower median
        assert out[lang]["p90_tokens"] == xs[math.ceil(0.9 * n) - 1]
        assert out[lang]["min_tokens"] == xs[0]
        assert out[lang]["max_tokens"] == xs[-1]


def test_bm25_topk_matches_reference_impl(spark):
    """The SQL BM25 over a planted corpus equals a direct Python Okapi
    implementation (k1=1.2, b=0.75, same +1 idf smoothing), including the
    tie-broken top-k order."""
    import math

    rows = [
        (0, "spark spark spark window merge"),
        (1, "spark window"),
        (2, "merge merge merge merge"),
        (3, "nothing relevant here"),
        (4, "window window spark merge merge"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    out = spark.sql(SPARK_SQL["bm25_topk"]).collect()

    docs = {d: t.split() for d, t in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = ("spark", "window", "merge")
    df = {q: sum(1 for t in docs.values() if q in t) for q in terms}

    def bm25(doc_id):
        toks = docs[doc_id]
        dl = len(toks)
        s = 0.0
        for q in terms:
            tf = toks.count(q)
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return round(s, 6)

    expected = sorted(
        ((d, bm25(d)) for d in docs if any(q in docs[d] for q in terms)),
        key=lambda x: (-x[1], x[0]),
    )
    assert [(r["doc_id"], r["bm25"]) for r in out] == expected
    assert all(r["doc_id"] != 3 for r in out)  # no-hit doc excluded


def test_stratified_sample_scalable_equals_window_twin(spark):
    """The two-pass distributed-selection sampler must return EXACTLY the
    window-ranked SQL twin's rows (same hashes selected, same ranks) — and
    its plan must never sort a whole stratum of docs (the row_number over
    the full stratum exists only in the tiny boundary bucket and the
    already-selected quota rows)."""
    _views(spark)
    a = _pdf_sorted(textops.stratified_sample(
        spark.read.parquet(f"{SF}/documents.parquet")))
    b = _pdf_sorted(spark.sql(SPARK_SQL["stratified_sample"]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()
    # plan shape (VERDICT r3 #1): the ONLY doc-sided row_number window is
    # partitioned by (stratum, bucket) — sample_rank is recomposed from the
    # bucket histogram, so no window partition ever exceeds one hash-prefix
    # bucket even on a 90%-one-stratum corpus.
    plan = textops.stratified_sample(
        spark.read.parquet(f"{SF}/documents.parquet")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number()") == 1, plan
    import re
    rn_parts = re.search(
        r"row_number\(\) windowspecdefinition\((\w+)#\d+, (\w+)#\d+L?,", plan)
    assert rn_parts and rn_parts.groups() == ("lang", "bkt"), plan


def test_stratified_sample_scalable_skewed_stratum(spark):
    """A 90%-one-stratum corpus still yields exact per-stratum quotas, and
    the boundary window touches only one hash bucket of the hot stratum."""
    rows = [(i, f"text body number {i} {'x' * (i % 7)}",
             "en" if i % 10 != 0 else f"l{i % 3}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textops.stratified_sample(docs).toPandas()
    sizes = out.groupby("lang")["doc_id"].size().to_dict()
    truth = docs.groupBy("lang").count().collect()
    for r in truth:
        assert sizes.get(r["lang"], 0) == -(-r["count"] // 10)
    # ranks are 1..quota per stratum, no gaps
    for lang, grp in out.groupby("lang"):
        assert sorted(grp["sample_rank"]) == list(range(1, len(grp) + 1))


def test_dedup_lines_exact_fraction_boundary(spark):
    """63/90 docs == exactly 0.7: 'more than max_frac' is false, so the
    line must be KEPT.  Float arithmetic said 0.7*90 == 62.999... and
    removed it — the threshold is integer-rational now (found in review)."""
    shared = "exactly at the 70 percent boundary"
    rows = [(i, f"unique line {i}\n{shared}" if i < 63 else f"unique line {i}")
            for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.dedup_lines(docs, max_frac=0.7).toPandas()
    kept0 = out[out.doc_id == 0]["text_kept"].iloc[0]
    assert shared in kept0  # 63*10 <= 90*7 -> kept, no float flip
    assert (out["n_removed"] == 0).all()


def test_intradoc_line_dedup_planted(spark):
    """First occurrence of each repeated line survives in position order;
    the synthesized corpus plants slice-A twice in every doc and slice-B
    twice in even docs."""
    _views(spark)
    out = spark.sql(SPARK_SQL["intradoc_line_dedup"]).toPandas()
    assert len(out) == 500
    evens, odds = out[out.doc_id % 2 == 0], out[out.doc_id % 2 == 1]
    assert (evens["n_removed"] == 2).all()   # A dup + B dup
    assert (odds["n_removed"] == 1).all()    # A dup only
    first = out[out.doc_id == 0].iloc[0]
    lines = first["text_kept"].split("\n")
    assert len(lines) == len(set(lines))     # no intra-doc repeats survive
    assert lines[-1] == "tail 0"             # order preserved


def test_dedup_lines_small_fraction_exact(spark):
    """max_frac converts through its decimal string with NO denominator
    cap (limit_denominator snapped 1e-5 to 0, turning the op into
    delete-everything).  Pin the conversion exactness at the 1/8 boundary:
    a line in exactly 1 of 8 docs sits AT max_frac=0.125 and must be kept;
    2 of 8 exceeds it and must go.  Invalid fractions raise."""
    from fractions import Fraction

    # the conversion itself: tiny fractions stay exact, never 0
    assert Fraction(str(1e-5)) == Fraction(1, 100000)

    shared2 = "in exactly two docs"
    docs = spark.createDataFrame(
        [(i, f"unique {i}\n{shared2}" if i < 2 else f"unique {i}")
         for i in range(8)],
        "doc_id long, text string",
    )
    out = textops.dedup_lines(docs, max_frac=0.125).toPandas()
    n = dict(zip(out["doc_id"], zip(out["n_kept"], out["n_removed"])))
    assert n[0] == (1, 1) and n[1] == (1, 1)  # shared2 (2/8 > 1/8) removed
    assert n[5] == (1, 0)                      # unique (1/8 == 1/8) kept
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.dedup_lines(docs, max_frac=0.0)


def test_dedup_lines_null_text_and_regex_sep(spark):
    """ADVICE r3: (a) NULL text must yield one output row (coalesced to
    ''), not silently vanish from the per-doc output; (b) a regex-special
    separator like '.' must split on the CHARACTER, not on every position
    (F.split takes a Java regex — the builder escapes it)."""
    docs = spark.createDataFrame(
        [(0, None), (1, "keep me"), (2, "")],
        "doc_id long, text string",
    )
    out = textops.dedup_lines(docs, max_frac=0.5).toPandas()
    assert out["doc_id"].tolist() == [0, 1, 2]          # totality: 3 in, 3 out
    assert out[out.doc_id == 1]["text_kept"].iloc[0] == "keep me"
    # NULL and '' both become one empty line; 2/3 docs > 0.5 -> removed
    assert out[out.doc_id == 0]["text_kept"].iloc[0] == ""

    dotted = spark.createDataFrame(
        [(0, "alpha.beta"), (1, "alpha.gamma")],
        "doc_id long, text string",
    )
    out2 = textops.dedup_lines(dotted, max_frac=0.6, sep=".").toPandas()
    r0 = out2[out2.doc_id == 0].iloc[0]
    # '.' as a raw regex matches every char -> all-empty lines; escaped it
    # splits into ['alpha','beta'], drops the shared 'alpha' (2/2 > 0.6)
    assert r0["text_kept"] == "beta" and r0["n_removed"] == 1


def test_dedup_lines_hot_line_corpus_and_plan_shape(spark):
    """VERDICT r3 #7: a 90%-one-line corpus through dedup_lines.  AQE's
    skew split provably cannot fire on the r3 join-freq-back shape (the
    freq side is a HashAggregate directly above its shuffle — probed even
    with forceOptimizeSkewedJoin), so the production path now broadcasts
    the BOUNDED removal set instead.  Assert (a) the broadcast path equals
    the shuffle-join fallback row-for-row on the planted corpus, (b) the
    hot line is removed everywhere, and (c) the plan flags lines via a
    broadcast hash join with NO shuffle join on the line key."""
    rows = [(i, f"unique line {i}\nSHARED NAV BOILERPLATE" if i % 10 != 0
             else f"unique line {i}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = textops.dedup_lines(docs, max_frac=0.5)
    slow = textops.dedup_lines(docs, max_frac=0.5, removal_broadcast=False)
    a, b = fast.toPandas(), slow.toPandas()
    assert a.values.tolist() == b.values.tolist()
    hot = a[a.doc_id % 10 != 0]
    assert (hot["n_removed"] == 1).all()
    assert hot["text_kept"].str.startswith("unique line").all()
    cold = a[a.doc_id % 10 == 0]
    assert (cold["n_removed"] == 0).all()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin [line" not in plan, plan
    assert "ShuffledHashJoin [line" not in plan, plan


def test_pack_sequences_equals_window_twin_and_plan_shape(spark):
    """The two-phase bucket prefix-sum packer must return EXACTLY the
    global-cumsum SQL twin's rows, and its plan must contain no
    unpartitioned window over doc rows — the only doc-sided sum window
    partitions by the doc_id-range bucket (tiny bucket_width here forces
    many buckets so composition actually exercises)."""
    _views(spark)
    a = _pdf_sorted(textops.pack_sequences(
        spark.read.parquet(f"{SF}/documents.parquet"), bucket_width=64))
    b = _pdf_sorted(spark.sql(SPARK_SQL["pack_sequences"]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()
    plan = textops.pack_sequences(
        spark.read.parquet(f"{SF}/documents.parquet"), bucket_width=64
    )._jdf.queryExecution().executedPlan().toString()
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*?)(?:, specifiedwindowframe|\))", plan)
    # two windows: the tiny bucket-cum (ordered by bkt, no doc partition —
    # over <= n/bucket_width rows) and the doc window partitioned by bkt
    assert any(s.startswith("bkt#") for s in specs), specs


def test_pack_sequences_semantics_planted(spark):
    """Hand-checked packing: budget 10, docs of 4/8/0/10/3 tokens ->
    windows cut at 10-token boundaries; empty doc collapses to its start
    window; a doc landing exactly on a boundary starts at offset 0."""
    rows = [
        (0, "a b c d"),              # cum 0..3   -> seq 0, off 0, end 0
        (1, "e f g h i j k l"),      # cum 4..11  -> seq 0, off 4, end 1
        (2, ""),                     # '' splits to [''] -> 1 token, cum 12
        (3, " ".join("x" * 1 for _ in range(10))),  # cum 13..22
        (4, "y z w"),                # cum 23..25
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.pack_sequences(docs, budget=10, bucket_width=2).collect()}
    assert (out[0]["start_seq"], out[0]["start_off"], out[0]["end_seq"]) == (0, 0, 0)
    assert (out[1]["start_seq"], out[1]["start_off"], out[1]["end_seq"]) == (0, 4, 1)
    assert out[2]["n_tokens"] == 1 and out[2]["start_off"] == 2
    assert (out[3]["start_seq"], out[3]["start_off"], out[3]["end_seq"]) == (1, 3, 2)
    assert (out[4]["start_seq"], out[4]["end_seq"]) == (2, 2)
    # contiguity: each doc starts where the previous ended
    cum = 0
    for i in range(5):
        assert out[i]["start_seq"] * 10 + out[i]["start_off"] == cum
        cum += out[i]["n_tokens"]


def test_dedup_simhash_pairs_planted_neardups(spark):
    """A 1-token edit of a 60-token doc flips few simhash bits -> the pair
    must surface with small hamming; an unrelated doc must not pair."""
    base = " ".join(f"word{j}" for j in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("word7", "changed")),
         (3, " ".join(f"other{j}" for j in range(60)))],
        "doc_id long, text string",
    )
    for fn in ("xxhash64", "md5_60"):
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in textops.dedup_simhash_pairs(
                     df, hash_fn=fn, max_hamming=3).collect()}
        assert set(pairs) == {(1, 2)}, (fn, pairs)
        assert 0 < pairs[(1, 2)] <= 3


def test_dedup_simhash_pairs_exact_dup_star_guard(spark):
    """500 byte-identical docs: the guarded default emits exactly 499 star
    edges (hamming 0) from the exact-dup pre-pass — never the O(B²) bucket
    clique — and the unguarded closure over a small slice agrees."""
    rows = [(i, "the very same boilerplate page body " * 5) for i in range(500)]
    rows.append((900, " ".join(f"uniq{j}" for j in range(50))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = textops.dedup_simhash_pairs(docs).collect()
    assert len(guarded) == 499
    assert all(r["doc_a"] == 0 and r["hamming"] == 0 for r in guarded)
    # closure equivalence on a small slice: star vs clique give identical
    # connected components
    small = docs.where("doc_id < 6 or doc_id = 900")
    star = textops.dedup_simhash_pairs(small)
    clique = textops.dedup_simhash_pairs(
        small, pre_dedup_exact=False, max_bucket=None)
    comp_star = {(r["doc_id"], r["component_id"])
                 for r in textops.dedup_components(
                     star.select("doc_a", "doc_b")).collect()}
    comp_clique = {(r["doc_id"], r["component_id"])
                   for r in textops.dedup_components(
                       clique.select("doc_a", "doc_b")).collect()}
    assert comp_star == comp_clique


def test_dedup_simhash_pairs_validates_recall_bound(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exact banding"):
        textops.dedup_simhash_pairs(docs, max_hamming=4, n_bands=4)


def test_dedup_simhash_pairs_no_doc_grain_sort(spark):
    """Composing over simhash64's SORTED output paid a doc-grain
    rangepartition + global sort per self-join side (EliminateSorts does
    not fire under a join — probed r4); the pairs op must use the
    unsorted core: the only global sort left is the pairs-grain output
    ordering."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = textops.dedup_simhash_pairs(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert not [l for l in plan.splitlines() if "Sort [doc_id" in l], plan
    assert plan.count("rangepartitioning") == 1, plan


def test_mixture_resample_builder_equals_window_twin(spark):
    """The two-pass quota-table sampler must return EXACTLY the
    window-formulated SQL twin's rows (same quotas, same hash order,
    same ranks), and inherit stratified_sample's plan shape: the only
    doc-sided row_number window partitions by (lang, bkt)."""
    _views(spark)
    a = _pdf_sorted(textops.mixture_resample(
        spark.read.parquet(f"{SF}/documents.parquet")))
    b = _pdf_sorted(spark.sql(SPARK_SQL["mixture_resample"]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()
    plan = textops.mixture_resample(
        spark.read.parquet(f"{SF}/documents.parquet")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number()") == 1, plan


def test_mixture_resample_sqrt_shares_and_clamp(spark):
    """980 'en' + 16 'ko' + 4 'lo' docs, T = ceil(1000/4) = 250:
    sqrt shares 31.30/4/2 of 37.30 -> quotas floor(250*s/denom) =
    (209, 26, 13) before clamping; 'lo' clamps at its 4 available docs.
    Low-resource languages keep a far larger share than raw frequency
    (lo: 0.4% of docs -> 1.9% of the sample even after clamping)."""
    import math

    rows = [(i, f"text body {i}", "en" if i < 980 else
             ("ko" if i < 996 else "lo")) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textops.mixture_resample(docs).toPandas()
    denom = math.sqrt(980) + math.sqrt(16) + math.sqrt(4)
    expect = {
        "en": min(math.floor(250 * math.sqrt(980) / denom), 980),
        "ko": min(math.floor(250 * math.sqrt(16) / denom), 16),
        "lo": min(math.floor(250 * math.sqrt(4) / denom), 4),
    }
    got = out.groupby("lang")["doc_id"].size().to_dict()
    assert got == expect, (got, expect)
    assert expect["lo"] == 4          # clamped at availability
    quotas = out.groupby("lang")["quota"].first().to_dict()
    assert quotas == expect
    for lang, grp in out.groupby("lang"):
        assert sorted(grp["sample_rank"]) == list(range(1, len(grp) + 1))


def test_pack_sequences_bucket_width_self_scales(spark):
    """Default bucket_width=None derives ~sqrt(n): the derivation is
    monotone and power-of-two with a 256 floor (so a forced large-n path
    picks a wider bucket), and the derived-path output still equals the
    explicit-width output with no global doc-grain window in the plan."""
    from newsspark.textops import _derive_bucket_width

    assert _derive_bucket_width(0) == 256
    assert _derive_bucket_width(10_000) == 256           # floor binds
    assert _derive_bucket_width(10**8) == 16384          # ~sqrt(1e8)=1e4
    assert _derive_bucket_width(10**12) == 2**20         # ~sqrt(1e12)=1e6
    widths = [_derive_bucket_width(10**k) for k in range(13)]
    assert widths == sorted(widths)                      # monotone in n

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    auto = _pdf_sorted(textops.pack_sequences(docs))
    explicit = _pdf_sorted(
        textops.pack_sequences(docs, bucket_width=_derive_bucket_width(docs.count()))
    )
    assert auto.values.tolist() == explicit.values.tolist()
    plan = textops.pack_sequences(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    import re
    specs = re.findall(
        r"windowspecdefinition\(([^)]*?)(?:, specifiedwindowframe|\))", plan)
    assert any(s.startswith("bkt#") for s in specs), specs


def test_export_shards_roundtrip_reconciles_with_manifest(spark, tmp_path):
    """The export story closed end to end (VERDICT r4 #7): partitionBy
    sharded write through the catalog seam -> read back -> the manifest
    recomputed from files equals the shard_manifest contract query's
    accounting, per shard, and the on-disk layout is one directory per
    shard."""
    import os

    from newsspark.catalog import ParquetCatalog

    _views(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cat = ParquetCatalog(str(tmp_path))
    # md5_60 replays the SQL twin's shard ids exactly
    back_manifest = _pdf_sorted(
        textops.export_shards(docs, cat, spark, hash_fn="md5_60")
    )
    want = _pdf_sorted(spark.sql(SPARK_SQL["shard_manifest"]))
    assert list(back_manifest.columns) == list(want.columns) + []
    assert back_manifest.values.tolist() == want.values.tolist()
    # one directory per shard, hive-style
    dirs = sorted(
        d for d in os.listdir(cat.path("shards")) if d.startswith("shard=")
    )
    assert dirs == [f"shard={i}" for i in sorted(range(16), key=str)]
    # doc identity survives the round trip (not just the aggregates)
    back = cat.read(spark, "shards")
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # xxhash64 production path: same mass, possibly different shard split
    m1 = spark.sql(SPARK_SQL["shard_manifest"]).toPandas()
    m2 = textops.shard_manifest_df(
        textops.assign_shards(docs, hash_fn="xxhash64")
    ).toPandas()
    assert m2["n_docs"].sum() == m1["n_docs"].sum()
    assert m2["n_tokens"].sum() == m1["n_tokens"].sum()


def test_dedup_substring_spans_builder_equals_twin_and_hash_paths(spark):
    """The DataFrame builder with hash_fn='md5_60' must return EXACTLY
    the SQL twin's rows, and the xxhash64 production default must find
    the same spans (hashes only gate equality, so absent collisions the
    span sets coincide)."""
    _views(spark)
    a = _pdf_sorted(textops.dedup_substring_spans(
        spark.read.parquet(f"{SF}/documents.parquet"), hash_fn="md5_60"))
    b = _pdf_sorted(spark.sql(SPARK_SQL["dedup_substring_spans"]))
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()
    c = _pdf_sorted(textops.dedup_substring_spans(
        spark.read.parquet(f"{SF}/documents.parquet")))
    assert c.values.tolist() == a.values.tolist()
    assert len(a) > 0  # the corpus plants cross-doc duplicate passages


def test_pack_sequences_n_docs_hint_identical(spark, docs):
    """ADVICE r5: the self-scaling bucket_width count() doubles expensive
    lineages; the n_docs hint must skip the count while producing identical
    packing (any ~n upper bound lands on the same or a near power-of-two
    width, and output is width-invariant)."""
    from newsspark import textops

    n = docs.count()
    base = textops.pack_sequences(docs).collect()
    hinted = textops.pack_sequences(docs, n_docs=n).collect()
    assert hinted == base
    # an upper-bound hint (4x) changes only the internal bucketing, never
    # the packing map
    loose = textops.pack_sequences(docs, n_docs=4 * n).collect()
    assert loose == base


def test_substring_spans_exact_prepass_identical_on_replicas(spark, docs):
    """r6 (VERDICT r5 #2): the exact-dup pre-pass must be OUTPUT-IDENTICAL
    to the unguarded run on a replica-heavy corpus — including min_count
    crossings that only happen BECAUSE of replication (a gram unique per
    doc occurs B times corpus-wide after B-fold replication; the weighted
    representative count must reproduce that exactly)."""
    from pyspark.sql import functions as F

    from newsspark import textops

    base = docs.limit(60).select("doc_id", "text")
    replicated = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"), "doc_id", "text"
    ).select(
        (F.col("doc_id") + F.col("r") * 100000).alias("doc_id"), "text"
    )
    unguarded = sorted(map(tuple, textops.dedup_substring_spans(
        replicated).collect()))
    guarded = sorted(map(tuple, textops.dedup_substring_spans(
        replicated, pre_dedup_exact=True).collect()))
    assert unguarded == guarded
    assert unguarded  # replication must actually produce spans
    # and on the standard (low-dup) corpus the two paths agree too
    u2 = sorted(map(tuple, textops.dedup_substring_spans(docs).collect()))
    g2 = sorted(map(tuple, textops.dedup_substring_spans(
        docs, pre_dedup_exact=True).collect()))
    assert u2 == g2
