"""Cross-engine property fuzz: the SPARK_SQL/DUCK_SQL twins must agree on
ARBITRARY corpora, not just the driver's fixed testdata — hypothesis
generates small adversarial documents tables (unicode, quotes, newlines,
empty strings, duplicate texts, single-language skew) and both engines run
the same contract queries over them, compared with the driver gate's own
normalization (scripts/check_contract.py norm/frame functions).

A failure here is a parity hole the sf0.01 fixture happened not to expose —
exactly the class of bug that would otherwise surface only in a future
driver round on different data.
"""
import os
import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from check_contract import dtype_kinds, frame_key  # noqa: E402

from newsspark.contract_sql import DUCK_SQL, SPARK_SQL  # noqa: E402

# documents-only queries whose semantics are corpus-independent
FUZZ_QUERIES = (
    "dedup_exact",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "vocab_topk",
    "sample_hash_fraction",
    "mixture_weights",
    "dedup_lines",
    "intradoc_line_dedup",
    "dedup_substring_spans",
    "stratified_sample",
    "corpus_length_profile",
    "bm25_topk",
    "incremental_new_docs",
    "unigram_logprob_buckets",
    "pack_sequences",
    "shard_manifest",
    "mixture_resample",
)

# Alphabet constrained to Unicode-version-STABLE ranges: Java 17 regex ships
# Unicode 13 while DuckDB's RE2 ships a newer table, so codepoints assigned
# in 14+ (e.g. U+11AB0) legitimately flip \p{L} between engines — the fuzz
# found exactly that; it is inherent engine skew, documented on the
# token_count oracle, not a parity bug this suite should chase.
_stable_char = st.one_of(
    st.characters(min_codepoint=0x21, max_codepoint=0x7E),       # ASCII
    st.characters(min_codepoint=0xA1, max_codepoint=0xFF),       # Latin-1
    st.characters(min_codepoint=0x3041, max_codepoint=0x3096),   # hiragana
    st.characters(min_codepoint=0x4E00, max_codepoint=0x9FCC),   # CJK basic
    st.characters(min_codepoint=0xAC00, max_codepoint=0xD7A3),   # hangul
)
_word = st.text(alphabet=_stable_char, min_size=1, max_size=8).map(
    lambda w: w.replace("'", "x").replace('"', "y").replace("\\", "z")
)
_text = st.lists(_word, min_size=1, max_size=25).map(" ".join)
_langs = st.sampled_from(["en", "ko", "de", "es", "und"])


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=2, max_value=18))
    texts = [draw(_text) for _ in range(n)]
    # force duplicate texts sometimes so dedup paths bite
    if n >= 4 and draw(st.booleans()):
        texts[1] = texts[0]
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, t, draw(_langs), f"src{i % 3}", len(t)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})


def _compare(spark, pdf, names):
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", pdf)
    for name in names:
        spdf = spark.sql(SPARK_SQL[name]).toPandas()
        opdf = con.execute(DUCK_SQL[name]).df()
        scols, srows = frame_key(spdf)
        ocols, orows = frame_key(opdf)
        assert scols == ocols, (name, scols, ocols)
        if len(spdf) and len(opdf):
            sk, ok = dtype_kinds(spdf), dtype_kinds(opdf)
            assert sk == ok, (name, sk, ok)
        assert srows == orows, (
            name,
            [r for r in srows if r not in orows][:3],
            [r for r in orows if r not in srows][:3],
        )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=_corpus())
def test_contract_twins_agree_on_arbitrary_corpora(spark, pdf):
    _compare(spark, pdf, FUZZ_QUERIES)


def test_contract_twins_agree_on_planted_edge_corpus(spark):
    """Deterministic nasty corpus: shared texts, heavy one-language skew,
    repeated words, punctuation soup, CJK, very long token."""
    rows = [
        (0, "spark spark spark window", "en", "src0"),
        (1, "spark spark spark window", "en", "src1"),   # exact dup
        (2, "가나다 라마바 사아자 차카타", "ko", "src2"),
        (3, "!!! ??? ;;; ::: ... ---", "en", "src0"),
        (4, "x" * 300, "en", "src1"),
        (5, "merge", "en", "src2"),
        (6, "a b c d e f g h i j k l m n o p", "en", "src0"),
        (7, "spark window merge spark window merge", "de", "src1"),
    ]
    pdf = pd.DataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    _compare(spark, pdf, FUZZ_QUERIES)


# --- events-table queries (joins / windows / time arithmetic) ----------------

EVENTS_FUZZ_QUERIES = (
    "events_hourly",
    "events_sessionize",
    "asof_join",
    "range_join",
)

_etypes = st.sampled_from(["click", "view", "purchase", "signup", "error"])


@st.composite
def _events_corpus(draw):
    n = draw(st.integers(min_value=4, max_value=40))
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(n):
        # clustered timestamps with frequent exact ties (second precision):
        # ties across users, across event types, and same-user same-ts are
        # exactly the cases where window order / asof inclusivity can
        # diverge between engines
        ts = base + pd.Timedelta(
            seconds=draw(st.integers(min_value=0, max_value=3 * 86400)) -
            (draw(st.integers(min_value=0, max_value=59))
             if draw(st.booleans()) else 0)
        )
        rows.append((
            i,
            ts,
            draw(st.integers(min_value=1, max_value=4)),  # few users: collisions
            draw(_etypes),
            (None if draw(st.integers(min_value=0, max_value=9)) == 0
             else draw(st.integers(min_value=-10**6, max_value=10**6)) / 100.0),
            "{}",
        ))
    # value forced to float64: an all-None draw leaves an object column
    # that spark.createDataFrame cannot type-infer (latent flake)
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})


def _compare_events(spark, pdf, names):
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    con = duckdb.connect()
    con.register("events", pdf)
    for name in names:
        spdf = spark.sql(SPARK_SQL[name]).toPandas()
        opdf = con.execute(DUCK_SQL[name]).df()
        scols, srows = frame_key(spdf)
        ocols, orows = frame_key(opdf)
        assert scols == ocols, (name, scols, ocols)
        assert srows == orows, (
            name,
            [r for r in srows if r not in orows][:3],
            [r for r in orows if r not in srows][:3],
        )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=_events_corpus())
def test_events_twins_agree_on_arbitrary_corpora(spark, pdf):
    _compare_events(spark, pdf, EVENTS_FUZZ_QUERIES)


def test_events_twins_agree_on_planted_tie_corpus(spark):
    """Deterministic tie-heavy corpus: same-user same-second events across
    types (asof inclusive boundary + sessionize order), duplicate
    purchases at one instant (the max() pre-reduce), and a window-edge
    purchase exactly 1h away."""
    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = [
        (0, base, 1, "click", 1.00, "{}"),
        (1, base, 1, "purchase", 2.00, "{}"),           # tie with click
        (2, base, 1, "purchase", 3.00, "{}"),           # dup instant purchase
        (3, base + pd.Timedelta(hours=1), 1, "click", 4.00, "{}"),  # +1h edge
        (4, base - pd.Timedelta(hours=1), 1, "purchase", 5.00, "{}"),
        (5, base, 2, "click", 6.00, "{}"),              # other user, no rights
        (6, base + pd.Timedelta(seconds=1), 1, "click", 7.00, "{}"),
        # NULL-value purchase NEWER than a non-null one: asof must
        # return (its ts, NULL), never pair its ts with an older value
        (7, base + pd.Timedelta(minutes=30), 1, "purchase", None, "{}"),
        (8, base + pd.Timedelta(minutes=40), 1, "click", 9.00, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).astype({"event_id": "int64", "user_id": "int64"})
    _compare_events(spark, pdf, EVENTS_FUZZ_QUERIES)


# --- embeddings-table queries (float-fold ANN / cosine oracles) ---------------
# The most parity-fragile suite: every query divides by vector norms, folds
# dot products in a pinned IEEE order, buckets on float sign thresholds, and
# ranks on rounded similarity.  The fuzz plants exactly the inputs the sf
# fixtures never contain: zero-norm vectors (Spark 4 ANSI raises
# DIVIDE_BY_ZERO on double 0/0 while DuckDB NULLs — the round-4 guard),
# duplicate vectors (rank ties), antipodal and exactly-scaled copies,
# mixed ±0.0 components, and subnormal-magnitude vectors.

EMB_FUZZ_QUERIES = (
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
)

_EMB_DIM = 64  # the hyperplane/centroid literals in contract_sql are dim-64


@st.composite
def _emb_corpus(draw):
    import numpy as np

    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    n = draw(st.integers(min_value=12, max_value=20))
    rs = np.random.RandomState(seed)
    X = rs.uniform(-1.0, 1.0, size=(n, _EMB_DIM)).astype(np.float32)
    if draw(st.booleans()):
        X[draw(st.integers(min_value=10, max_value=n - 1))] = 0.0  # zero corpus vec
    if draw(st.booleans()):
        X[draw(st.integers(min_value=0, max_value=9))] = 0.0       # zero QUERY vec
    if draw(st.booleans()):
        i = draw(st.integers(min_value=0, max_value=n - 2))
        X[i + 1] = X[i]                                   # duplicate (sim tie)
    if draw(st.booleans()):
        i = draw(st.integers(min_value=0, max_value=n - 2))
        X[i + 1] = -X[i]                                  # antipodal (sim -1)
    if draw(st.booleans()):
        i = draw(st.integers(min_value=0, max_value=n - 2))
        X[i + 1] = X[i] * np.float32(2.0)                 # exact same direction
    if draw(st.booleans()):
        X[draw(st.integers(min_value=0, max_value=n - 1)), ::2] = np.float32(-0.0)
    if draw(st.booleans()):
        i = draw(st.integers(min_value=0, max_value=n - 1))
        X[i] = (X[i] * np.float32(1e-40)).astype(np.float32)  # subnormal range
    return X


def _compare_emb(spark, X, names):
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from __spark_entry__ import _TABLES

    n = len(X)
    tbl = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(
            [[float(v) for v in row] for row in X],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array([i % 3 for i in range(n)], type=pa.int32()),
    })
    root = tempfile.mkdtemp(prefix="newsspark_emb_fuzz_")
    try:
        pq.write_table(tbl, f"{root}/embeddings.parquet")
        # the entry callables register ALL contract tables from sf_dir;
        # everything except embeddings is irrelevant here — symlink the
        # frozen sf0.001 files so the REAL driver entries run unmodified
        for t in _TABLES:
            if t != "embeddings":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           f"{root}/{t}.parquet")
        qs = entrymod.queries()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{root}/embeddings.parquet'"
        )
        for name in names:
            spdf = qs[name](spark, root).toPandas()
            opdf = con.execute(DUCK_SQL[name]).df()
            scols, srows = frame_key(spdf)
            ocols, orows = frame_key(opdf)
            assert scols == ocols, (name, scols, ocols)
            if len(spdf) and len(opdf):
                sk, ok = dtype_kinds(spdf), dtype_kinds(opdf)
                assert sk == ok, (name, sk, ok)
            assert srows == orows, (
                name,
                [r for r in srows if r not in orows][:3],
                [r for r in orows if r not in srows][:3],
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(X=_emb_corpus())
def test_embedding_twins_agree_on_arbitrary_corpora(spark, X):
    _compare_emb(spark, X, EMB_FUZZ_QUERIES)


def test_embedding_twins_agree_on_planted_edge_corpus(spark):
    """Deterministic nasty embedding table: zero query + zero corpus
    vector, duplicate pair, antipodal pair, exact 2x scale, mixed ±0.0,
    subnormal magnitudes — every adversarial case at once."""
    import numpy as np

    rs = np.random.RandomState(7)
    X = rs.uniform(-1.0, 1.0, size=(14, _EMB_DIM)).astype(np.float32)
    X[3] = 0.0                                  # zero-norm query vector
    X[12] = 0.0                                 # zero-norm corpus vector
    X[5] = X[4]                                 # duplicate pair (sim tie)
    X[7] = -X[6]                                # antipodal
    X[9] = X[8] * np.float32(2.0)               # same direction, 2x scale
    X[10, ::2] = np.float32(-0.0)               # mixed signed zeros
    X[11] = (X[11] * np.float32(1e-40)).astype(np.float32)  # subnormals
    _compare_emb(spark, X, EMB_FUZZ_QUERIES)


# --- hash-op queries through the REAL driver entries --------------------------
# simhash votes, minhash banding, and component closures ride on the
# md5-prefix 60-bit hash parity and pinned fold orders; the SQL-only fuzz
# above cannot reach them because their entries are DataFrame builders, not
# SPARK_SQL twins.  Reuse the emb suite's trick: write the fuzz corpus as
# documents.parquet in a temp sf_dir (other tables symlinked) and run the
# exact queries() callables against DUCK_SQL.

HASH_FUZZ_QUERIES = (
    "simhash64",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "dedup_pipeline",
    "dedup_components",
)


def _compare_docs_entries(spark, pdf, names):
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from __spark_entry__ import _TABLES

    root = tempfile.mkdtemp(prefix="newsspark_hash_fuzz_")
    try:
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       f"{root}/documents.parquet")
        for t in _TABLES:
            if t != "documents":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           f"{root}/{t}.parquet")
        qs = entrymod.queries()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{root}/documents.parquet'"
        )
        for name in names:
            spdf = qs[name](spark, root).toPandas()
            opdf = con.execute(DUCK_SQL[name]).df()
            scols, srows = frame_key(spdf)
            ocols, orows = frame_key(opdf)
            assert scols == ocols, (name, scols, ocols)
            if len(spdf) and len(opdf):
                sk, ok = dtype_kinds(spdf), dtype_kinds(opdf)
                assert sk == ok, (name, sk, ok)
            assert srows == orows, (
                name,
                [r for r in srows if r not in orows][:3],
                [r for r in orows if r not in srows][:3],
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def _hash_corpus(draw):
    """Docs corpus biased toward hash-op edge cases: exact duplicate
    clusters (star-edge paths), 1-token near-dups (banding boundaries),
    single-token docs, shared shingle tails."""
    base_pdf = draw(_corpus())
    rows = base_pdf.values.tolist()
    nxt = int(base_pdf["doc_id"].max()) + 1
    seed_text = draw(_text)
    if draw(st.booleans()):          # exact-dup cluster of 3
        for k in range(3):
            rows.append([nxt, seed_text, "en", "src0", len(seed_text)])
            nxt += 1
    if draw(st.booleans()):          # near-dup: one token changed
        words = (seed_text + " tail").split()
        words[0] = "flip"
        t2 = " ".join(words)
        rows.append([nxt, seed_text, "en", "src1", len(seed_text)])
        rows.append([nxt + 1, t2, "en", "src1", len(t2)])
        nxt += 2
    if draw(st.booleans()):          # single-token doc
        rows.append([nxt, "solo", "en", "src2", 4])
        nxt += 1
    out = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=_hash_corpus())
def test_hash_op_entries_agree_on_arbitrary_corpora(spark, pdf):
    _compare_docs_entries(spark, pdf, HASH_FUZZ_QUERIES)


def test_hash_op_entries_agree_on_planted_edge_corpus(spark):
    dup = "spark spark window merge " * 8
    near = dup.replace("merge", "funge", 1)
    rows = [
        (0, dup, "en", "src0"), (1, dup, "en", "src1"),
        (2, dup, "en", "src2"),                       # 3-clique exact dups
        (3, near, "en", "src0"),                      # near-dup of the clique
        (4, "solo", "en", "src1"),                    # single token
        (5, " ".join(f"tok{j}" for j in range(40)), "en", "src2"),
    ]
    pdf = pd.DataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    _compare_docs_entries(spark, pdf, HASH_FUZZ_QUERIES)


# --- linkops entries (synth replay: DuckDB twins are pure fns of doc_id) -----
# The link oracles replay synth_link_page as string arithmetic OF doc_id
# ONLY, so the fuzz axes are (a) doc_ids far outside the fixture range
# (the synthesis/replay modular arithmetic must agree at 2^62) and (b)
# document text whose first 40 chars carry markup/quotes/empty — the
# html-escape guard must keep the Spark-side DOM parse from ever seeing
# corpus text as anchors (ADVICE r4).  Non-negative doc_ids only: Python
# and SQL disagree on negative modulo, and the corpus contract (TESTDATA)
# has non-negative ids.

LINK_FUZZ_QUERIES = (
    "extract_links",
    "link_frontier",
    "robots_filter",
    "crawl_frontier_gated",
    "crawl_schedule",
)

_markup = st.sampled_from([
    '<a href="https://evil.example/e">boom</a>',
    '<a href=/sec9/item-0.html>x</a>',
    "<a href='#frag'>y",
    '"></p><a href="//cdn9.example.net/z">',
    "&amp;&lt;&gt;<>",
    "</body></html>",
])
_link_text = st.one_of(
    _text,
    st.just(""),
    st.tuples(_markup, _text).map(lambda p: p[0] + " " + p[1]),
    _markup,
)


@st.composite
def _link_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    ids = draw(st.lists(st.integers(min_value=0, max_value=2**62),
                        min_size=n, max_size=n, unique=True))
    if draw(st.booleans()):
        ids[0] = 0  # pin the origin so tiny-id arithmetic is always hit
    rows = []
    for k, i in enumerate(sorted(ids)):
        t = draw(_link_text)
        rows.append((i, t, "en", f"src{k % 3}", len(t)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pdf=_link_corpus())
def test_link_entries_agree_on_arbitrary_corpora(spark, pdf):
    _compare_docs_entries(spark, pdf, LINK_FUZZ_QUERIES)


def test_link_entries_agree_on_planted_markup_corpus(spark):
    """Deterministic nasty corpus: anchor markup leading the text (the
    exact parity break the escape guard closes), unclosed tags, entity
    soup, empty text, and ids at 0 / 7 / 2^62-1."""
    rows = [
        (0, '<a href="https://evil.example/">boom</a> trailing words'),
        (7, "<a href=/secX/item-1.html>unquoted"),
        (8, ""),
        (13, '"></p><a href="//cdn9.example.net/z"> after-close'),
        (2**62 - 1, "plain words here"),
    ]
    pdf = pd.DataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    _compare_docs_entries(spark, pdf, LINK_FUZZ_QUERIES)
