"""Dual-dialect SQL for the driver's correctness gate.

Each key has a Spark SQL text (run via ``spark.sql`` over temp views of the
sf-dir parquet tables) and a DuckDB oracle text (run by the driver over the
same parquet, views pre-registered).  Texts are kept structurally identical;
where one string serves both dialects it is defined once.

Conventions that make the value-hash comparison exact:
- every computed column is aliased identically on both sides;
- counts/sizes are CAST to BIGINT on both sides (DuckDB sum() yields HUGEINT,
  Spark size() yields INT — both normalized);
- money aggregates go through DECIMAL(18,2) so floating summation order can
  never flip a cent;
- Spark runs with spark.sql.parser.escapedStringLiterals=true so regex/string
  literals read byte-identically in both dialects; newlines are chr(10).
- WINDOW aggregates need the same BIGINT cast as scalar ones (DuckDB windowed
  sum() is HUGEINT → pandas float64, Spark is BIGINT → int64; the r1
  events_sessionize hash failure was exactly this). Audited 2026-08-16: every
  sum()/count()/size()/len()/row_number() in this module — scalar or windowed
  — is wrapped in an explicit CAST; timestamps in outputs go through
  CAST(... AS VARCHAR(32)) with session TZ pinned UTC.
- ORDER BY determinism (audited r3, 2026-08-16, all 43 oracle queries):
  every oracle's outermost ORDER BY is a TOTAL order — the sort key is a
  unique key of the result (row id such as doc_id/url/media_id, the full
  group-by key, a (parent, rank/idx) pair, or a deduplicated pair) — so a
  future engine change can never flip hash equality via tied-row order.
  One deliberate nuance: image_filter orders by (doc_id, img) where a
  repeated img within a doc would tie, but such rows are identical in
  every column (kept is a pure function of img), so their relative order
  cannot affect a value hash.

SURVEY.md §2 rows covered here: E2 (image_filter), F3 (url_date_parse),
G1 (date_coalesce), C3 (dedupe_cap), C4 (method_join), B4 (length_gate),
H1 (clean_text_lines) — the SQL-expressible projections of the extraction
semantics, exercised over the ``documents`` table per FIXTURES.md §5.
"""

import os as _os

SPARK_SQL: dict = {}
DUCK_SQL: dict = {}

# fixture paths derived from this file's location, not a hardcoded checkout
# root (ADVICE r2: the oracles must survive a relocated clone)
_FIXTURE_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "tests", "fixtures", "golden",
)


def _both(name: str, sql: str) -> None:
    SPARK_SQL[name] = sql
    DUCK_SQL[name] = sql


def _dual(name: str, spark_sql: str, duck_sql: str) -> None:
    SPARK_SQL[name] = spark_sql
    DUCK_SQL[name] = duck_sql


# --- B4: length gate (extractor.py:303-304) --------------------------------
_both(
    "length_gate",
    """
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CASE WHEN n_chars < 100
            THEN '모든 추출 방법 실패: 본문을 찾을 수 없습니다'
            ELSE '' END AS error
FROM documents
ORDER BY doc_id
""",
)

# --- C4: method tag accumulation (extractor.py:248,271,294,299) -------------
_both(
    "method_join",
    """
SELECT doc_id,
       CASE WHEN m = '' THEN 'none' ELSE m END AS method
FROM (
  SELECT doc_id,
         concat_ws(', ',
           CASE WHEN doc_id % 2 = 0 THEN 'trafilatura' END,
           CASE WHEN doc_id % 3 = 0 THEN 'newspaper3k' END,
           CASE WHEN doc_id % 5 = 0 THEN 'readability' END) AS m
  FROM documents) t
ORDER BY doc_id
""",
)

# --- G1: date coalesce order (extractor.py:161-203) --------------------------
_both(
    "date_coalesce",
    """
SELECT doc_id,
       coalesce(nullif(meta_date, ''), nullif(time_date, ''),
                nullif(url_date, ''), '') AS date
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN concat('2026-01-', lpad(CAST(1 + doc_id % 28 AS VARCHAR(8)), 2, '0')) ELSE '' END AS meta_date,
         CASE WHEN doc_id % 4 = 0 THEN '2025-12-31T08:00:00' ELSE '' END AS time_date,
         CASE WHEN doc_id % 2 = 0 THEN concat('2024-', lpad(CAST(1 + doc_id % 12 AS VARCHAR(8)), 2, '0'), '-15') ELSE '' END AS url_date
  FROM documents) t
ORDER BY doc_id
""",
)

# --- F3: URL date regex, unvalidated (extractor.py:197-201) ------------------
_both(
    "url_date_parse",
    r"""
SELECT doc_id, url,
       CASE WHEN regexp_extract(url, '/(\d{4})[-/]?(\d{2})[-/]?(\d{2})', 1) = ''
            THEN ''
            ELSE concat(
              regexp_extract(url, '/(\d{4})[-/]?(\d{2})[-/]?(\d{2})', 1), '-',
              regexp_extract(url, '/(\d{4})[-/]?(\d{2})[-/]?(\d{2})', 2), '-',
              regexp_extract(url, '/(\d{4})[-/]?(\d{2})[-/]?(\d{2})', 3)) END AS url_date
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN concat('https://ex.com/',
                          CAST(2000 + doc_id % 27 AS VARCHAR(8)), '/',
                          lpad(CAST(1 + doc_id % 14 AS VARCHAR(8)), 2, '0'), '/',
                          lpad(CAST(1 + doc_id % 41 AS VARCHAR(8)), 2, '0'),
                          '/article-', CAST(doc_id AS VARCHAR(16)))
              ELSE concat('https://ex.com/a/', CAST(doc_id AS VARCHAR(16))) END AS url
  FROM documents) t
ORDER BY doc_id
""",
)

# --- E2: image filter (extractor.py:47-90) -----------------------------------
# Candidate urls synthesized per doc; output one row per (doc, candidate)
# with the keep/drop verdict.
_IMG_CANDS = """
  SELECT doc_id, concat('https://img.ex.com/photo_', CAST(doc_id AS VARCHAR(16)), '_',
                        CAST(200 + doc_id % 1000 AS VARCHAR(8)), 'x',
                        CAST(100 + doc_id % 900 AS VARCHAR(8)), '.jpg') AS img FROM documents
  UNION ALL SELECT doc_id, concat('https://img.ex.com/logo_', CAST(doc_id AS VARCHAR(16)), '.png') FROM documents
  UNION ALL SELECT doc_id, concat('https://img.ex.com/pic', CAST(doc_id AS VARCHAR(16)), '.svg') FROM documents
  UNION ALL SELECT doc_id, concat('https://img.ex.com/KAKAO_', CAST(doc_id AS VARCHAR(16)), '_800x600.jpg') FROM documents
  UNION ALL SELECT doc_id, concat('https://img.ex.com/news_', CAST(doc_id AS VARCHAR(16)), '_', CAST(300 + doc_id % 3000 AS VARCHAR(8)), 'x400.jpg') FROM documents
  UNION ALL SELECT doc_id, concat('https://img.ex.com/plain_', CAST(doc_id AS VARCHAR(16)), '.jpeg') FROM documents
"""
_both(
    "image_filter",
    rf"""
SELECT doc_id, img,
       CASE
         WHEN img LIKE '%.svg' OR img LIKE '%.gif' THEN false
         WHEN contains(lower(img), '/logo') OR contains(lower(img), '_logo')
           OR contains(lower(img), 'logo_') OR contains(lower(img), '/icon')
           OR contains(lower(img), '/btn_') OR contains(lower(img), '/banner/')
           OR contains(lower(img), '/ad_') OR contains(lower(img), '/ads/')
           OR contains(lower(img), '/thumb') OR contains(lower(img), '/profile')
           OR contains(lower(img), '/avatar') OR contains(lower(img), '/emoji')
           OR contains(lower(img), '/symbol') OR contains(lower(img), 'office_logo')
           OR contains(lower(img), 'default') OR contains(lower(img), 'placeholder')
           OR contains(lower(img), 'no_image') OR contains(lower(img), 'noimage')
           OR contains(lower(img), 'mannerbot') OR contains(lower(img), 'people_default')
           THEN false
         WHEN contains(lower(img), 'kakao') OR contains(lower(img), 'facebook')
           OR contains(lower(img), 'twitter') OR contains(lower(img), 'share')
           OR contains(lower(img), 'sns') OR contains(lower(img), 'ic-')
           THEN false
         WHEN regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 2) <> '' AND (
              CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 2) AS BIGINT) < 300
           OR CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 3) AS BIGINT) < 300
           OR CAST(greatest(CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 2) AS BIGINT),
                            CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 3) AS BIGINT)) AS DOUBLE)
              / CAST(least(CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 2) AS BIGINT),
                           CAST(regexp_extract(img, '(_ir_)?(\d+)x(\d+)', 3) AS BIGINT)) AS DOUBLE) > 5.0)
           THEN false
         ELSE true
       END AS keep
FROM ({_IMG_CANDS}) c
ORDER BY doc_id, img
""",
)

# --- C3: ordered dedupe + cap 5 (extractor.py:155, 300) ----------------------
_dual(
    "dedupe_cap",
    """
SELECT doc_id,
       array_join(slice(array_distinct(cands), 1, 5), '|') AS images,
       CAST(size(slice(array_distinct(cands), 1, 5)) AS BIGINT) AS n_images
FROM (
  SELECT doc_id,
         array(concat('u', CAST(doc_id % 7 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 5 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 7 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 3 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 11 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 5 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 13 AS VARCHAR(8))),
               concat('u', CAST(doc_id % 2 AS VARCHAR(8)))) AS cands
  FROM documents) t
ORDER BY doc_id
""",
    """
SELECT doc_id,
       array_to_string(list_slice(list_filter(cands, (x, i) -> list_position(cands, x) = i), 1, 5), '|') AS images,
       CAST(len(list_slice(list_filter(cands, (x, i) -> list_position(cands, x) = i), 1, 5)) AS BIGINT) AS n_images
FROM (
  SELECT doc_id,
         [concat('u', CAST(doc_id % 7 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 5 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 7 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 3 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 11 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 5 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 13 AS VARCHAR(8))),
          concat('u', CAST(doc_id % 2 AS VARCHAR(8)))] AS cands
  FROM documents) t
ORDER BY doc_id
""",
)

# --- H1: boilerplate line strip (extractor.py:521-534) ------------------------
_H1_RAW = (
    "concat('  Headline line  ', chr(10), text, chr(10), chr(10), chr(10), "
    "'무단 전재 및 재배포 금지', chr(10), 'ⓒ Example Corp', chr(10), "
    "'Copyright 2026', chr(10), '▶ 관련기사', chr(10), "
    "'tail ', CAST(doc_id % 7 AS VARCHAR(8)))"
)
_H1_COND = (
    "x <> '' AND NOT (contains(x, '무단 전재') OR contains(x, '재배포 금지') "
    "OR contains(x, 'ⓒ') OR contains(x, 'Copyright') OR contains(x, '▶'))"
)
_dual(
    "clean_text_lines",
    f"""
SELECT doc_id,
       array_join(filter(transform(split(raw, chr(10)), x -> trim(x)),
                         x -> {_H1_COND}), chr(10)) AS cleaned
FROM (SELECT doc_id, {_H1_RAW} AS raw FROM documents) t
ORDER BY doc_id
""",
    f"""
SELECT doc_id,
       array_to_string(list_filter(list_transform(string_split(raw, chr(10)), x -> trim(x)),
                                   x -> {_H1_COND}), chr(10)) AS cleaned
FROM (SELECT doc_id, {_H1_RAW} AS raw FROM documents) t
ORDER BY doc_id
""",
)

# --- training-data ops -------------------------------------------------------

_both(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
""",
)

_TOK_SPARK = "split(trim(lower(text)), '\\s+')"
_TOK_DUCK = r"regexp_split_to_array(trim(lower(text)), '\s+')"
# BPE-ish pretokenizer (textops.BPE_SPLIT_RE) as a SQL literal: apostrophe
# doubled for the string literal; backslashes verbatim in BOTH engines
# (Spark views run with escapedStringLiterals=true).
# Parity boundary (found by cross-engine fuzzing): \p{L}/\p{N} follow each
# engine's Unicode table — Java 17 ships Unicode 13, DuckDB's RE2 a newer
# version — so codepoints ASSIGNED IN UNICODE 14+ (e.g. U+11AB0) classify
# differently.  Real web text is overwhelmingly version-stable scripts;
# the fuzz generator and this contract scope parity to those.
_BPE_SQL = r"''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

_dual(
    "token_count",
    f"""
SELECT doc_id, CAST(size({_TOK_SPARK}) AS BIGINT) AS n_tokens,
       CAST(regexp_count(text, '{_BPE_SQL}') AS BIGINT) AS n_subword_tokens
FROM documents ORDER BY doc_id
""",
    f"""
SELECT doc_id, CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_subword_tokens
FROM documents ORDER BY doc_id
""",
)

_dual(
    "jaccard_adjacent",
    f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(size(array_intersect(a.tset, b.tset)) AS BIGINT) AS n_common,
       CAST(size(array_union(a.tset, b.tset)) AS BIGINT) AS n_union
FROM (SELECT doc_id, array_distinct({_TOK_SPARK}) AS tset FROM documents) a
JOIN (SELECT doc_id, array_distinct({_TOK_SPARK}) AS tset FROM documents) b
  ON a.doc_id + 1 = b.doc_id
ORDER BY doc_a
""",
    f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.tset, b.tset)) AS BIGINT) AS n_common,
       CAST(len(list_distinct(list_concat(a.tset, b.tset))) AS BIGINT) AS n_union
FROM (SELECT doc_id, list_distinct({_TOK_DUCK}) AS tset FROM documents) a
JOIN (SELECT doc_id, list_distinct({_TOK_DUCK}) AS tset FROM documents) b
  ON a.doc_id + 1 = b.doc_id
ORDER BY doc_a
""",
)

_dual(
    "doc_fingerprint",
    f"""
SELECT doc_id,
       aggregate({_TOK_SPARK}, CAST(0 AS BIGINT),
                 (acc, t) -> pmod(acc * 31 + ascii(t) * 7 + length(t), 1000000007)) AS fingerprint
FROM documents ORDER BY doc_id
""",
    f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform({_TOK_DUCK},
                                     t -> CAST(ascii(t) * 7 + length(t) AS BIGINT))),
         (acc, t) -> (acc * 31 + t) % 1000000007) AS fingerprint
FROM documents ORDER BY doc_id
""",
)

_STOP_EN = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"
_STOP_ES = "('el', 'la', 'de', 'que', 'y', 'los')"
_STOP_DE = "('der', 'die', 'das', 'und', 'ist', 'ein')"

_dual(
    "lang_id",
    f"""
SELECT doc_id,
       CAST(en_hits AS BIGINT) AS en_hits,
       CAST(es_hits AS BIGINT) AS es_hits,
       CAST(de_hits AS BIGINT) AS de_hits,
       CASE WHEN has_hangul THEN 'ko'
            WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
            WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
            WHEN de_hits > 0 THEN 'de'
            ELSE 'und' END AS lang_pred
FROM (
  SELECT doc_id,
         size(filter({_TOK_SPARK}, t -> t IN {_STOP_EN})) AS en_hits,
         size(filter({_TOK_SPARK}, t -> t IN {_STOP_ES})) AS es_hits,
         size(filter({_TOK_SPARK}, t -> t IN {_STOP_DE})) AS de_hits,
         text RLIKE '[가-힣]' AS has_hangul
  FROM documents) t
ORDER BY doc_id
""",
    f"""
SELECT doc_id,
       CAST(en_hits AS BIGINT) AS en_hits,
       CAST(es_hits AS BIGINT) AS es_hits,
       CAST(de_hits AS BIGINT) AS de_hits,
       CASE WHEN has_hangul THEN 'ko'
            WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
            WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
            WHEN de_hits > 0 THEN 'de'
            ELSE 'und' END AS lang_pred
FROM (
  SELECT doc_id,
         len(list_filter({_TOK_DUCK}, t -> t IN {_STOP_EN})) AS en_hits,
         len(list_filter({_TOK_DUCK}, t -> t IN {_STOP_ES})) AS es_hits,
         len(list_filter({_TOK_DUCK}, t -> t IN {_STOP_DE})) AS de_hits,
         regexp_matches(text, '[가-힣]') AS has_hangul
  FROM documents) t
ORDER BY doc_id
""",
)

_dual(
    "quality_score",
    f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS mean_tok_len,
       round(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       (n_tokens >= 10
        AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 2.0
        AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 12.0
        AND CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5) AS keep
FROM (
  SELECT doc_id,
         size({_TOK_SPARK}) AS n_tokens,
         length(text) AS n_chars,
         size(filter({_TOK_SPARK}, t -> t IN {_STOP_EN})) AS stop_hits
  FROM documents) t
ORDER BY doc_id
""",
    f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS mean_tok_len,
       round(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
       (n_tokens >= 10
        AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 2.0
        AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 12.0
        AND CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5) AS keep
FROM (
  SELECT doc_id,
         len({_TOK_DUCK}) AS n_tokens,
         length(text) AS n_chars,
         len(list_filter({_TOK_DUCK}, t -> t IN {_STOP_EN})) AS stop_hits
  FROM documents) t
ORDER BY doc_id
""",
)

# --- PII scrub (pretraining-corpus redaction) ---------------------------------
# documents.text is synthetic prose with no PII, so each doc plants a
# deterministic email/phone/ipv4 tail; the op counts and redacts them.
# Patterns avoid lookaheads/backreferences so Java regex and RE2 agree.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d{2,3}[- ]\d{3,4}[- ]\d{4}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_SYNTH = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR(16)), "
    "'@mail-', CAST(doc_id % 9 AS VARCHAR(8)), '.example.com', "
    "CASE WHEN doc_id % 3 = 0 THEN concat(' call +82 10-', "
    "lpad(CAST(1000 + doc_id % 9000 AS VARCHAR(8)), 4, '0'), '-', "
    "lpad(CAST(doc_id % 10000 AS VARCHAR(8)), 4, '0')) ELSE '' END, "
    "CASE WHEN doc_id % 4 = 1 THEN concat(' from 10.', "
    "CAST(doc_id % 256 AS VARCHAR(8)), '.0.', "
    "CAST(doc_id % 100 AS VARCHAR(8))) ELSE '' END)"
)
_dual(
    "pii_scrub",
    f"""
SELECT doc_id,
       CAST(regexp_count(raw, '{_PII_EMAIL}') AS BIGINT) AS n_emails,
       CAST(regexp_count(raw, '{_PII_PHONE}') AS BIGINT) AS n_phones,
       CAST(regexp_count(raw, '{_PII_IPV4}') AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(raw,
         '{_PII_EMAIL}', '<EMAIL>'),
         '{_PII_PHONE}', '<PHONE>'),
         '{_PII_IPV4}', '<IP>') AS scrubbed
FROM (SELECT doc_id, {_PII_SYNTH} AS raw FROM documents) t
ORDER BY doc_id
""",
    f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(raw, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(raw,
         '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g'),
         '{_PII_IPV4}', '<IP>', 'g') AS scrubbed
FROM (SELECT doc_id, {_PII_SYNTH} AS raw FROM documents) t
ORDER BY doc_id
""",
)

# --- repetition stats (Gopher-style quality signals) ---------------------------
# top-token and top-bigram mass: high values flag boilerplate/spam documents.
# Shape at scale: explode + two-level agg, all map-side partial — one shuffle.
_BIGRAMS_SPARK = (
    "CASE WHEN size(tokens) >= 2 "
    "THEN transform(sequence(1, size(tokens) - 1), "
    "i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1))) "
    "ELSE array(concat_ws(' ', tokens)) END"
)
_BIGRAMS_DUCK = (
    "CASE WHEN len(tokens) >= 2 "
    "THEN list_transform(range(1, len(tokens)), "
    "i -> concat(tokens[i], ' ', tokens[i + 1])) "
    "ELSE [array_to_string(tokens, ' ')] END"
)
_dual(
    "repetition_stats",
    f"""
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_distinct AS BIGINT) AS n_distinct,
       round(CAST(t.top_tok AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 4) AS top_token_frac,
       round(CAST(b.top_bi AS DOUBLE) / CAST(greatest(t.n_tokens - 1, 1) AS DOUBLE), 4) AS top_bigram_frac
FROM (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_tok
  FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, {_TOK_SPARK} AS tokens FROM documents)
    LATERAL VIEW explode(tokens) x AS tok
    GROUP BY doc_id, tok) tc
  GROUP BY doc_id) t
JOIN (
  SELECT doc_id, max(c) AS top_bi
  FROM (
    SELECT doc_id, bi, count(*) AS c
    FROM (SELECT doc_id, {_BIGRAMS_SPARK} AS bigrams
          FROM (SELECT doc_id, {_TOK_SPARK} AS tokens FROM documents))
    LATERAL VIEW explode(bigrams) y AS bi
    GROUP BY doc_id, bi) bc
  GROUP BY doc_id) b ON t.doc_id = b.doc_id
ORDER BY t.doc_id
""",
    f"""
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_distinct AS BIGINT) AS n_distinct,
       round(CAST(t.top_tok AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 4) AS top_token_frac,
       round(CAST(b.top_bi AS DOUBLE) / CAST(greatest(t.n_tokens - 1, 1) AS DOUBLE), 4) AS top_bigram_frac
FROM (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_tok
  FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(tokens) AS tok
          FROM (SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents) a) u
    GROUP BY doc_id, tok) tc
  GROUP BY doc_id) t
JOIN (
  SELECT doc_id, max(c) AS top_bi
  FROM (
    SELECT doc_id, bi, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS bi
          FROM (SELECT doc_id, {_BIGRAMS_DUCK} AS bigrams
                FROM (SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents) a2) bg) ub
    GROUP BY doc_id, bi) bc
  GROUP BY doc_id) b ON t.doc_id = b.doc_id
ORDER BY t.doc_id
""",
)

# --- passage chunking (training-window preparation) ----------------------------
# fixed token windows W=64 with stride S=48 (overlap 16): the standard
# context-window prep; explode shape, one row per (doc, chunk).
_CHUNK_W, _CHUNK_S = 64, 48
_dual(
    "passage_chunks",
    f"""
SELECT doc_id, chunk_id,
       CAST(size(chunk) AS BIGINT) AS n_chunk_tokens,
       array_join(chunk, ' ') AS chunk_text
FROM (
  SELECT doc_id, c.chunk_id,
         slice(tokens, c.chunk_id * {_CHUNK_S} + 1, {_CHUNK_W}) AS chunk
  FROM (SELECT doc_id, {_TOK_SPARK} AS tokens FROM documents) t
  LATERAL VIEW explode(sequence(0,
    CAST(ceil(CAST(greatest(size(tokens) - {_CHUNK_W}, 0) AS DOUBLE)
              / {_CHUNK_S}) AS INT))) c AS chunk_id) s
ORDER BY doc_id, chunk_id
""",
    f"""
SELECT doc_id, chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM (
  SELECT doc_id, chunk_id,
         list_slice(tokens, chunk_id * {_CHUNK_S} + 1,
                    chunk_id * {_CHUNK_S} + {_CHUNK_W}) AS chunk
  FROM (
    SELECT doc_id, tokens,
           unnest(range(0, CAST(ceil(CAST(greatest(len(tokens) - {_CHUNK_W}, 0) AS DOUBLE)
                                     / {_CHUNK_S}) AS INT) + 1)) AS chunk_id
    FROM (SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents) t) u) s
ORDER BY doc_id, chunk_id
""",
)

# --- GPT-style sequence packing (concat-and-chunk training windows) ----------
# Per doc: which fixed-budget training window its first/last token lands in
# when the whole corpus is concatenated in doc_id order.  All-integer
# arithmetic (window DIV/MOD over exact token cumsums) — bit-exact across
# engines.  The oracle-scale twin uses one global cumsum window; the
# PRODUCTION builder (textops.pack_sequences) computes the identical cumsum
# as a two-phase bucket prefix sum so no single-partition window ever sees
# the corpus (pinned row-identical + plan-shape in tests/test_textops.py).
_PACK_BUDGET = 128
_dual(
    "pack_sequences",
    f"""
WITH toks AS (
  SELECT doc_id, CAST(size({_TOK_SPARK}) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM toks)
SELECT doc_id, n_tokens,
       CAST(cum_before DIV {_PACK_BUDGET} AS BIGINT) AS start_seq,
       CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS start_off,
       CAST(CASE WHEN n_tokens = 0 THEN cum_before DIV {_PACK_BUDGET}
                 ELSE (cum_before + n_tokens - 1) DIV {_PACK_BUDGET}
            END AS BIGINT) AS end_seq
FROM cum
ORDER BY doc_id
""",
    f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM toks)
SELECT doc_id, n_tokens,
       CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS start_seq,
       CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS start_off,
       CAST(CASE WHEN n_tokens = 0 THEN cum_before // {_PACK_BUDGET}
                 ELSE (cum_before + n_tokens - 1) // {_PACK_BUDGET}
            END AS BIGINT) AS end_seq
FROM cum
ORDER BY doc_id
""",
)

# --- n-gram decontamination (train/eval overlap check) ------------------------
# The GPT-3-style decontamination shape: flag training documents sharing any
# 5-token shingle with the benchmark/eval set (here: docs 0..9 stand in as
# the eval set; the corpus is everyone else).  Scale shape: the eval shingle
# set is small -> broadcast semi-join against the corpus shingles; one
# shuffle on the corpus side only.
_SHINGLE5_SPARK = (
    "CASE WHEN size(tokens) >= 5 THEN "
    "transform(sequence(0, size(tokens) - 5), "
    "i -> concat_ws(' ', slice(tokens, i + 1, 5))) "
    "ELSE array(concat_ws(' ', tokens)) END"
)
_SHINGLE5_DUCK = (
    "CASE WHEN len(tokens) >= 5 THEN "
    "list_transform(range(1, len(tokens) - 3), "
    "i -> array_to_string(list_slice(tokens, i, i + 4), ' ')) "
    "ELSE [array_to_string(tokens, ' ')] END"
)
_dual(
    "decontaminate",
    f"""
SELECT c.doc_id,
       CAST(count(b.sh) AS BIGINT) AS n_contaminated_ngrams,
       count(b.sh) > 0 AS contaminated
FROM (
  SELECT doc_id, sh FROM (
    SELECT doc_id, explode({_SHINGLE5_SPARK}) AS sh
    FROM (SELECT doc_id, {_TOK_SPARK} AS tokens FROM documents
          WHERE doc_id >= 10))
  GROUP BY doc_id, sh) c
LEFT JOIN (
  SELECT DISTINCT explode({_SHINGLE5_SPARK}) AS sh
  FROM (SELECT {_TOK_SPARK} AS tokens FROM documents WHERE doc_id < 10)) b
  ON c.sh = b.sh
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
    f"""
SELECT c.doc_id,
       CAST(count(b.sh) AS BIGINT) AS n_contaminated_ngrams,
       count(b.sh) > 0 AS contaminated
FROM (
  SELECT doc_id, sh FROM (
    SELECT doc_id, unnest({_SHINGLE5_DUCK}) AS sh
    FROM (SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents
          WHERE doc_id >= 10) a) u
  GROUP BY doc_id, sh) c
LEFT JOIN (
  SELECT DISTINCT unnest({_SHINGLE5_DUCK}) AS sh
  FROM (SELECT {_TOK_DUCK} AS tokens FROM documents WHERE doc_id < 10) a2) b
  ON c.sh = b.sh
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)

# --- similarity search oracle ------------------------------------------------
# Zero-norm/NULL vectors are excluded at the SOURCE of every cosine query in
# BOTH dialects (textops._nonzero is the builder-side mirror): cosine is
# undefined for them, Spark 4 ANSI raises DIVIDE_BY_ZERO on the 0/0 (doubles
# included) while DuckDB returns NULL and silently filters.  The predicate is
# exact and summation-order-independent (sum of float32-component squares in
# double is 0 iff all components are ±0), so both engines agree on who is
# excluded.  Found by the embeddings cross-engine fuzz (round 4).
_NZ_SPARK = (
    "(embedding IS NOT NULL AND "
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0)"
)
_NZ_DUCK = (
    "(embedding IS NOT NULL AND "
    "list_dot_product(CAST(embedding AS DOUBLE[]), "
    "CAST(embedding AS DOUBLE[])) > 0)"
)
_dual(
    "ann_bruteforce_topk",
    f"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       round(sim, 6) AS cos_sim
FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         aggregate(zip_with(q.qe, e.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
            * sqrt(aggregate(transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) AS sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY aggregate(zip_with(q.qe, e.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                                               CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                                     / (sqrt(aggregate(transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                                       CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                                        * sqrt(aggregate(transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) DESC,
                                     e.vec_id ASC) AS rank
  FROM (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        WHERE vec_id < 10 AND {_NZ_SPARK}) q
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_SPARK}) e
    ON e.vec_id <> q.query_id) s
WHERE rank <= 5
ORDER BY query_id, rank
""",
    f"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       round(sim, 6) AS cos_sim
FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                                     / (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))
                                        * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                                     e.vec_id ASC) AS rank
  FROM (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        WHERE vec_id < 10 AND {_NZ_DUCK}) q
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_DUCK}) e
    ON e.vec_id <> q.query_id) s
WHERE rank <= 5
ORDER BY query_id, rank
""",
)

# --- multi-probe hyperplane-LSH ANN oracle -------------------------------------
# The hyperplanes are deterministic md5-derived float64 LITERALS, and the
# bucket sign computation below folds the dot product in the SAME sequential
# order as Spark's aggregate() — identical IEEE operations, so bucket
# assignments match bit-for-bit (probed: 500/500 at sf0.001).  Scoring and
# ranking reuse the proven bruteforce-oracle formulation.


def _lsh_plane_literal(p: int, dim: int = 64) -> str:
    # one source of truth for the plane constants: textops.lsh_plane_component
    # feeds both the Spark bucket expressions and these oracle literals
    from newsspark.textops import lsh_plane_component

    return (
        "["
        + ", ".join(repr(lsh_plane_component(p, j)) for j in range(dim))
        + "]"
    )


def _lsh_bucket_duck(vec: str, n_planes: int = 8) -> str:
    def dot(p):
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(CAST({vec} AS DOUBLE[]), "
            f"{_lsh_plane_literal(p)}), x -> x[1] * x[2])), "
            "(acc, v) -> acc + v)"
        )

    return " | ".join(
        f"(CAST(CASE WHEN {dot(p)} >= 0 THEN 1 ELSE 0 END AS BIGINT) "
        f"<< {n_planes - 1 - p})"
        for p in range(n_planes)
    )


DUCK_SQL["ann_lsh_topk"] = f"""
WITH tagged AS (
  SELECT vec_id, embedding, {_lsh_bucket_duck('embedding')} AS bucket
  FROM embeddings WHERE {_NZ_DUCK}
), probes AS (
  SELECT vec_id AS query_id, embedding AS qe,
         unnest([CAST(0 AS BIGINT), {", ".join(f"CAST({1 << i} AS BIGINT)" for i in range(8))}]) AS off
  FROM tagged WHERE vec_id < 10
), q AS (
  SELECT p.query_id, p.qe, xor(t.bucket, p.off) AS qbucket
  FROM probes p JOIN tagged t ON t.vec_id = p.query_id
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS sim
  FROM q JOIN tagged e
    ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       round(sim, 6) AS cos_sim
FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored) s
WHERE rank <= 5
ORDER BY query_id, rank
"""

# --- fixed-centroid IVF ANN oracle -------------------------------------------
# ann_ivf_topk's driver entry runs textops.ann_ivf_topk_fixed: deterministic
# md5-derived centroid LITERALS (textops.ivf_fixed_centroid_component — the
# single source of truth for both engines) and sequential-fold assignment
# scores, so DuckDB replays assign -> probe -> cosine-rank exactly.  ||c||²
# is precomputed in Python and injected as a literal into BOTH engines so
# neither re-derives it with its own summation order.  The trained-k-means
# production path (ivf_train/ivf_index/ann_ivf_topk) stays recall-pinned in
# pytest.


def _ivf_cents_values(n_centroids: int = 16, dim: int = 64) -> str:
    from newsspark.textops import (
        ivf_fixed_centroid_component,
        ivf_fixed_centroid_sq,
    )

    rows = []
    for c in range(n_centroids):
        vec = ", ".join(
            repr(ivf_fixed_centroid_component(c, j)) for j in range(dim)
        )
        rows.append(
            f"({c}, CAST([{vec}] AS DOUBLE[]), "
            f"CAST({ivf_fixed_centroid_sq(c, dim)!r} AS DOUBLE))"
        )
    return ",\n    ".join(rows)


DUCK_SQL["ann_ivf_topk"] = f"""
WITH cents(cell, cv, c_sq) AS (
  VALUES
    {_ivf_cents_values()}
), scored AS (
  SELECT e.vec_id, e.embedding, c.cell,
         c.c_sq - 2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv),
                            x -> x[1] * x[2])), (acc, v) -> acc + v) AS score
  FROM (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_DUCK}) e
  CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score ASC, cell ASC) AS rn
    FROM scored) s WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, embedding AS qe, cell AS qcell FROM (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score ASC, cell ASC) AS rn
    FROM scored WHERE vec_id < 10) s WHERE rn <= 4
), cand AS (
  SELECT p.query_id, p.qe, a.vec_id AS neighbor_id, a.embedding AS ne,
         list_dot_product(CAST(p.qe AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(p.qe AS DOUBLE[]), CAST(p.qe AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS sim
  FROM assigned a JOIN probes p
    ON a.cell = p.qcell AND a.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       round(sim, 6) AS cos_sim
FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM cand) s
WHERE rank <= 5
ORDER BY query_id, rank
"""

# LSH-bucketed near-dup pairs: same exact-bucket-parity technique, 6 planes
# + Hamming-1 multi-probe, pair set deduplicated, rounded-sim threshold.
DUCK_SQL["dedup_embedding_cosine_lsh"] = f"""
WITH tagged AS (
  SELECT vec_id, embedding, {_lsh_bucket_duck('embedding', 6)} AS bucket
  FROM embeddings WHERE {_NZ_DUCK}
), probes AS (
  SELECT vec_id AS vb, embedding AS eb,
         unnest([bucket, {", ".join(f"xor(bucket, CAST({1 << i} AS BIGINT))" for i in range(6))}]) AS pbucket
  FROM tagged
), pairs AS (
  SELECT DISTINCT t.vec_id AS vec_a, t.embedding AS ea, p.vb AS vec_b, p.eb
  FROM tagged t JOIN probes p
    ON t.bucket = p.pbucket AND t.vec_id < p.vb
)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT vec_a, vec_b,
         round(list_dot_product(CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(ea AS DOUBLE[]), CAST(ea AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(eb AS DOUBLE[]), CAST(eb AS DOUBLE[])))), 6) AS cos_sim
  FROM pairs) s
WHERE cos_sim >= 0.45
ORDER BY vec_a, vec_b
"""

# --- relational demonstrations (TPC-H-shaped) ---------------------------------
_both(
    "tpch_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)

_both(
    "join_orders_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
""",
)

_both(
    "events_hourly",
    """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR(32)) AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
""",
)

# --- embedding-cosine near-dup (exact baseline; LSH variant is rows-only) ----
_dual(
    "dedup_embedding_cosine",
    f"""
SELECT vec_a, vec_b, round(sim, 6) AS cos_sim
FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
            * sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) AS sim
  FROM (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_SPARK}) a
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_SPARK}) b
    ON a.vec_id < b.vec_id) s
WHERE round(sim, 6) >= 0.45
ORDER BY vec_a, vec_b
""",
    f"""
SELECT vec_a, vec_b, round(sim, 6) AS cos_sim
FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
  FROM (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_DUCK}) a
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE {_NZ_DUCK}) b
    ON a.vec_id < b.vec_id) s
WHERE round(sim, 6) >= 0.45
ORDER BY vec_a, vec_b
""",
)

# --- URL canonicalization (training-pipeline url-level dedup prep) ----------
# strip fragment, tracking params (utm_*, fbclid, gclid), default ports,
# trailing slash on path-only urls; lowercase scheme+host.
_URL_SYNTH = (
    "concat('HTTPS://News.Example-', CAST(doc_id % 7 AS VARCHAR(8)), "
    "'.COM:443/Story/', CAST(doc_id AS VARCHAR(16)), "
    "CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&utm_medium=rss&id=' "
    "|| CAST(doc_id % 13 AS VARCHAR(8)) ELSE '/' END, "
    "CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END)"
)
_dual(
    "url_canonicalize",
    rf"""
SELECT doc_id, url,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             replace(regexp_replace(lower(url), '#.*$', ''), ':443/', '/'),
             '(utm_[a-z]+|fbclid|gclid)=[^&]*', ''),
           '\?&+|&&+|\?$', '?'),
         '\?$|&$|/$', '') AS canonical_url
FROM (SELECT doc_id, {_URL_SYNTH} AS url FROM documents) t
ORDER BY doc_id
""",
    rf"""
SELECT doc_id, url,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             replace(regexp_replace(lower(url), '#.*$', '', 'g'), ':443/', '/'),
             '(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
           '\?&+|&&+|\?$', '?', 'g'),
         '\?$|&$|/$', '', 'g') AS canonical_url
FROM (SELECT doc_id, {_URL_SYNTH} AS url FROM documents) t
ORDER BY doc_id
""",
)

# --- per-host corpus stats (the groupBy a crawl pipeline always needs) -------
_HOST_SYNTH = (
    "concat('https://', CASE WHEN doc_id % 5 = 0 THEN 'news.naver.com' "
    "ELSE concat('host', CAST(doc_id % 11 AS VARCHAR(8)), '.example.org') END, "
    "'/a/', CAST(doc_id AS VARCHAR(16)))"
)
_both(
    "host_stats",
    rf"""
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM (
  SELECT regexp_extract({_HOST_SYNTH}, '^https?://([^/]+)/', 1) AS host,
         n_chars
  FROM documents) t
GROUP BY host
ORDER BY host
""",
)

# The SALTED variant: the queries() entry runs textops.host_stats_salted
# (explicit pmod-salt -> partial -> final two-phase over the same host
# projection); count/sum/max are algebraic, so the salted re-bracketing is
# exactly the plain aggregation — the oracle IS the unsalted query.
HOST_PROJECTION = f"regexp_extract({_HOST_SYNTH}, '^https?://([^/]+)/', 1)"
DUCK_SQL["host_stats_salted"] = DUCK_SQL["host_stats"]

# --- the extraction cascade itself, oracled via the frozen golden corpus ----
# The engines are not SQL-expressible, but their output over the FIXED golden
# input is: tests/fixtures/golden/articles.jsonl holds the pure-Python
# cascade's output for pages built from sf0.001 doc_ids 0..499, and the
# queries() entry runs the Spark cascade over that same input — so the
# driver's DuckDB side just projects the golden file.  Explicit column types
# stop read_json from inferring 'date' as a DATE.
_GOLDEN_VIEW = f"""read_json('{_os.path.join(_FIXTURE_DIR, "articles.jsonl")}',
               format = 'newline_delimited',
               columns = {{url: 'VARCHAR', title: 'VARCHAR', date: 'VARCHAR',
                          method: 'VARCHAR', error: 'VARCHAR',
                          images: 'VARCHAR[]', text: 'VARCHAR'}})"""

DUCK_SQL["extract_cascade"] = f"""
SELECT url, title, "date", method, error,
       CAST(len(images) AS BIGINT) AS n_images,
       CAST(length(text) AS BIGINT) AS text_len
FROM {_GOLDEN_VIEW}
ORDER BY url
"""

# rules path and the WARC source path must both reproduce the frozen
# cascade byte-for-byte
DUCK_SQL["extract_with_rules_join"] = DUCK_SQL["extract_cascade"]
DUCK_SQL["extract_from_warc"] = DUCK_SQL["extract_cascade"]

# A4 payload parity: the reference serializes each article as JSON with
# ensure_ascii=False (main.py:642-644); Spark's to_json(ignoreNullFields=
# false) and DuckDB's to_json(struct_pack(...)) produce byte-identical
# compact JSON (probed: Korean text, newlines, quotes, backslashes, control
# chars, emoji, nulls, empty arrays all match), so the API payload itself
# is oracle-checked against the golden corpus.
DUCK_SQL["api_payload_json"] = f"""
SELECT url,
       CAST(to_json(struct_pack(
         url := url, title := title, text := text, "date" := "date",
         images := images, method := method, error := error)) AS VARCHAR)
         AS payload
FROM {_GOLDEN_VIEW}
ORDER BY url
"""

DUCK_SQL["extract_metrics"] = f"""
SELECT method,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN error IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       CAST(sum(length(text)) AS BIGINT) AS text_chars
FROM {_GOLDEN_VIEW}
GROUP BY method
ORDER BY method
"""

# --- multimodal metadata decode: DuckDB replays the generator case table ----
# media_df payloads (newsspark/multimodal.py) are pure functions of media_id
# (kind by i%4, dims by i%17/i%11, real-format planting by i%9 / i%8 / i%5,
# truncation by i%50==7), and _decode_one's outcome per case is deterministic
# — so the metadata projection of media_decode has an exact SQL twin.  The
# byte-statistics columns (mean_byte, entropy: LCG-dependent) stay
# pytest-only — EXCEPT mean_pixel: the sel==0 images are binary PPMs whose
# pixel plane is the gradient (byte_index + media_id) % 256, a REAL full
# pixel decode on the Spark side whose mean DuckDB replays in closed form:
# sum of (j % 256) over j in [s, s+n) = F(s+n) - F(s) with
# F(t) = (t // 256) * 32640 + r*(r-1)/2, r = t % 256 — all-integer, then one
# exact double division, so the hash matches bit-for-bit.
_PPM_CUMSUM = "(({t}) // 256) * 32640 + (({t}) % 256) * ((({t}) % 256) - 1) // 2"
DUCK_SQL["media_decode"] = f"""
WITH base AS (
  SELECT doc_id AS i,
         CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              WHEN 2 THEN 'video' ELSE 'image' END AS kind,
         (doc_id % 50 = 7) AS trunc,
         doc_id % 9 AS sel, doc_id % 8 AS a8, doc_id % 5 AS v5,
         CAST(320 + (doc_id % 17) * 16 AS INTEGER) AS w,
         CAST(240 + (doc_id % 11) * 16 AS INTEGER) AS h,
         CAST(24 + (doc_id % 17) * 2 AS INTEGER) AS wp,
         CAST(16 + (doc_id % 11) * 2 AS INTEGER) AS hp,
         CAST(20 + (doc_id % 17) * 2 AS INTEGER) AS wg,
         CAST(14 + (doc_id % 11) * 2 AS INTEGER) AS hg,
         CAST(22 + (doc_id % 17) * 2 AS INTEGER) AS wq,
         CAST(15 + (doc_id % 11) * 2 AS INTEGER) AS hq,
         CAST(18 + (doc_id % 17) * 2 AS INTEGER) AS wv,
         CAST(13 + (doc_id % 11) * 2 AS INTEGER) AS hv,
         CAST(8 * (3 + doc_id % 5) AS INTEGER) AS wj,
         CAST(8 * (2 + doc_id % 3) AS INTEGER) AS hj,
         CAST(4 + 2 * (doc_id % 3) AS INTEGER) AS nfg,
         CAST(24 * (1 + doc_id % 8) AS INTEGER) AS nf,
         doc_id % 256 AS s
  FROM documents),
ppm AS (
  SELECT i, wp * hp * 3 AS n, wg * hg AS ng, wq * hq * 3 AS nq,
         wv * hv AS nv, (wj // 8) * (hj // 8) AS nbj, s
  FROM base)
SELECT b.i AS media_id, kind,
       CASE WHEN trunc THEN NULL
            WHEN kind = 'image' AND sel = 0 THEN wp
            WHEN kind = 'image' AND sel = 2 THEN wj
            WHEN kind = 'image' AND sel = 5 THEN wq
            WHEN kind = 'image' AND sel = 8 THEN wg
            WHEN kind = 'image' THEN w
            WHEN kind = 'video' AND v5 = 2 THEN 640
            WHEN kind = 'video' AND v5 = 4 THEN wv
            WHEN kind = 'video' THEN 160
            END AS width,
       CASE WHEN trunc THEN NULL
            WHEN kind = 'image' AND sel = 0 THEN hp
            WHEN kind = 'image' AND sel = 2 THEN hj
            WHEN kind = 'image' AND sel = 5 THEN hq
            WHEN kind = 'image' AND sel = 8 THEN hg
            WHEN kind = 'image' THEN h
            WHEN kind = 'video' AND v5 = 2 THEN 360
            WHEN kind = 'video' AND v5 = 4 THEN hv
            WHEN kind = 'video' THEN 120
            END AS height,
       CASE WHEN kind = 'audio' AND NOT trunc THEN 16000 END AS sample_rate,
       -- FVID fakes carry declared counts; animated gifs (v5=4) the REAL
       -- demuxed frame count nfg = 4 + 2*(i%3)
       CASE WHEN kind = 'video' AND v5 NOT IN (2, 4) AND NOT trunc THEN nf
            WHEN kind = 'video' AND v5 = 4 AND NOT trunc THEN nfg
            END AS n_frames,
       -- REAL mp4 rows: mvhd duration replayed (timescale 1000, fps 24,
       -- nf = 24*(1+i%8) -> exactly 1000*(1+i%8) ms); animated gifs: the
       -- sum of their 250ms GCE delays
       CASE WHEN kind = 'video' AND v5 = 2 AND NOT trunc
            THEN CAST((nf * 1000) // 24 AS INTEGER)
            WHEN kind = 'video' AND v5 = 4 AND NOT trunc
            THEN CAST(nfg * 250 AS INTEGER) END AS duration_ms,
       -- PPM rows decode the raw RGB gradient plane (n = w*h*3 bytes);
       -- JPEG rows Huffman-decode DC-only blocks whose flat values are
       -- the gradient over nbj = (w/8)*(h/8) blocks (uniform 64px each,
       -- so the pixel mean equals the block mean);
       -- PNG rows inflate+unfilter the SAME RGB gradient (nq = w*h*3);
       -- GIF rows LZW-decode the INDEX gradient (ng = w*h indices) whose
       -- grayscale palette (k,k,k) makes the RGB mean equal the index
       -- mean — same cycle-sum closed form, one exact double division
       CASE WHEN kind = 'image' AND sel = 0 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="p.s + p.n")})
              - ({_PPM_CUMSUM.format(t="p.s")}) AS DOUBLE) / p.n
         WHEN kind = 'image' AND sel = 2 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="p.s + p.nbj")})
              - ({_PPM_CUMSUM.format(t="p.s")}) AS DOUBLE) / p.nbj
         WHEN kind = 'image' AND sel = 5 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="p.s + p.nq")})
              - ({_PPM_CUMSUM.format(t="p.s")}) AS DOUBLE) / p.nq
         WHEN kind = 'image' AND sel = 8 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="p.s + p.ng")})
              - ({_PPM_CUMSUM.format(t="p.s")}) AS DOUBLE) / p.ng
         -- animated-gif videos: FIRST decoded frame's index gradient
         WHEN kind = 'video' AND v5 = 4 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="p.s + p.nv")})
              - ({_PPM_CUMSUM.format(t="p.s")}) AS DOUBLE) / p.nv
         END AS mean_pixel,
       -- WAV rows (a8==1): 2003 gradient int16 samples ((k+s)%256 - 128);
       -- 2003 is prime so the mean never collapses to the 256-cycle
       -- constant; exact integer sum then ONE double division == np.mean
       CASE WHEN kind = 'audio' AND a8 = 1 AND NOT trunc THEN
         CAST(({_PPM_CUMSUM.format(t="b.s + 2003")})
              - ({_PPM_CUMSUM.format(t="b.s")}) - 128 * 2003 AS DOUBLE)
         / 2003
         END AS mean_sample,
       CASE
         WHEN trunc THEN CASE
           WHEN kind = 'image' AND sel IN (0, 2, 5) THEN 'ValueError' -- ppm/jpeg/png header cut
           WHEN kind = 'image' THEN 'error'                         -- gif/FIMG struct cut
           WHEN kind = 'audio' AND a8 = 1 THEN 'ValueError'         -- RIFF without WAVE
           WHEN kind = 'audio' THEN 'error'                         -- FAUD struct cut
           WHEN kind = 'video' AND v5 = 2 THEN 'ValueError'         -- mp4 magic cut -> unknown container
           ELSE 'error' END                                         -- FVID struct cut
         END AS error_kind
FROM base b JOIN ppm p ON p.i = b.i
ORDER BY media_id
"""

# frame sampling: FVID fakes sample frame INDICES (step = fps at
# every_ms=1000); real mp4 rows sample TIMESTAMPS over the box-walk
# duration (frame_idx NULL — no sample table is demuxed; a seek-based
# extractor works in time); animated-gif rows (v5=4) sample the REAL
# demuxed frames — the first frame at or after each 1000ms grid point,
# which with uniform 250ms GCE delays is every 4th index at its true
# display time f*250.  No video row is ever truncated (i%50==7 is odd,
# video ids are even), so no error branch exists in the case table.
DUCK_SQL["media_frame_sample"] = """
WITH vids AS (
  SELECT doc_id AS i, doc_id % 5 AS v5,
         24 * (1 + doc_id % 8) AS nf,
         4 + 2 * (doc_id % 3) AS nfg
  FROM documents WHERE doc_id % 4 = 2)
SELECT i AS media_id, CAST(NULL AS INTEGER) AS frame_idx,
       CAST(ts AS INTEGER) AS ts_ms,
       CAST(NULL AS VARCHAR) AS error
FROM vids, unnest(range(0, (nf * 1000) // 24, 1000)) AS t(ts)
WHERE v5 = 2
UNION ALL
SELECT i AS media_id, CAST(f AS INTEGER) AS frame_idx,
       CAST(f * 250 AS INTEGER) AS ts_ms,
       CAST(NULL AS VARCHAR) AS error
FROM vids, unnest(range(0, nfg, 4)) AS t(f)
WHERE v5 = 4
UNION ALL
SELECT i AS media_id, CAST(f AS INTEGER) AS frame_idx,
       CAST((f * 1000) // 24 AS INTEGER) AS ts_ms,
       CAST(NULL AS VARCHAR) AS error
FROM vids, unnest(range(0, nf, 24)) AS t(f)
WHERE v5 NOT IN (2, 4)
ORDER BY media_id, frame_idx, ts_ms
"""

# --- multimodal embed -> ANN: oracled via a frozen embedding fixture --------
# embed_media's vectors derive from an LCG byte stream SQL cannot replay, but
# they are a deterministic fixed point — so they get the golden-corpus trick:
# scripts/freeze_media_embeddings.py freezes embed_media(media_df(sf0.001))
# to jsonl (float32 components serialized as exact doubles), pytest pins the
# live output to the fixture, and DuckDB recomputes brute-force cosine top-k
# from the frozen vectors (same rank/tie/round rules as ann_bruteforce_topk).
_MEDIA_EMB_VIEW = f"""read_json('{_os.path.join(_FIXTURE_DIR, "media_embeddings.jsonl")}',
               format = 'newline_delimited',
               columns = {{vec_id: 'BIGINT', embedding: 'DOUBLE[]'}})"""

DUCK_SQL["media_embed_ann"] = f"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       round(sim, 6) AS cos_sim
FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qe, e.embedding)
         / (sqrt(list_dot_product(q.qe, q.qe))
            * sqrt(list_dot_product(e.embedding, e.embedding))) AS sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(q.qe, e.embedding)
                                     / (sqrt(list_dot_product(q.qe, q.qe))
                                        * sqrt(list_dot_product(e.embedding, e.embedding))) DESC,
                                     e.vec_id ASC) AS rank
  FROM (SELECT vec_id AS query_id, embedding AS qe FROM {_MEDIA_EMB_VIEW}
        WHERE vec_id < 5) q
  JOIN {_MEDIA_EMB_VIEW} e ON e.vec_id <> q.query_id) s
WHERE rank <= 3
ORDER BY query_id, rank
"""

# --- streaming url-dedup: the CONVERGED state is a pure function of doc_id --
# _stream_dedup_urls feeds two crawl waves (docs 0-199, then 100-299) through
# the stateful stream; the final per-url state is batching-invariant
# (n_dropped = occurrences - 1, one first_seen row per url), and the url
# itself replays pages._url_for/archetype_for in SQL — so even the streaming
# query gets an exact oracle.
_HOSTS_SQL = (
    "['news.example-daily.com','www.metro-herald.net','chronicle.example.org',"
    "'www.city-tribune.co.kr','daily-post.example.io',"
    "'the-observer.example.com','press.example.net','gazette.example.org']"
)
_DATE_URL = (
    "concat('https://', host, '/', CAST(2020 + i % 7 AS VARCHAR), '/', "
    "lpad(CAST(1 + i % 12 AS VARCHAR), 2, '0'), '/', "
    "lpad(CAST(1 + i % 28 AS VARCHAR), 2, '0'), '/article-', "
    "lpad(CAST(i AS VARCHAR), 6, '0'))"
)
DUCK_SQL["stream_dedup_urls"] = f"""
WITH d AS (
  SELECT doc_id AS i, (doc_id * 2654435761) % 100 AS slot
  FROM documents WHERE doc_id < 300
), b AS (
  SELECT i,
    CASE WHEN slot < 30 THEN 'rich_og'
         WHEN slot < 40 THEN 'no_meta_time_tag'
         WHEN slot < 42 THEN 'naver_like'
         WHEN slot < 52 THEN 'url_date_only'
         WHEN slot < 62 THEN 'sparse_title_elsewhere'
         WHEN slot < 70 THEN 'js_shell'
         WHEN slot < 78 THEN 'boilerplate_heavy'
         WHEN slot < 88 THEN 'image_zoo'
         WHEN slot < 95 THEN 'broken'
         ELSE 'multi_engine_merge' END AS arch
  FROM d
), u AS (
  SELECT i, arch,
    CASE WHEN arch = 'naver_like' THEN 'n.news.naver.com'
         ELSE {_HOSTS_SQL}[CAST((i // 3) % 8 AS INTEGER) + 1] END AS host
  FROM b
), urls AS (
  SELECT i,
    CASE
      WHEN arch = 'url_date_only' AND i % 2 = 0 THEN {_DATE_URL}
      WHEN arch = 'url_date_only' THEN
        concat('https://', host, '/2026/',
               lpad(CAST(13 + i % 80 AS VARCHAR), 2, '0'), '/',
               lpad(CAST(40 + i % 55 AS VARCHAR), 2, '0'), '/article-',
               lpad(CAST(i AS VARCHAR), 6, '0'))
      WHEN i % 2 = 0 AND arch <> 'multi_engine_merge' THEN {_DATE_URL}
      ELSE concat('https://', host, '/a/', CAST(i AS VARCHAR))
    END AS url
  FROM u)
SELECT url,
       CAST(CASE WHEN i BETWEEN 100 AND 199 THEN 1 ELSE 0 END AS BIGINT)
         AS n_dropped,
       CAST(1 AS BIGINT) AS n_first_rows
FROM urls
ORDER BY url
"""

# --- hash-dependent dedup ops: DuckDB twins over the md5-prefix 60-bit hash --
# The production paths in newsspark.textops use xxhash64 (no DuckDB
# equivalent); the queries() entries run hash_fn="md5_60" whose base hash —
# CAST(conv(substring(md5(x),1,15),16,10) AS BIGINT) in Spark, CAST('0x' ||
# substring(md5(x),1,15) AS BIGINT) in DuckDB — is engine-portable, so DuckDB
# can replay shingling, minhash, banding, and simhash votes EXACTLY.
# tests/test_textops.py proves the xxhash64 and md5_60 paths find the same
# verified duplicate pairs, closing the loop back to the production hash.


def _h60_duck(e: str) -> str:
    return f"CAST(concat('0x', substring(md5({e}), 1, 15)) AS BIGINT)"


def _duck_only(name: str, sql: str) -> None:
    DUCK_SQL[name] = sql


_N_HASHES, _BANDS = 16, 4
_RPB = _N_HASHES // _BANDS

# word-3-shingles of the token array (mirrors textops.shingles_col: DuckDB
# list_slice is inclusive-index, Spark slice is start+length)
_SHINGLES_DUCK = (
    "CASE WHEN len(tokens) >= 3 THEN "
    "list_transform(range(1, len(tokens) - 1), "
    "i -> array_to_string(list_slice(tokens, i, i + 2), ' ')) "
    "ELSE [array_to_string(tokens, ' ')] END"
)

_SIG_COLS = ",\n         ".join(
    "min({h}) AS h{s}".format(h=_h60_duck(f"concat('{s}:', sh)"), s=s)
    for s in range(_N_HASHES)
)
_BAND_ROWS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
        b=b,
        key=_h60_duck(
            "concat_ws(':', "
            + ", ".join(
                f"CAST(h{b * _RPB + i} AS VARCHAR)" for i in range(_RPB)
            )
            + ")"
        ),
    )
    for b in range(_BANDS)
)

_MINHASH_CTES = f"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents
), sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM toks
), sig AS (
  SELECT doc_id,
         {_SIG_COLS}
  FROM sh GROUP BY doc_id
), banded AS (
  {_BAND_ROWS}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

_duck_only(
    "dedup_minhash_lsh",
    _MINHASH_CTES + """
SELECT doc_a, doc_b FROM cands
ORDER BY doc_a, doc_b
""",
)

_VERIFIED_CTES = _MINHASH_CTES + """
, tsets AS (
  SELECT doc_id, list_distinct(tokens) AS tset FROM toks
), verified AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(ta.tset, tb.tset)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(ta.tset, tb.tset))) AS DOUBLE) AS j
  FROM cands
  JOIN tsets ta ON ta.doc_id = doc_a
  JOIN tsets tb ON tb.doc_id = doc_b
)"""

_duck_only(
    "dedup_pipeline",
    _VERIFIED_CTES + """
SELECT doc_a, doc_b, round(j, 6) AS jaccard
FROM verified WHERE j >= 0.8
ORDER BY doc_a, doc_b
""",
)

# --- duplicate-cluster components -> canonical keep list ----------------------
# Transitive closure over the verified pairs: every doc in a duplicate
# cluster gets component_id = min doc_id of the cluster; keep marks the
# canonical representative.  Spark runs iterative min-label propagation
# (textops.dedup_components); DuckDB replays it as a recursive CTE.
_duck_only(
    "dedup_components",
    _VERIFIED_CTES.replace("\nWITH ", "\nWITH RECURSIVE ", 1) + """
, kept AS (
  SELECT doc_a, doc_b FROM verified WHERE j >= 0.8
), e AS (
  SELECT doc_a, doc_b FROM kept
  UNION
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM kept
), verts AS (
  SELECT DISTINCT doc_a AS v FROM e
), reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.doc_b FROM reach r JOIN e ON e.doc_a = r.dst
)
SELECT src AS doc_id,
       CAST(min(dst) AS BIGINT) AS component_id,
       (src = min(dst)) AS keep
FROM reach
GROUP BY src
ORDER BY doc_id
""",
)

# 60-bit simhash: result-bit j = majority vote (ties -> 1) of bit j of the
# per-token md5-prefix hashes — identical packing to textops.simhash64's
# MSB-first fold.
_VOTE_COLS = ",\n         ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(60)
)
_PACK_EXPR = "\n       | ".join(
    f"(CAST(CASE WHEN s{j} >= 0 THEN 1 ELSE 0 END AS BIGINT) << {j})"
    for j in range(59, -1, -1)
)
_duck_only(
    "simhash64",
    f"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents
), tok AS (
  SELECT doc_id, unnest(tokens) AS t FROM toks
), h AS (
  SELECT doc_id, {_h60_duck('t')} AS h FROM tok
), v AS (
  SELECT doc_id,
         {_VOTE_COLS}
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       {_PACK_EXPR} AS simhash
FROM v ORDER BY doc_id
""",
)

# SimHash PAIRS: band the 60-bit fingerprint into 4x15-bit values, self-join
# on (band, value), verify with popcount(xor) <= 3.  Pigeonhole makes the
# banding recall EXACT for hamming <= 3 (one of 4 bands must be untouched).
# Replays textops.dedup_simhash_pairs(hash_fn='md5_60', pre_dedup_exact=
# False, max_bucket=None) — the guards are pytest-pinned, the oracle runs
# the unguarded semantics (the minhash pattern).
_duck_only(
    "dedup_simhash_pairs",
    f"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS tokens FROM documents
), tok AS (
  SELECT doc_id, unnest(tokens) AS t FROM toks
), h AS (
  SELECT doc_id, {_h60_duck('t')} AS h FROM tok
), v AS (
  SELECT doc_id,
         {_VOTE_COLS}
  FROM h GROUP BY doc_id
), sim AS (
  SELECT doc_id,
       {_PACK_EXPR} AS simhash
  FROM v
), bands AS (
  SELECT doc_id, simhash, CAST(b AS INTEGER) AS b,
         (simhash >> (CAST(b AS INTEGER) * 15)) & 32767 AS bv
  FROM sim, unnest(range(0, 4)) AS t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, p.doc_id AS doc_b,
         a.simhash AS sa, p.simhash AS sb
  FROM bands a JOIN bands p
    ON a.b = p.b AND a.bv = p.bv AND a.doc_id < p.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
""",
)

# --- skew-safe exact distinct per host (the SALTING pattern, SURVEY §4.2) ----
# The synthesized corpus gives news.naver.com 20% of all rows (doc_id%5=0) —
# a genuinely hot key.  A naive GROUP BY host + count(DISTINCT text) ships
# every (hot-host, text) pair to one reducer; the two-level shape below
# extends the hot key with the uniform content hash (salting by a natural
# uniform column), so shuffle 1 is uniform and shuffle 2 carries only one
# row per (host, distinct text).  Algebraic aggs (count/sum/max) don't need
# this — Spark partial-aggregates map-side — exact DISTINCT does.
_both(
    "host_distinct_stats",
    rf"""
SELECT host,
       CAST(count(*) AS BIGINT) AS n_distinct_texts,
       CAST(sum(n_copies) AS BIGINT) AS n_docs,
       CAST(max(n_copies) AS BIGINT) AS max_copies
FROM (
  SELECT host, md5(text) AS text_hash,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM (
    SELECT regexp_extract({_HOST_SYNTH}, '^https?://([^/]+)/', 1) AS host,
           text
    FROM documents) raw
  GROUP BY host, md5(text)) salted
GROUP BY host
ORDER BY host
""",
)

# --- deterministic hash sampling (the scalable Bernoulli sample) -------------
# Training pipelines sample by CONTENT-STABLE hash, never rand(): the same
# doc keeps/loses membership across reruns, engines, and cluster sizes, and
# the sample composes with resume (a re-run of a failed partition draws the
# same rows).  Map-only: no shuffle, no RNG state, pushes down to the scan.
_dual(
    "sample_hash_fraction",
    """
SELECT doc_id, lang,
       CAST(pmod(CAST(conv(substring(md5(concat('smp1:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT), 100) AS BIGINT) AS bucket
FROM documents
WHERE pmod(CAST(conv(substring(md5(concat('smp1:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT), 100) < 10
ORDER BY doc_id
""",
    """
SELECT doc_id, lang,
       CAST(CAST(concat('0x', substring(md5(concat('smp1:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100 AS BIGINT) AS bucket
FROM documents
WHERE CAST(concat('0x', substring(md5(concat('smp1:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100 < 10
ORDER BY doc_id
""",
)

# --- output shard manifest (training-data export sharding) -------------------
# The export step's accounting table: every doc is assigned a shard by the
# engine-portable CONTENT hash (pmod of the md5-60 prefix — reruns, engines
# and cluster sizes all agree), and the manifest reports per-shard doc /
# token / char mass.  Hash uniformity is what makes the 16 shards balanced;
# the manifest is how a pipeline VERIFIES that instead of assuming it.
# Map-side shard assignment pushes to the scan; one 16-group aggregation.
_dual(
    "shard_manifest",
    f"""
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(size({_TOK_SPARK}) AS BIGINT)) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM (
  SELECT text,
         CAST(pmod(CAST(conv(substring(md5(concat('shard:', text)), 1, 15), 16, 10) AS BIGINT), 16) AS BIGINT) AS shard
  FROM documents)
GROUP BY shard
ORDER BY shard
""",
    f"""
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(len({_TOK_DUCK}) AS BIGINT)) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM (
  SELECT text,
         CAST(CAST(concat('0x', substring(md5(concat('shard:', text)), 1, 15)) AS BIGINT) % 16 AS BIGINT) AS shard
  FROM documents) s
GROUP BY shard
ORDER BY shard
""",
)

# --- corpus vocabulary top-k (token frequency, two-level aggregation) --------
# The "word count" of LLM data work: explode -> count per token (partial
# aggregation map-side carries one row per distinct token per partition) ->
# global top-k with a total-order tie break on the token itself.
_dual(
    "vocab_topk",
    f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT explode({_TOK_SPARK}) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 100
""",
    f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest({_TOK_DUCK}) AS token FROM documents) t
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 100
""",
)

# --- per-host cap (domain-mix rebalancing) ------------------------------------
# Web corpora are host-skewed; training mixes cap each domain's contribution.
# Keep the top-N docs per host by quality proxy (n_chars desc, doc_id asc
# tie), i.e. one window ranking partitioned by the host key — the same
# shuffle the extraction already pays if the table is host-bucketed.
_both(
    "host_cap_topn",
    rf"""
SELECT doc_id, host, CAST(n_chars AS BIGINT) AS n_chars, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, host, n_chars,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM (
    SELECT doc_id, regexp_extract({_HOST_SYNTH}, '^https?://([^/]+)/', 1) AS host,
           n_chars
    FROM documents) t) s
WHERE rk <= 3
ORDER BY doc_id
""",
)

# --- sessionization over the events stream (gap > 30 min) --------------------
_both(
    "events_sessionize",
    """
SELECT user_id, session_num,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts) AS VARCHAR(32)) AS session_start,
       CAST(max(ts) AS VARCHAR(32)) AS session_end
FROM (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
  FROM (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     > INTERVAL '30' MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events) g) s
GROUP BY user_id, session_num
ORDER BY user_id, session_num
""",
)

# --- corpus-level line dedup (RefinedWeb/CCNet-style boilerplate removal) -----
# Drop every LINE that occurs in more than 10% of documents (nav bars,
# subscribe prompts, copyright footers survive HTML extraction as repeated
# lines; line-level frequency pruning is the standard web-corpus fix).  The
# documents fixture has no newlines, so the lined input is synthesized
# identically in both dialects: two text slices plus planted boilerplate
# (every 3rd doc a subscribe prompt, every 4th a copyright footer) and a
# semi-common tail shared by ~1/40th of the corpus — at any sf the prompts
# sit above the 10% threshold (removed) and the tails below it (kept).
# Scale shape (see textops.dedup_lines): the twin below joins frequencies
# back per line (fine at oracle scale); the PRODUCTION builder instead
# broadcasts the bounded removal set — AQE's skew split cannot fire on the
# join-back shape (freq side is a HashAggregate directly above its shuffle),
# so hot boilerplate keys never shuffle at all.  Threshold arithmetic is
# integer (n_docs * 10 <= n_total) so no float boundary can flip a row.
_LINED_SPARK = (
    "concat_ws(chr(10), substring(text, 1, 80), "
    "CASE WHEN doc_id % 3 = 0 "
    "THEN 'Subscribe to our newsletter for daily updates.' END, "
    "substring(text, 81, 80), "
    "CASE WHEN doc_id % 4 = 1 "
    "THEN '© Example Media Group. All rights reserved.' END, "
    "concat('share-tail ', CAST(doc_id % 40 AS STRING)))"
)
_LINED_DUCK = (
    "concat_ws(chr(10), substring(text, 1, 80), "
    "CASE WHEN doc_id % 3 = 0 "
    "THEN 'Subscribe to our newsletter for daily updates.' END, "
    "substring(text, 81, 80), "
    "CASE WHEN doc_id % 4 = 1 "
    "THEN '© Example Media Group. All rights reserved.' END, "
    "concat('share-tail ', CAST(doc_id % 40 AS VARCHAR(8))))"
)
_dual(
    "dedup_lines",
    f"""
WITH lined AS (
  SELECT doc_id, {_LINED_SPARK} AS t FROM documents),
lines AS (
  SELECT doc_id, pos, line
  FROM lined LATERAL VIEW posexplode(split(t, chr(10))) x AS pos, line),
freq AS (
  SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM lines GROUP BY line),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
SELECT doc_id,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       array_join(transform(array_sort(collect_list(
           CASE WHEN keep THEN named_struct('pos', pos, 'line', line) END)),
         s -> s.line), chr(10)) AS text_kept
FROM (
  SELECT l.doc_id, l.pos, l.line, f.n_docs * 10 <= t.n_total AS keep
  FROM lines l JOIN freq f ON l.line = f.line CROSS JOIN tot t) k
GROUP BY doc_id
ORDER BY doc_id
""",
    f"""
WITH lined AS (
  SELECT doc_id, {_LINED_DUCK} AS t FROM documents),
lines AS (
  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
           i -> {{'pos': i, 'line': ls[i]}})) AS u
    FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM lined) b) s),
freq AS (
  SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM lines GROUP BY line),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
SELECT doc_id,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE keep), '') AS text_kept
FROM (
  SELECT l.doc_id, l.pos, l.line, f.n_docs * 10 <= t.n_total AS keep
  FROM lines l JOIN freq f ON l.line = f.line CROSS JOIN tot t) k
GROUP BY doc_id
ORDER BY doc_id
""",
)

# --- temperature-resampled language mixture weights ---------------------------
# The multilingual data-mix op: per-language sampling weight proportional to
# n^alpha (alpha = 0.5), i.e. sqrt-temperature resampling that up-weights
# low-resource languages.  sqrt on an exact BIGINT is correctly rounded IEEE
# in both engines; the DENOMINATOR is the float trap (summation order), so
# both sides fold sqrt(n) in the SAME lang order: Spark aggregate() over the
# lang-sorted collect_list, DuckDB list_reduce over list(... ORDER BY lang)
# with the same 0.0 seed — the CLAUDE.md same-order-fold rule.
_dual(
    "mixture_weights",
    """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
d AS (SELECT aggregate(
        transform(array_sort(collect_list(named_struct('lang', lang,
                                                        'n', n_docs))),
                  s -> sqrt(CAST(s.n AS DOUBLE))),
        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS denom FROM c)
SELECT lang, n_docs,
       round(sqrt(CAST(n_docs AS DOUBLE)) / denom, 6) AS weight
FROM c CROSS JOIN d
ORDER BY lang
""",
    """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
d AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang)),
        (acc, x) -> acc + x) AS denom FROM c)
SELECT lang, n_docs,
       round(sqrt(CAST(n_docs AS DOUBLE)) / denom, 6) AS weight
FROM c CROSS JOIN d
ORDER BY lang
""",
)

# --- streaming hourly counts (watermark + append convergence oracle) ----------
# The Spark side (streaming.stream_hourly_counts via __spark_entry__) runs a
# watermarked tumbling-window aggregation in APPEND mode over event waves
# (base + late arrivals + a far-future sentinel that pushes the watermark
# past every real window, so each real window emits exactly once and the
# sentinel's own window never does).  The converged output is batching-
# invariant by construction, so DuckDB replays it as a plain hourly GROUP BY
# over the same deterministic event subset.
DUCK_SQL["stream_hourly_counts"] = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR(32)) AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
"""

# --- PDF layout parse (synthesize -> Flate/object/page-tree/text round trip) --
# The Spark side (pdfops.synth_pdf_table -> extract_pdf_table via
# __spark_entry__) builds one real PDF per documents row — Info-dict title
# "doc-<id>", body "<text> (doc <id>)" paginated at 200 chars, content
# streams rotating Tj / TJ-array / hex-string encodings and Flate-compressed
# for 2 of every 3 docs — then extracts it back with the from-scratch
# stdlib parser.  Synthesis is a pure function of (doc_id, text), so DuckDB
# replays the round trip as string arithmetic: chunk the body at 200 chars
# and rejoin with newlines.  Escaping (the paren suffix), both filter paths,
# all three string encodings, and the page-tree walk all sit inside the
# hash-checked path on every row.
DUCK_SQL["pdf_extract"] = """
WITH b AS (
  SELECT doc_id,
         text || ' (doc ' || CAST(doc_id AS VARCHAR) || ')' AS body
  FROM documents)
SELECT doc_id,
       'doc-' || CAST(doc_id AS VARCHAR) AS title,
       array_to_string(
         list_transform(
           range(0, greatest(1, CAST(ceil(length(body) / 200.0) AS BIGINT))),
           i -> substring(body, CAST(i * 200 + 1 AS INT), 200)),
         chr(10)) AS text,
       greatest(1, CAST(ceil(length(body) / 200.0) AS BIGINT)) AS n_pages
FROM b
ORDER BY doc_id
"""

# --- outlink extraction + crawl frontier (linkops.py) ------------------------
# The pdf_extract pattern again: synth_link_page builds one real HTML page
# per documents row (anchors rotating absolute / rooted-relative /
# protocol-relative / mailto / fragment-only, rel=nofollow every 7th), the
# Spark side parses the ACTUAL bytes (htmlite DOM + urljoin/urlsplit), and
# DuckDB replays the synthesis as string arithmetic — mailto/fragment
# anchors must vanish, relative forms must absolutize against the page url,
# and the frontier is a plain per-host aggregation over the same rows.
_LINK_ANCHORS_DUCK = """
  SELECT doc_id, CAST(j AS INTEGER) AS anchor_idx, j,
         (doc_id + j) % 5 AS kind,
         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS page_host
  FROM documents, unnest(range(0, 3 + doc_id % 4)) AS t(j)
"""
_LINK_ROWS_DUCK = f"""
WITH anchors AS ({_LINK_ANCHORS_DUCK}),
links AS (
  SELECT doc_id, anchor_idx,
    CASE kind
      WHEN 0 THEN 'https://h' || CAST((doc_id + j) % 5 AS VARCHAR)
                  || '.example.org/art/' || CAST(doc_id AS VARCHAR)
                  || '-' || CAST(j AS VARCHAR)
      WHEN 1 THEN '/sec' || CAST(j AS VARCHAR) || '/item-'
                  || CAST(doc_id AS VARCHAR) || '.html'
      ELSE '//cdn' || CAST(j % 3 AS VARCHAR) || '.example.net/r/'
                  || CAST(doc_id AS VARCHAR)
    END AS href_raw,
    CASE kind
      WHEN 0 THEN 'https://h' || CAST((doc_id + j) % 5 AS VARCHAR)
                  || '.example.org/art/' || CAST(doc_id AS VARCHAR)
                  || '-' || CAST(j AS VARCHAR)
      WHEN 1 THEN 'https://' || page_host || '/sec' || CAST(j AS VARCHAR)
                  || '/item-' || CAST(doc_id AS VARCHAR) || '.html'
      ELSE 'https://cdn' || CAST(j % 3 AS VARCHAR) || '.example.net/r/'
                  || CAST(doc_id AS VARCHAR)
    END AS href_abs,
    CASE kind
      WHEN 0 THEN 'h' || CAST((doc_id + j) % 5 AS VARCHAR) || '.example.org'
      WHEN 1 THEN page_host
      ELSE 'cdn' || CAST(j % 3 AS VARCHAR) || '.example.net'
    END AS target_host,
    CASE kind WHEN 0 THEN j % 5 = 0 WHEN 1 THEN TRUE ELSE FALSE
      END AS is_internal,
    (doc_id + j) % 7 = 0 AS is_nofollow
  FROM anchors WHERE kind <= 2)
"""
DUCK_SQL["extract_links"] = f"""
{_LINK_ROWS_DUCK}
SELECT doc_id, anchor_idx, href_raw, href_abs, target_host,
       is_internal, is_nofollow
FROM links
ORDER BY doc_id, anchor_idx
"""
DUCK_SQL["link_frontier"] = f"""
{_LINK_ROWS_DUCK}
SELECT target_host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ref_docs,
       CAST(sum(CASE WHEN is_nofollow THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nofollow
FROM links
GROUP BY target_host
ORDER BY target_host
"""


def _robots_rules_values() -> str:
    # one source of truth: linkops.default_robots_rules feeds both the
    # Spark dimension table and these oracle literals
    from newsspark.linkops import default_robots_rules

    return ",\n    ".join(
        f"('{h}', '{p}', {'TRUE' if a else 'FALSE'})"
        for h, p, a in default_robots_rules()
    )


# REP longest-match semantics replayed: per link, longest matching prefix
# wins, allow beats disallow at equal length, no match -> allowed.  A link
# with no matching rule keeps exactly one LEFT-JOIN row, so NULL ordering
# never decides a winner (same argument as the Spark window).
DUCK_SQL["robots_filter"] = f"""
{_LINK_ROWS_DUCK},
pathed AS (
  SELECT doc_id, anchor_idx, target_host,
         regexp_replace(href_abs, '^https?://[^/]+', '') AS path
  FROM links),
rules(host, prefix, allow) AS (
  VALUES
    {_robots_rules_values()}
),
matched AS (
  SELECT p.doc_id, p.anchor_idx, p.target_host, p.path,
         r.prefix, r.allow,
         row_number() OVER (
           PARTITION BY p.doc_id, p.anchor_idx
           ORDER BY coalesce(length(r.prefix), -1) DESC,
                    r.allow DESC, r.prefix) AS rn
  FROM pathed p LEFT JOIN rules r
    ON p.target_host = r.host AND starts_with(p.path, r.prefix))
SELECT doc_id, anchor_idx, target_host, path,
       coalesce(allow, TRUE) AS allowed,
       prefix AS matched_prefix
FROM matched WHERE rn = 1
ORDER BY doc_id, anchor_idx
"""

# The crawl stack composed: frontier aggregation over ONLY the
# robots-allowed links — the same longest-match replay as robots_filter
# (carrying is_nofollow through the argmax), filtered to allowed, then the
# same per-host aggregation as link_frontier.
DUCK_SQL["crawl_frontier_gated"] = f"""
{_LINK_ROWS_DUCK},
pathed AS (
  SELECT doc_id, anchor_idx, target_host, is_nofollow,
         regexp_replace(href_abs, '^https?://[^/]+', '') AS path
  FROM links),
rules(host, prefix, allow) AS (
  VALUES
    {_robots_rules_values()}
),
matched AS (
  SELECT p.doc_id, p.anchor_idx, p.target_host, p.is_nofollow,
         r.allow,
         row_number() OVER (
           PARTITION BY p.doc_id, p.anchor_idx
           ORDER BY coalesce(length(r.prefix), -1) DESC,
                    r.allow DESC, r.prefix) AS rn
  FROM pathed p LEFT JOIN rules r
    ON p.target_host = r.host AND starts_with(p.path, r.prefix)),
allowed AS (
  SELECT * FROM matched WHERE rn = 1 AND coalesce(allow, TRUE))
SELECT target_host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ref_docs,
       CAST(sum(CASE WHEN is_nofollow THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nofollow
FROM allowed
GROUP BY target_host
ORDER BY target_host
"""

# Politeness scheduling composed over the gated link set: distinct allowed
# (host, url) pairs ranked per host in md5-hash order (hex-prefix bucket
# order == md5-string order, so the Spark builder's bucket-composed rank
# equals this single global per-host rank), then waves of per_host_slots.
DUCK_SQL["crawl_schedule"] = f"""
{_LINK_ROWS_DUCK},
pathed AS (
  SELECT doc_id, anchor_idx, target_host, href_abs,
         regexp_replace(href_abs, '^https?://[^/]+', '') AS path
  FROM links),
rules(host, prefix, allow) AS (
  VALUES
    {_robots_rules_values()}
),
matched AS (
  SELECT p.doc_id, p.anchor_idx, p.target_host, p.href_abs, r.allow,
         row_number() OVER (
           PARTITION BY p.doc_id, p.anchor_idx
           ORDER BY coalesce(length(r.prefix), -1) DESC,
                    r.allow DESC, r.prefix) AS rn
  FROM pathed p LEFT JOIN rules r
    ON p.target_host = r.host AND starts_with(p.path, r.prefix)),
urls AS (
  SELECT target_host, href_abs AS url,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ref_docs
  FROM matched WHERE rn = 1 AND coalesce(allow, TRUE)
  GROUP BY target_host, href_abs),
ranked AS (
  SELECT target_host, url, n_ref_docs,
         CAST(row_number() OVER (
           PARTITION BY target_host ORDER BY md5(url), url) - 1
           AS BIGINT) AS slot
  FROM urls)
SELECT target_host, url, n_ref_docs, slot,
       CAST(slot // 2 AS BIGINT) AS wave
FROM ranked
ORDER BY target_host, slot
"""


# --- unigram-LM log-prob quality buckets (CCNet-style stratification) ---------
# Train a unigram language model ON the corpus itself (token -> corpus
# frequency), score every document by mean token log-probability, and cut
# the corpus into terciles (head / middle / tail) with ntile — the CCNet
# quality-stratification shape, with the corpus LM standing in for the
# external KenLM.  Float discipline: ln is NOT guaranteed bit-identical
# across engines (JVM StrictMath vs C libm disagree by 1 ulp on some
# arguments — found by the cross-engine fuzz, not by the fixture corpus),
# so every cross-engine comparison happens on round(...,6) values,
# INCLUDING the ntile sort key below; the per-doc SUM is the order trap, so
# both sides fold token log-probs in POSITION order with the same 0.0 seed
# (Spark aggregate over the pos-sorted collect_list; DuckDB list_reduce
# over list(... ORDER BY pos)).
# ntile orders by the ROUNDED mean with doc_id as total-order tiebreak
# (sorting on the unrounded mean was the 1-ulp flip the fuzz caught).  Scale shape: one token-agg shuffle for the LM (tiny — vocab
# scale), broadcast-join the LM back, one groupBy doc_id; the LM table at
# web scale is millions of rows, still broadcastable after a min-count cut.
# The final ntile is a GLOBAL total order (one sorted partition) — correct
# for the oracle, but at 100 TB the production cut uses the two-pass
# distributed-selection pattern instead (find the n/3 and 2n/3 order
# statistics via a score-histogram pass, then bucket map-side — the same
# machinery as textops.stratified_sample's hash-prefix selection).
_dual(
    "unigram_logprob_buckets",
    """
WITH toks AS (
  SELECT doc_id, pos, tok
  FROM documents LATERAL VIEW posexplode(split(text, ' ')) x AS pos, tok),
lm AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
scored AS (
  SELECT t.doc_id, t.pos, ln(CAST(l.n AS DOUBLE) / tt.n_total) AS lp
  FROM toks t JOIN lm l ON t.tok = l.tok CROSS JOIN tot tt),
perdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         aggregate(
           transform(array_sort(collect_list(named_struct('pos', pos,
                                                          'lp', lp))),
                     s -> s.lp),
           CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / count(*) AS avg_lp
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(avg_lp, 6) AS avg_logprob,
       CAST(ntile(3) OVER (ORDER BY round(avg_lp, 6), doc_id) AS BIGINT)
         AS bucket
FROM perdoc
ORDER BY doc_id
""",
    """
WITH toks AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
           i -> {'pos': i, 'tok': ls[i]})) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS ls FROM documents) b) s),
lm AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
scored AS (
  SELECT t.doc_id, t.pos, ln(CAST(l.n AS DOUBLE) / tt.n_total) AS lp
  FROM toks t JOIN lm l ON t.tok = l.tok CROSS JOIN tot tt),
perdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(lp ORDER BY pos)),
                     (acc, x) -> acc + x) / count(*) AS avg_lp
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(avg_lp, 6) AS avg_logprob,
       CAST(ntile(3) OVER (ORDER BY round(avg_lp, 6), doc_id) AS BIGINT)
         AS bucket
FROM perdoc
ORDER BY doc_id
""",
)

# --- incremental ingest: snapshot-diff anti-join ------------------------------
# The daily-crawl shape: given yesterday's corpus snapshot and today's batch,
# admit only content-new documents (content hash not present in the
# snapshot).  The batch is synthesized deterministically from the corpus —
# every 3rd doc re-arrives byte-identical (a true re-crawl duplicate, must
# be dropped), the rest arrive with a ' v2' revision suffix (content-new,
# must pass).  Scale shape: hash the text once per side, LEFT ANTI JOIN on
# the digest — one shuffle on a uniform key; the two-tier membership check
# (bloom pre-filter before the shuffle) is Catalyst's own runtime
# bloom-filter join pruning (spark.sql.optimizer.runtime.bloomFilter.
# enabled, on by default in Spark 4) — no hand-rolled filter needed, the
# declarative anti-join IS the scale plan.
_dual(
    "incremental_new_docs",
    """
WITH corpus AS (SELECT md5(text) AS h FROM documents),
batch AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE concat(text, ' v2') END AS text
  FROM documents)
SELECT b.doc_id,
       CAST(length(b.text) AS BIGINT) AS n_chars,
       md5(b.text) AS content_hash
FROM batch b LEFT ANTI JOIN corpus c ON md5(b.text) = c.h
ORDER BY b.doc_id
""",
    """
WITH corpus AS (SELECT md5(text) AS h FROM documents),
batch AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE text || ' v2' END AS text
  FROM documents)
SELECT b.doc_id,
       CAST(length(b.text) AS BIGINT) AS n_chars,
       md5(b.text) AS content_hash
FROM batch b ANTI JOIN corpus c ON md5(b.text) = c.h
ORDER BY b.doc_id
""",
)

# --- as-of (point-in-time) join -----------------------------------------------
# Each click picks the user's LATEST purchase at-or-before the click time —
# the market-data / feature-store lookup Spark has no native operator for.
# Spark side: the merge-based union + per-key window carry (relops.asof_join
# is the DataFrame builder; this is its SQL transcription) — ONE hash
# shuffle, no pair explosion.  DuckDB side: the NATIVE ASOF JOIN.  Two
# unrelated physical strategies must produce identical rows, including the
# inclusive <= tie (right sorts before left at equal ts) and NULLs for
# clicks with no prior purchase.  The purchase side is pre-reduced to one
# row per (user_id, ts) so the carried value cannot depend on tie order on
# ANY corpus.
_dual(
    "asof_join",
    """
WITH lefts AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'click'),
rights AS (
  SELECT user_id, ts, max(value) AS rval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
u AS (
  SELECT user_id, ts, 1 AS is_left, event_id, value,
         CAST(NULL AS DOUBLE) AS rval, CAST(NULL AS TIMESTAMP) AS rts
  FROM lefts
  UNION ALL
  SELECT user_id, ts, 0 AS is_left, CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS DOUBLE) AS value, rval, ts AS rts
  FROM rights),
c AS (
  -- the matched right ROW carried as ONE struct (null only when no right
  -- row yet), so a NULL rval arrives as (its rts, NULL) exactly like
  -- DuckDB's native ASOF — independent per-column carries would pair the
  -- newest rts with an older non-null rval
  SELECT user_id, ts, is_left, event_id, value,
         last_value(CASE WHEN is_left = 0
                         THEN named_struct('rts', rts, 'rval', rval) END,
                    true) OVER w AS asof
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, CAST(ts AS STRING) AS ts, value,
       CAST(asof.rts AS STRING) AS purchase_ts, asof.rval AS purchase_value
FROM c WHERE is_left = 1
ORDER BY event_id
""",
    """
WITH lefts AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'click'),
rights AS (
  SELECT user_id, ts, max(value) AS rval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, CAST(l.ts AS VARCHAR) AS ts, l.value,
       CAST(r.ts AS VARCHAR) AS purchase_ts, r.rval AS purchase_value
FROM lefts l ASOF LEFT JOIN rights r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
""",
)

# --- banded range (interval) join ---------------------------------------------
# Every click paired with the same user's purchases within ±1 hour.  Spark
# side: the BANDED strategy (relops.range_join's SQL transcription) — left
# rows explode over the hour bins their window touches (constant fan-out),
# equi-join on (user, bin), exact predicate filter; one shuffle on a key
# FINER than user alone, so hot users spread across time bins.  DuckDB
# side: the plain inequality join.  Different physical strategies, same
# pair set; each right row sits in exactly one bin so the banded plan can
# never duplicate a pair.  ORDER BY carries r_value so tied (event_id,
# r_ts) rows are identical in every column (total-order audit rule).
_dual(
    "range_join",
    """
WITH lefts AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
rights AS (
  SELECT user_id, ts AS r_ts, value AS r_value
  FROM events WHERE event_type = 'purchase'),
lb AS (
  SELECT event_id, user_id, ts, value,
         explode(sequence(
           CAST(floor(unix_timestamp(ts - INTERVAL 1 HOUR) / 3600) AS BIGINT),
           CAST(floor(unix_timestamp(ts + INTERVAL 1 HOUR) / 3600) AS BIGINT)
         )) AS bin
  FROM lefts),
rb AS (
  SELECT user_id, r_ts, r_value,
         CAST(floor(unix_timestamp(r_ts) / 3600) AS BIGINT) AS bin
  FROM rights)
SELECT lb.event_id, lb.user_id, CAST(lb.ts AS STRING) AS ts,
       CAST(rb.r_ts AS STRING) AS r_ts, rb.r_value
FROM lb JOIN rb ON lb.user_id = rb.user_id AND lb.bin = rb.bin
WHERE rb.r_ts >= lb.ts - INTERVAL 1 HOUR
  AND rb.r_ts <= lb.ts + INTERVAL 1 HOUR
ORDER BY event_id, r_ts, r_value
""",
    """
WITH lefts AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
rights AS (
  SELECT user_id, ts AS r_ts, value AS r_value
  FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, CAST(l.ts AS VARCHAR) AS ts,
       CAST(r.r_ts AS VARCHAR) AS r_ts, r.r_value
FROM lefts l JOIN rights r ON l.user_id = r.user_id
  AND r.r_ts >= l.ts - INTERVAL 1 HOUR
  AND r.r_ts <= l.ts + INTERVAL 1 HOUR
ORDER BY event_id, r_ts, r_value
""",
)

# --- compression-ratio quality signal (zlib compressibility) ------------------
# The Spark side (textops.compression_ratio via __spark_entry__) zlib-
# compresses each document in a shuffle-free mapInPandas pass; DuckDB has no
# zlib, so the oracle replays the FROZEN fixture (the media-embeddings
# freeze contract): scripts/freeze_compression.py pins (doc_id, n_chars,
# comp_len) over the fixed sf0.001 documents table, DuckDB recomputes the
# ratio arithmetic (UNROUNDED exact-int division — one correctly rounded
# IEEE op, bit-identical; round(,6) would NOT be: pandas half-even vs
# DuckDB half-away disagree at exact ties like 93/128), and a
# pytest pins the live output to the fixture with no tolerance.
DUCK_SQL["compression_ratio"] = f"""
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(comp_len AS BIGINT) AS comp_len,
       CASE WHEN n_chars > 0
            THEN CAST(comp_len AS DOUBLE) / n_chars END AS ratio
FROM read_json('{_os.path.join(_FIXTURE_DIR, "compression.jsonl")}',
               columns={{'doc_id': 'BIGINT', 'n_chars': 'BIGINT',
                         'comp_len': 'BIGINT'}})
ORDER BY doc_id
"""

# --- end-to-end corpus curation (extraction feeding the training-data ops) ----
# The integrated product story as ONE query: cascade output -> drop failed
# rows -> exact-dedup by content hash (window, first-url representative) ->
# token/length stats -> keep/drop flag.  The Spark side runs the LIVE
# cascade over the frozen sf0.001 corpus and registers it as
# _curate_articles; DuckDB replays the identical curation SQL over the
# golden jsonl — so the extraction engines AND the downstream curation
# algebra are hash-checked as a single composed pipeline.  Scale shape: the
# cascade's one UDF pass, then one window shuffle on md5(text); stats are
# map-side expressions.
SPARK_SQL["curate_corpus"] = """
WITH ok AS (
  SELECT url, text, method FROM _curate_articles WHERE error IS NULL),
d AS (
  SELECT url, method, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY url) AS rn,
         count(*) OVER (PARTITION BY md5(text)) AS n_copies
  FROM ok),
s AS (
  SELECT url, method, CAST(n_copies AS BIGINT) AS n_copies,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(size(split(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
  FROM d WHERE rn = 1)
SELECT url, method, n_copies, n_chars, n_tokens,
       round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token,
       n_tokens >= 128 AND CAST(n_chars AS DOUBLE) / n_tokens <= 12.0 AS keep
FROM s
ORDER BY url
"""
DUCK_SQL["curate_corpus"] = f"""
WITH ok AS (
  SELECT url, text, method FROM {_GOLDEN_VIEW} WHERE error IS NULL),
d AS (
  SELECT url, method, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY url) AS rn,
         count(*) OVER (PARTITION BY md5(text)) AS n_copies
  FROM ok),
s AS (
  SELECT url, method, CAST(n_copies AS BIGINT) AS n_copies,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM d WHERE rn = 1)
SELECT url, method, n_copies, n_chars, n_tokens,
       round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token,
       n_tokens >= 128 AND CAST(n_chars AS DOUBLE) / n_tokens <= 12.0 AS keep
FROM s
ORDER BY url
"""

# --- stratified sampling (exact per-stratum quotas) ---------------------------
# Balanced data-mix sampling: take EXACTLY ceil(10%) of each language's
# docs, chosen by content-hash order — deterministic (no RNG), reproducible
# across runs/engines, and quota-exact where Bernoulli sampling
# (sample_hash_fraction) only hits the rate in expectation.  Scale shape:
# one window shuffle on the stratum key; the hash sort key spreads ties
# uniformly.  Quota arithmetic stays integer ((n+9)/10 floor = ceil(n/10))
# so no float boundary can flip a row.
_dual(
    "stratified_sample",
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(concat(text, CAST(doc_id AS STRING))),
                                     doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents)
SELECT doc_id, lang,
       CAST(rn AS BIGINT) AS sample_rank,
       CAST(n_lang AS BIGINT) AS n_lang
FROM ranked
WHERE rn * 10 <= n_lang + 9
ORDER BY doc_id
""",
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(text || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents)
SELECT doc_id, lang,
       CAST(rn AS BIGINT) AS sample_rank,
       CAST(n_lang AS BIGINT) AS n_lang
FROM ranked
WHERE rn * 10 <= n_lang + 9
ORDER BY doc_id
""",
)

# --- temperature resampling (sqrt up-weighting as an actual sampler) ---------
# Budget T = ceil(N/4) split across languages by sqrt(n_l)/sum(sqrt):
# quota_l = least(floor(T * sqrt(n_l) / denom), n_l); each stratum keeps its
# quota's hash-smallest docs.  Float discipline: denom folds sqrt(n) in LANG
# order on both engines (sqrt is correctly rounded -> identical folds), the
# quota is floor of ONE identical double expression, and T is integer
# ceil-division — no boundary can flip cross-engine.  The twin below ranks
# whole strata (oracle-scale); the production builder
# (textops.mixture_resample) routes through stratified_sample's two-pass
# selection with a quota table — same rows, no full-stratum sort.
_dual(
    "mixture_resample",
    """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
agg AS (
  SELECT aggregate(transform(array_sort(collect_list(named_struct('s', lang, 'n', n))),
           x -> sqrt(CAST(x.n AS DOUBLE))),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS denom,
         CAST(sum(n) AS BIGINT) AS n_total
  FROM counts),
q AS (
  SELECT lang, n,
         least(CAST(floor(((n_total * 1 + 3) DIV 4)
                          * sqrt(CAST(n AS DOUBLE)) / denom) AS BIGINT),
               n) AS quota
  FROM counts CROSS JOIN agg),
ranked AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY md5(concat(d.text, CAST(d.doc_id AS STRING))),
                    d.doc_id) AS rn,
         q.quota, q.n AS n_lang
  FROM documents d JOIN q ON d.lang = q.lang)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank,
       quota, n_lang
FROM ranked WHERE rn <= quota
ORDER BY doc_id
""",
    """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
agg AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)),
           (acc, x) -> acc + x) AS denom,
         CAST(sum(n) AS BIGINT) AS n_total
  FROM counts),
q AS (
  SELECT lang, n,
         least(CAST(floor(((n_total * 1 + 3) // 4)
                          * sqrt(CAST(n AS DOUBLE)) / denom) AS BIGINT),
               n) AS quota
  FROM counts CROSS JOIN agg),
ranked AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY md5(d.text || CAST(d.doc_id AS VARCHAR)),
                    d.doc_id) AS rn,
         q.quota, q.n AS n_lang
  FROM documents d JOIN q ON d.lang = q.lang)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank,
       quota, n_lang
FROM ranked WHERE rn <= quota
ORDER BY doc_id
""",
)

# --- corpus length profile (exact discrete percentiles per language) ----------
# Data-profiling: per-language doc-length distribution — n_docs, min/max,
# and EXACT discrete p50/p90 token counts.  Percentiles via integer rank
# arithmetic (rank == floor((k*n + k)/10) style), NOT the engines' builtin
# quantile functions, whose interpolation/rounding conventions differ
# (Spark percentile interpolates, DuckDB CAST(2.5 AS BIGINT) rounds-to-even
# — both cross-engine traps).  One window + one agg shuffle on lang.
_dual(
    "corpus_length_profile",
    """
WITH t AS (
  SELECT doc_id, lang,
         CAST(size(split(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents),
r AS (
  SELECT lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM t)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
       max(CASE WHEN rn * 2 = n OR rn * 2 = n + 1 THEN n_tokens END)
         AS p50_tokens,
       max(CASE WHEN rn * 10 = n * 9 OR (rn - 1) * 10 < n * 9
                     AND rn * 10 > n * 9 THEN n_tokens END) AS p90_tokens
FROM r GROUP BY lang
ORDER BY lang
""",
    """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
r AS (
  SELECT lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM t)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
       max(CASE WHEN rn * 2 = n OR rn * 2 = n + 1 THEN n_tokens END)
         AS p50_tokens,
       max(CASE WHEN rn * 10 = n * 9 OR (rn - 1) * 10 < n * 9
                     AND rn * 10 > n * 9 THEN n_tokens END) AS p90_tokens
FROM r GROUP BY lang
ORDER BY lang
""",
)

# --- BM25 keyword scoring (search / eval-set mining over the corpus) ----------
# Okapi BM25 over a fixed 3-term query — the keyword-retrieval op a
# training-data pipeline uses for eval-set mining and targeted filtering.
# Float discipline: idf = ln of exact-BIGINT ratios (bit-identical, like
# unigram_logprob_buckets); per-term scores combine by EXPLICIT addition in
# a fixed term order (s1 + s2 + s3) — never SUM over a join, whose
# accumulation order is engine-dependent; every numeric literal is CAST to
# DOUBLE because bare decimal literals are DECIMAL-typed in both engines
# with different promotion rules.  Scale shape: tf/dl are map-side
# expressions; avgdl is one tiny agg broadcast back; one final top-k sort.
_BM25_TERMS = ("spark", "window", "merge")


def _bm25_sql(tok_expr: str, size_fn: str, filter_fn: str) -> str:
    per_term = []
    for i, term in enumerate(_BM25_TERMS):
        per_term.append(
            f"CAST({size_fn}({filter_fn}(toks, x -> x = '{term}')) AS BIGINT)"
            f" AS tf_{i}"
        )
    tf_cols = ",\n         ".join(per_term)
    score_terms = " + ".join(
        f"""(ln((CAST(n_docs - df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
         * (CAST(tf_{i} AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
         / (CAST(tf_{i} AS DOUBLE) + CAST(1.2 AS DOUBLE)
            * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
               + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))"""
        for i in range(len(_BM25_TERMS))
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH t AS (
  SELECT doc_id, {tok_expr} AS toks FROM documents),
tf AS (
  SELECT doc_id, CAST({size_fn}(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM t),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM tf)
SELECT doc_id, dl, tf_0, tf_1, tf_2,
       round({score_terms}, 6) AS bm25
FROM tf CROSS JOIN stats
WHERE tf_0 + tf_1 + tf_2 > 0
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


_dual(
    "bm25_topk",
    _bm25_sql("split(trim(lower(text)), '\\s+')", "size", "filter"),
    _bm25_sql(r"regexp_split_to_array(trim(lower(text)), '\s+')", "len",
              "list_filter"),
)

# --- intra-document line dedup (repeated-paragraph removal) -------------------
# The extraction artifact dedup_lines does NOT cover: the SAME line repeated
# WITHIN one document (nav blocks re-rendered per section, infinite-scroll
# re-serves, template double-includes).  Keep the first occurrence per
# (doc, line), preserve order, rejoin.  The lined input is synthesized
# identically in both dialects with planted intra-doc dups: slice A appears
# twice in every doc, slice B twice in even docs.  Scale shape: ONE window
# shuffle on (doc_id) — row_number per (doc_id, line) partitions by a key
# strictly finer than the reassembly groupBy, so AQE coalesces both stages
# onto one exchange; no corpus-wide state at all (contrast dedup_lines'
# frequency table).
_INTRADOC_SPARK = (
    "concat_ws(chr(10), substring(text, 1, 60), substring(text, 61, 60), "
    "substring(text, 1, 60), "
    "CASE WHEN doc_id % 2 = 0 THEN substring(text, 61, 60) END, "
    "concat('tail ', CAST(doc_id AS STRING)))"
)
_INTRADOC_DUCK = (
    "concat_ws(chr(10), substring(text, 1, 60), substring(text, 61, 60), "
    "substring(text, 1, 60), "
    "CASE WHEN doc_id % 2 = 0 THEN substring(text, 61, 60) END, "
    "concat('tail ', CAST(doc_id AS VARCHAR)))"
)
_dual(
    "intradoc_line_dedup",
    f"""
WITH lined AS (
  SELECT doc_id, {_INTRADOC_SPARK} AS t FROM documents),
lines AS (
  SELECT doc_id, pos, line
  FROM lined LATERAL VIEW posexplode(split(t, chr(10))) x AS pos, line),
flagged AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) = 1
           AS keep
  FROM lines)
SELECT doc_id,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       array_join(transform(array_sort(collect_list(
           CASE WHEN keep THEN named_struct('pos', pos, 'line', line) END)),
         s -> s.line), chr(10)) AS text_kept
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
    f"""
WITH lined AS (
  SELECT doc_id, {_INTRADOC_DUCK} AS t FROM documents),
lines AS (
  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
           i -> {{'pos': i, 'line': ls[i]}})) AS u
    FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM lined) b) s),
flagged AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) = 1
           AS keep
  FROM lines)
SELECT doc_id,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE keep), '') AS text_kept
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
)

# --- exact substring dedup (ExactSubstr, Lee et al. 2022) --------------------
# The remaining dedup modality: find every token span that occurs MORE THAN
# ONCE anywhere in the corpus, at k-gram granularity — the "Deduplicating
# Training Data Makes Language Models Better" operator, re-expressed
# relationally instead of via a monolithic suffix array: tokenize ->
# k-gram hash per position (explode) -> corpus-wide occurrence count ->
# join the duplicated grams back -> per-doc gaps-and-islands merge of the
# overlapping [pos, pos+k) windows into maximal removable spans.
# Scale shape (100 TB): one gram-hash shuffle with map-side partials (the
# vocab_topk shape at k-gram grain), one shuffle join back on the uniform
# hash, and a per-doc window bounded by document length — no suffix array,
# no global sort.  All arithmetic is integer (positions, lag, running sum),
# so the twin matches bit-for-bit; the md5-prefix gram hash is the
# engine-portable md5_60.
_dual(
    "dedup_substring_spans",
    f"""
WITH toks AS (
  SELECT doc_id, {_TOK_SPARK} AS tk FROM documents
  WHERE size({_TOK_SPARK}) >= 8),
grams AS (
  SELECT doc_id, pos,
         CAST(conv(substring(md5(concat_ws(' ', slice(tk, pos + 1, 8))),
                             1, 15), 16, 10) AS BIGINT) AS gh
  FROM toks LATERAL VIEW explode(sequence(0, size(tk) - 8)) x AS pos),
dup AS (
  SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup d ON g.gh = d.gh),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id
                                           ORDER BY pos) + 8
              THEN 1 ELSE 0 END AS brk
  FROM hits),
grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 8 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_gram_hits
FROM grp
GROUP BY doc_id, island
ORDER BY doc_id, span_start
""",
    f"""
WITH toks AS (
  SELECT doc_id, {_TOK_DUCK} AS tk FROM documents
  WHERE len({_TOK_DUCK}) >= 8),
grams AS (
  SELECT doc_id, pos,
         CAST(concat('0x',
              substring(md5(array_to_string(
                  list_slice(tk, pos + 1, pos + 8), ' ')), 1, 15))
              AS BIGINT) AS gh
  FROM toks, unnest(range(0, len(tk) - 8 + 1)) AS t(pos)),
dup AS (
  SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup d ON g.gh = d.gh),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id
                                           ORDER BY pos) + 8
              THEN 1 ELSE 0 END AS brk
  FROM hits),
grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 8 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_gram_hits
FROM grp
GROUP BY doc_id, island
ORDER BY doc_id, span_start
""",
)
