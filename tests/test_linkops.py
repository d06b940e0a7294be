"""Outlink extraction: real DOM parse + urljoin semantics against the
deterministic synth, scheme/fragment filtering, totality on broken html,
and the frontier aggregation."""
import pytest

from newsspark.linkops import (
    _links_of,
    extract_links_table,
    link_frontier,
    page_url,
    synth_link_page,
    synth_link_pages,
)

SF = "/root/testdata/sf0.001"


def test_links_of_all_five_anchor_kinds():
    """doc_id=2 yields j=0..4 covering kinds 2,3,4,0,1: protocol-relative
    absolutizes to https, mailto and fragment-only vanish, absolute passes
    through, rooted-relative joins against the page host."""
    doc_id = 2
    html = synth_link_page(doc_id, "t")
    rows = _links_of(doc_id, page_url(doc_id), html)
    by_idx = {r[1]: r for r in rows}
    assert set(by_idx) == {0, 3, 4}          # j=1 mailto, j=2 fragment dropped
    # j=0: kind 2 protocol-relative
    assert by_idx[0][3] == "https://cdn0.example.net/r/2"
    assert by_idx[0][4] == "cdn0.example.net" and by_idx[0][5] is False
    # j=3: kind 0 absolute, host h0 == page host h2? (2+3)%5=0 -> h0, page h2
    assert by_idx[3][3] == "https://h0.example.org/art/2-3"
    assert by_idx[3][5] is False
    # j=4: kind 1 rooted-relative -> page host
    assert by_idx[4][3] == "https://h2.example.org/sec4/item-2.html"
    assert by_idx[4][4] == "h2.example.org" and by_idx[4][5] is True


def test_links_of_nofollow_and_total_on_garbage():
    # (doc_id + j) % 7 == 0 -> nofollow
    rows = _links_of(7, page_url(7), synth_link_page(7, "t"))
    nof = {r[1]: r[6] for r in rows}
    assert nof[0] is True and all(v is False for j, v in nof.items() if j != 0)
    # totality: arbitrary byte soup and half-open tags yield a (possibly
    # empty) list, never a raise
    assert isinstance(_links_of(0, "https://x/", "<a href="), list)
    assert isinstance(_links_of(0, "https://x/", "\x00<<>>&&"), list)
    assert _links_of(0, "not a url", "<a href='#only'>x</a>") == []


def test_extract_links_matches_duck_oracle_shape(spark):
    import duckdb

    from newsspark.contract_sql import DUCK_SQL

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = extract_links_table(synth_link_pages(docs)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.execute(DUCK_SQL["extract_links"]).df()
    assert len(got) == len(want)
    assert got.columns.tolist() == want.columns.tolist()
    a = got.sort_values(["doc_id", "anchor_idx"]).reset_index(drop=True)
    b = want.sort_values(["doc_id", "anchor_idx"]).reset_index(drop=True)
    assert a.astype(str).values.tolist() == b.astype(str).values.tolist()


def test_link_frontier_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    links = extract_links_table(synth_link_pages(docs))
    front = {r["target_host"]: r for r in link_frontier(links).collect()}
    lp = links.toPandas()
    for host, grp in lp.groupby("target_host"):
        assert front[host]["n_inlinks"] == len(grp)
        assert front[host]["n_ref_docs"] == grp["doc_id"].nunique()
        assert front[host]["n_nofollow"] == int(grp["is_nofollow"].sum())


def test_robots_filter_rep_semantics(spark):
    """Every REP outcome on planted links: longest-match re-allow wins
    over the shorter disallow, outright section disallow denies, /art/
    denies on even hosts only, unruled cdn hosts default-allow."""
    from newsspark.linkops import robots_filter, robots_rules_df

    links = spark.createDataFrame(
        [
            # h0: /sec0 disallow + /sec0/item- re-allow (longer) -> ALLOWED
            (0, 0, "h0.example.org", "https://h0.example.org/sec0/item-9.html"),
            # h0: /sec1 disallow, no re-allow -> DENIED
            (0, 1, "h0.example.org", "https://h0.example.org/sec1/item-9.html"),
            # h0 (even): /art/ -> DENIED ; h1 (odd): /art/ -> ALLOWED
            (0, 2, "h0.example.org", "https://h0.example.org/art/9-1"),
            (0, 3, "h1.example.org", "https://h1.example.org/art/9-1"),
            # cdn host: no rules -> ALLOWED
            (0, 4, "cdn0.example.net", "https://cdn0.example.net/r/9"),
            # h0 section with no rule at all -> ALLOWED
            (0, 5, "h0.example.org", "https://h0.example.org/sec6/item-9.html"),
        ],
        "doc_id long, anchor_idx int, target_host string, href_abs string",
    )
    out = {r["anchor_idx"]: r for r in
           robots_filter(links, robots_rules_df(spark)).collect()}
    assert out[0]["allowed"] is True
    assert out[0]["matched_prefix"] == "/sec0/item-"   # longest match won
    assert out[1]["allowed"] is False
    assert out[1]["matched_prefix"] == "/sec1"
    assert out[2]["allowed"] is False and out[3]["allowed"] is True
    assert out[4]["allowed"] is True and out[4]["matched_prefix"] is None
    assert out[5]["allowed"] is True and out[5]["matched_prefix"] is None
    # exactly one output row per input link
    assert len(out) == 6


def test_robots_filter_broadcasts_rules_and_covers_corpus(spark):
    from newsspark.linkops import (
        extract_links_table, robots_filter, robots_rules_df,
        synth_link_pages,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    links = extract_links_table(synth_link_pages(docs))
    out = robots_filter(links, robots_rules_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    pdf = out.toPandas()
    assert pdf["allowed"].any() and (~pdf["allowed"]).any()  # real mix
    assert len(pdf) == links.count()                         # totality


def test_synth_title_markup_escaped():
    """Corpus text carrying markup in its first 40 chars must NOT change
    the anchor set: the title is html-escaped before interpolation, so
    the oracle (a pure function of doc_id) stays corpus-independent."""
    doc_id = 2
    plain = _links_of(doc_id, page_url(doc_id), synth_link_page(doc_id, "t"))
    evil = _links_of(
        doc_id,
        page_url(doc_id),
        synth_link_page(doc_id, '<a href="https://evil.example/">x</a>'),
    )
    assert evil == plain
    # and the escaped title round-trips as text, not as a tag
    assert "&lt;a href=" in synth_link_page(doc_id, '<a href="x">y</a>')


def test_crawl_frontier_gated_equals_filtered_frontier(spark):
    """The composed robots-gated frontier must equal link_frontier run
    over exactly the robots-allowed subset of the links."""
    from newsspark.linkops import (
        crawl_frontier_gated,
        extract_links_core,
        robots_filter,
        robots_rules_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    links = extract_links_core(synth_link_pages(docs))
    rules = robots_rules_df(spark)
    got = crawl_frontier_gated(links, rules).toPandas()

    verdicts = robots_filter(links, rules).select(
        "doc_id", "anchor_idx", "allowed"
    )
    allowed_links = links.join(verdicts, ["doc_id", "anchor_idx"]).where(
        "allowed"
    )
    want = link_frontier(allowed_links).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # denial is real: at least one host lost in-links vs the ungated frontier
    ungated = link_frontier(links).toPandas().set_index("target_host")
    gated = got.set_index("target_host")
    assert (
        ungated["n_inlinks"].sum() > gated["n_inlinks"].sum()
    )


def test_crawl_frontier_gated_plan_no_link_grain_sort(spark):
    """Composed over the UNSORTED links core: no link-grain global sort
    survives in the plan (EliminateSorts does not fire under joins —
    CLAUDE.md trap); the only rangepartition is the tiny per-host output
    ordering."""
    from newsspark.linkops import (
        crawl_frontier_gated,
        extract_links_core,
        robots_rules_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    links = extract_links_core(synth_link_pages(docs))
    out = crawl_frontier_gated(links, robots_rules_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("rangepartitioning") == 1, plan


def test_crawl_schedule_politeness_semantics(spark):
    """Per host: slots are contiguous 0..n-1, each wave holds at most
    per_host_slots URLs, only robots-ALLOWED URLs are scheduled, and the
    slot order is the md5-hash order the oracle replays."""
    import hashlib

    from newsspark.linkops import (
        crawl_schedule,
        extract_links_core,
        robots_filter,
        robots_rules_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    links = extract_links_core(synth_link_pages(docs))
    rules = robots_rules_df(spark)
    sched = crawl_schedule(links, rules, per_host_slots=2).toPandas()

    denied = {
        (r["target_host"], r["path"])
        for r in robots_filter(links, rules).collect()
        if not r["allowed"]
    }
    assert denied  # corpus must exercise denial
    for _, r in sched.iterrows():
        path = r["url"].split("/", 3)
        assert (r["target_host"], "/" + path[3].split("#")[0]
                if len(path) > 3 else "") not in denied
    for host, grp in sched.groupby("target_host"):
        slots = sorted(grp["slot"])
        assert slots == list(range(len(grp)))
        assert (grp.groupby("wave").size() <= 2).all()
        # hash order pinned against an independent md5 computation
        by_slot = grp.sort_values("slot")["url"].tolist()
        want = sorted(by_slot,
                      key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u))
        assert by_slot == want


def test_crawl_schedule_no_whole_host_window(spark):
    """The per-host rank must be bucket-composed: the only row_number
    window partitions by (target_host, bkt) — never a bare host — so a
    hot host cannot serialize onto one task (stratified_sample's r3
    lesson applied to scheduling)."""
    import re

    from newsspark.linkops import (
        crawl_schedule,
        extract_links_core,
        robots_rules_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    links = extract_links_core(synth_link_pages(docs))
    plan = crawl_schedule(links, robots_rules_df(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    specs = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*?)(?:, specifiedwindowframe|\))",
        plan)
    # robots argmax partitions by (doc_id, anchor_idx); the rank window
    # must partition by (target_host, bkt)
    assert any("bkt#" in s for s in specs), specs
    assert not any(
        "target_host#" in s and "bkt#" not in s for s in specs
    ), specs


def test_robots_best_mapside_no_link_grain_exchange(spark):
    """r6: the _robots_best core used by crawl_frontier_gated/crawl_schedule
    computes the REP verdict map-side (broadcast host join + array argmax):
    no (doc_id, anchor_idx) exchange, sort, or window may appear — the
    verdict must live inside the scan stage."""
    from newsspark.linkops import (
        _robots_best,
        extract_links_core,
        robots_rules_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    links = extract_links_core(synth_link_pages(docs))
    out = _robots_best(links, robots_rules_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "hashpartitioning(doc_id" not in plan, plan
    assert "Window" not in plan, plan
    # and it agrees with the windowed robots_filter verdict row-for-row
    from newsspark.linkops import robots_filter

    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, robots_filter(
        links, robots_rules_df(spark)).collect()))
    assert got == want


def test_crawl_schedule_cum_join_not_forced_broadcast(spark):
    """r6 (VERDICT r5 #1): bkt_cum holds one row per (host, bucket) pair and
    hosts are unbounded, so the slot-composition join must NOT carry a
    broadcast hint — a hint forces the driver-side collect-and-ship even
    when the planner knows the table is huge.  With auto-broadcast
    disabled (simulating a cum table past the size estimate), the join
    must plan as a SHUFFLE join on (target_host, bkt); the hinted r5 form
    would still broadcast here.  Results are unchanged either way."""
    import re

    from newsspark.linkops import (
        crawl_schedule,
        extract_links_core,
        robots_rules_df,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        links = extract_links_core(synth_link_pages(docs))
        out = crawl_schedule(links, robots_rules_df(spark))
        rows_noauto = sorted(map(tuple, out.collect()))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert re.search(
            r"(SortMergeJoin|ShuffledHashJoin) \[target_host#\d+, bkt#\d+\]",
            plan,
        ), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    rows_auto = sorted(map(tuple, crawl_schedule(
        extract_links_core(synth_link_pages(docs)), robots_rules_df(spark)
    ).collect()))
    assert rows_noauto == rows_auto
