"""Round-10 regression tests (r9 ADVICE + verdict asks)."""

from __future__ import annotations

import duckdb
import pytest


def test_bpe_encode_oracle_survives_early_stop():
    """r9 ADVICE: when the trainer early-stops (a round's best pair
    count drops below min_pair_count), the encode oracle must keep
    encoding with the merges that DID land — not empty every later
    round through the empty-b{r} cross join. Corpus: (a,b) merges in
    round 1 with count 3; round 2's best is (c,d) with count 1 < 2, so
    the trainer stops at ONE merge while 4 are requested."""
    from sparkflow_spark.bpe import encode_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'ab ab cd'), (2, 'ab')) t(doc_id, text)"
    )
    rows = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            encode_oracle_sql(n_merges=4, min_pair_count=2)
        ).fetchall()
    }
    # with the single ('a','b') merge: 'ab' -> 1 token, 'cd' -> 2 tokens
    assert rows[1] == (4, 6, 1.5)
    assert rows[2] == (1, 2, 2.0)


def test_bpe_encode_oracle_no_merges_at_all():
    """Degenerate early stop in ROUND 1 (no pair reaches
    min_pair_count): every word stays fully character-split."""
    from sparkflow_spark.bpe import encode_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'abc xyz')) t(doc_id, text)"
    )
    rows = con.execute(encode_oracle_sql(n_merges=3, min_pair_count=2)).fetchall()
    assert rows == [(1, 6, 6, 1.0)]


REPO = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))


def test_every_registry_entry_documented_in_survey_or_status():
    """r9 verdict ask #10: the SURVEY↔registry audit is by-eye; keep it
    1:1 by construction — every registry entry name must appear in
    SURVEY.md or STATUS.md."""
    import os

    from sparkflow_spark.queries import load_all

    text = ""
    for doc in ("SURVEY.md", "STATUS.md"):
        with open(os.path.join(REPO, doc)) as fh:
            text += fh.read()
    missing = [n for n in load_all() if n not in text]
    assert not missing, f"registry entries undocumented in SURVEY/STATUS: {missing}"


def test_survey_extension_rows_sorted_and_contiguous():
    """X-rows in SURVEY §2c must be in ascending id order, one id per
    row (r9 verdict ask #10 — audit-by-eye depends on ordering) AND
    contiguous 1..max (r12 verdict ask #1: an interrupted SURVEY write
    dropped rows X175–X178 while the ordering check stayed green — a
    four-id HOLE is exactly what contiguity catches)."""
    import os
    import re

    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        ids = [
            int(m.group(1))
            for m in re.finditer(r"^\| X(\d+) \|", fh.read(), re.MULTILINE)
        ]
    assert ids == sorted(ids), "SURVEY X-rows out of order"
    assert len(ids) == len(set(ids)), "duplicate SURVEY X-row ids"
    holes = sorted(set(range(1, max(ids) + 1)) - set(ids))
    assert not holes, f"SURVEY X-row id holes (lost contract rows): {holes}"


def test_new_registry_entries_named_in_survey_contract():
    """r12 verdict ask #1 (second half): a registry entry's contract
    membership must not be satisfiable by STATUS.md alone. The pre-r13
    families are documented through SURVEY's id-based Q/M/X rows without
    literal entry names — those are FROZEN in
    tests/data/legacy_survey_names.txt (never grows). Every entry NOT on
    that frozen list must be named in SURVEY.md itself (an X-row or a
    folded-ids note), so a lost SURVEY row fails this test even while
    STATUS still documents the entry."""
    import os

    from sparkflow_spark.queries import load_all

    with open(os.path.join(REPO, "tests", "data", "legacy_survey_names.txt")) as fh:
        legacy = {ln.strip() for ln in fh if ln.strip()}
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        survey = fh.read()
    reg = load_all()
    stale = sorted(legacy - set(reg))
    assert not stale, f"frozen legacy list names unknown entries: {stale}"
    missing = sorted(n for n in reg if n not in legacy and n not in survey)
    assert not missing, (
        f"registry entries not named in SURVEY.md (STATUS alone does not "
        f"satisfy the contract): {missing}"
    )


def test_no_tracked_tmp_files():
    """r12 verdict: an empty SURVEY.md.tmp (interrupted atomic write)
    was committed. Temp artifacts must never be tracked."""
    import subprocess

    out = subprocess.run(
        ["git", "ls-files", "*.tmp", "*.orig", "*.rej"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tracked = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert not tracked, f"temp files tracked in git: {tracked}"


def test_query_reference_doc_matches_registry():
    """r9 verdict ask #9: docs/QUERY_REFERENCE.md is generated
    (scripts/gen_reference.py); its claimed entry count must equal the
    live registry and every entry must have a row — the release gate
    that keeps the doc from drifting."""
    import os
    import re

    from sparkflow_spark.queries import load_all

    reg = load_all()
    with open(os.path.join(REPO, "docs", "QUERY_REFERENCE.md")) as fh:
        doc = fh.read()
    m = re.search(r"^(\d+) registry entries", doc, re.MULTILINE)
    assert m, "QUERY_REFERENCE.md missing the 'N registry entries' line"
    assert int(m.group(1)) == len(reg), (
        f"QUERY_REFERENCE.md claims {m.group(1)} entries, registry has "
        f"{len(reg)} — re-run scripts/gen_reference.py"
    )
    missing = [n for n in reg if f"| {n} " not in doc]
    assert not missing, f"QUERY_REFERENCE.md missing rows: {missing}"


def test_exact_substring_spans_match_suffix_array_reference(spark):
    """d_exact_substring_spans' kernel vs a brute-force suffix-array
    reference (all-pairs cross-doc LCP per suffix — the Lee et al.
    definition computed the slow exact way): identical maximal spans on
    a corpus with a long shared passage, an exactly-L share, a
    just-under-L share (must NOT emit), an internal-only repeat (must
    NOT emit — cross-document means >= 2 distinct docs), a full-doc
    duplicate, and a doc shorter than L."""
    from sparkflow_spark.dedup import exact_substring_spans

    L = 12
    shared45 = "the quick brown fox jumps over the lazy dog!"
    shared12 = "abcdefghijkl"
    shared11 = "ABCDEFGHIJK"
    docs = {
        1: "xx " + shared45 + " yy",
        2: "zz" + shared45 + "qq " + shared12,
        3: "prefix " + shared12 + " suffix",
        4: "one" + shared11 + "two",
        5: "six" + shared11 + "four",
        6: "selfrepeatselfrepeatselfrepeat",  # internal-only repeat
        7: "short",
        8: "duplicate document body here",
        9: "duplicate document body here",
    }

    def lcp(a: str, b: str) -> int:
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    suffixes = [
        (t[i:], d, i + 1) for d, t in docs.items() for i in range(len(t))
    ]
    expect = set()
    for d, t in docs.items():
        flagged = sorted(
            p
            for (s, dd, p) in suffixes
            if dd == d
            and max(
                (lcp(s, s2) for (s2, d2, _) in suffixes if d2 != d), default=0
            )
            >= L
        )
        # interval-union merge: [p, p+L) windows overlap/touch iff the
        # next start is within L of the previous one
        run: list[int] = []
        for p in flagged:
            if run and p - run[-1] <= L:
                run.append(p)
            else:
                if run:
                    expect.add((d, run[0], run[-1] + L, run[-1] + L - run[0]))
                run = [p]
        if run:
            expect.add((d, run[0], run[-1] + L, run[-1] + L - run[0]))

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in exact_substring_spans(df, min_len=L).collect()
    }
    assert got == expect
    assert any(r[0] == 1 for r in got)          # long shared passage found
    assert any(r[0] == 3 for r in got)          # exactly-L share found
    assert not any(r[0] in (4, 5, 6, 7) for r in got)  # under-L/internal/short
    full = {r for r in got if r[0] in (8, 9)}
    assert full == {(8, 1, 29, 28), (9, 1, 29, 28)}  # full-doc duplicates


def test_stream_stream_left_join_null_padding_timing(spark, tmp_path):
    """Pins the outer-emission rule of st_stream_stream_left_join on a
    planted-boundary fixture: global wm = min(per-leg filtered max) -
    3h delay = 09:00:00.000; an unmatched purchase EXACTLY at the
    watermark must be withheld (strict <), 1 µs above withheld, below
    emitted null-padded, and matches emit regardless."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as papq

    from sparkflow_spark.streaming.windows import stream_stream_left_join

    T = dt.datetime.fromisoformat
    rows = [
        (1, T("2024-01-01 04:30:00"), 10, "signup"),
        (2, T("2024-01-01 12:00:00"), 99, "signup"),  # right-leg max
        (3, T("2024-01-01 05:00:00"), 10, "purchase"),  # matched
        (4, T("2024-01-01 06:00:00"), 20, "purchase"),  # below wm
        (5, T("2024-01-01 09:00:00"), 30, "purchase"),  # == wm exactly
        (6, T("2024-01-01 09:00:00.000001"), 40, "purchase"),  # 1 µs above
        (7, T("2024-01-01 23:00:00"), 50, "purchase"),  # left-leg max
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in stream_stream_left_join(spark, str(tmp_path)).collect()
    )
    assert got == [(3, 1), (4, None)]


def test_tws_timer_expiry_boundary_inclusive(spark, tmp_path):
    """Pins st_tws_session_timers' firing rule on a planted fixture:
    wm = max ts - 3h = 09:00:00.000; a timer with expiry EXACTLY equal
    to the watermark fires (inclusive <=), a same-ms +1 µs sibling
    fires identically (whole-ms arithmetic), a younger session stays
    buffered, an old one fires."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as papq

    from sparkflow_spark.streaming.stateful import tws_session_end_timers

    T = dt.datetime.fromisoformat
    rows = [
        (1, T("2024-01-01 05:30:00"), 10, "click"),  # expiry 06:00 < wm
        (2, T("2024-01-01 08:30:00"), 20, "click"),  # expiry == wm exactly
        (3, T("2024-01-01 08:30:00.000001"), 30, "click"),  # same ms as wm
        (4, T("2024-01-01 10:00:00"), 40, "click"),  # expiry > wm: buffered
        (5, T("2024-01-01 12:00:00"), 99, "click"),  # corpus max
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: r["session_end_ms"]
        for r in tws_session_end_timers(spark, str(tmp_path)).collect()
    }
    h = lambda s: int(T(s).timestamp() * 1000)
    assert got == {
        10: h("2024-01-01 06:00:00"),
        20: h("2024-01-01 09:00:00"),
        30: h("2024-01-01 09:00:00"),
    }


def test_exact_substring_spans_never_overlap(spark):
    """Regression for the round-10 interval-union fix: two duplicated
    windows can overlap through a stretch whose own start positions are
    NOT duplicated; the emitted 'maximal' spans must still be disjoint.
    Construction: docs 2 and 3 each share a different L-window with
    doc 1, overlapping inside doc 1, while the in-between start
    positions match nobody."""
    from sparkflow_spark.dedup import exact_substring_spans

    L = 10
    a = "AAAAABBBBB"  # matches doc 2 at doc-1 positions 1..10
    b = "BBBCCCCCCC"  # matches doc 3 at doc-1 positions 8..17
    docs = [
        (1, a + "CCCCCCC"),      # 17 chars: [1,11) dup via 2, [8,18) via 3
        (2, "xx" + a + "yy"),
        (3, "qq" + b + "zz"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(df, min_len=L).collect()
    )
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    for d, iv in by_doc.items():
        for (s1, e1), (s2, e2) in zip(iv, iv[1:]):
            assert s2 >= e1, f"doc {d}: overlapping spans {(s1, e1)} {(s2, e2)}"
    # doc 1's two overlapping windows merged into ONE maximal span
    assert by_doc[1] == [(1, 18)]


def test_exact_substring_spans_boilerplate_hot_gram(spark):
    """Skew pin for X156: a 40-char boilerplate header shared by 30% of
    a 2,000-doc corpus puts ~600 rows into each header-gram's window
    partition (the hot-key regime a real crawl guarantees). The kernel
    must stay correct — every boilerplate doc gets exactly the header
    span, tail-unique docs nothing else — because the min!=max window
    is a streamed per-partition aggregate, not a join: the hot gram
    costs one sorted partition, never an O(df^2) pair bucket."""
    from sparkflow_spark.dedup import exact_substring_spans

    header = "COMMON-SITE-HEADER:0123456789abcdefghij "  # 40 chars
    assert len(header) == 40
    import hashlib

    docs = [
        (
            i,
            (header if i % 10 < 3 else f"unique{i:05d}head ")
            + f"tail-{i:05d}-"
            + hashlib.md5(str(i).encode()).hexdigest(),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    spans = exact_substring_spans(df, min_len=30).collect()
    got = {}
    for r in spans:
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    boiler = {d for d, _t in docs if d % 10 < 3}
    assert set(got) == boiler
    # one span per boilerplate doc, starting at 1 and covering at least
    # the 40-char header; the shared "tail-0..." literal after it lets
    # duplicated windows reach a few chars further (bounded by the
    # first distinguishing digit), never into the md5-unique region
    for d, iv in got.items():
        assert len(iv) == 1 and iv[0][0] == 1 and 41 <= iv[0][1] <= 55, (d, iv)


def test_exact_substring_hashed_equals_exact_and_narrow_shuffle(spark):
    """r10 verdict ask #1: the xxhash64-prefilter variant must emit the
    IDENTICAL span set as the exact-gram kernel (collision-safe via the
    exact-gram verify behind the prescreen), and its first exchange
    must carry the 8-byte hkey instead of the 30-char gram string."""
    import hashlib

    from sparkflow_spark.dedup import exact_substring_spans

    header = "COMMON-SITE-HEADER:0123456789abcdefghij "
    docs = [
        (
            i,
            (header if i % 10 < 3 else f"unique{i:05d}head ")
            + f"tail-{i:05d}-"
            + hashlib.md5(str(i).encode()).hexdigest(),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    exact = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in exact_substring_spans(df, min_len=30).collect()
    }
    hashed_df = exact_substring_spans(df, min_len=30, gram_key="hash")
    hashed = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in hashed_df.collect()
    }
    assert hashed == exact and len(exact) > 0
    # the prescreen exchange is keyed on the int64 hash, and the gram
    # string does not ride that shuffle
    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(hkey" in plan, plan[:2000]
    assert "xxhash64" in plan


def test_exact_substring_gram_key_validation():
    import pytest as _pytest

    from sparkflow_spark.dedup import exact_substring_spans

    with _pytest.raises(ValueError, match="gram_key"):
        exact_substring_spans(None, min_len=30, gram_key="bogus")
