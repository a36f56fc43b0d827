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


def test_survey_extension_rows_sorted():
    """X-rows in SURVEY §2c must be in ascending id order, one id per
    row (r9 verdict ask #10 — audit-by-eye depends on ordering)."""
    import os
    import re

    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        ids = [
            int(m.group(1))
            for m in re.finditer(r"^\| X(\d+) \|", fh.read(), re.MULTILINE)
        ]
    assert ids == sorted(ids), "SURVEY X-rows out of order"
    assert len(ids) == len(set(ids)), "duplicate SURVEY X-row ids"


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
