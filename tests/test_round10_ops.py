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
