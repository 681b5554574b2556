"""Lint: SURVEY.md §2 and the query catalog must stay in lockstep —
every backticked query key in the inventory exists in ``queries()``,
its oracle marker matches ``oracle_sql()``, and every catalog entry
appears in the inventory."""

from __future__ import annotations

import re

from pygeoapi_ingestor_spark.plans import ORACLES, QUERIES

SURVEY = "/root/repo/SURVEY.md"


def _survey_rows():
    text = open(SURVEY).read()
    section = text.split("## §2")[1].split("## §3")[0]
    rows = []
    for line in section.splitlines():
        m = re.match(r"\|\s*[A-Z]\d+\w*\s*\|\s*`([a-z0-9_.]+)`\s*\|.*\|\s*(oracle|rows|tests)\s*\|", line)
        if m:
            rows.append((m.group(1), m.group(2)))
    return rows


def test_survey_keys_exist_in_catalog():
    rows = [(k, mark) for k, mark in _survey_rows() if "." not in k]
    assert len(rows) >= 50
    for key, mark in rows:
        if mark == "tests":
            continue  # operator-level rows exercised by the test suite
        assert key in QUERIES, f"SURVEY lists {key!r} but queries() lacks it"
        if mark == "oracle":
            assert key in ORACLES, f"SURVEY marks {key!r} oracle but no oracle_sql"
        else:
            assert key not in ORACLES, f"SURVEY marks {key!r} rows but oracle exists"


def test_catalog_keys_all_in_survey():
    listed = {k for k, _ in _survey_rows()}
    missing = sorted(set(QUERIES) - listed)
    assert not missing, f"catalog queries absent from SURVEY §2: {missing}"
