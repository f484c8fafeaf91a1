"""Extraction-layer tests with fake transports (hermetic)."""

from __future__ import annotations

import pytest

from data_rivers_spark.sources.extract import (
    CKAN_ROW_LIMIT,
    backoff_retry,
    build_odata_query,
    extract_since_watermark,
    generate_soap_envelope,
    paginate_odata,
    paginate_rest,
    synthesize_ckan_query,
)
from data_rivers_spark.sources.watermark import RunLog


def test_backoff_retry_recovers():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return "ok"

    assert backoff_retry(flaky, sleep=sleeps.append) == "ok"
    assert sleeps == [0.1, 0.2]


def test_backoff_retry_exhausts():
    with pytest.raises(ConnectionError):
        backoff_retry(lambda: (_ for _ in ()).throw(ConnectionError()), retries=2, sleep=lambda s: None)


def test_paginate_rest():
    data = [{"id": i} for i in range(4500)]

    def fetch(offset, limit):
        return data[offset : offset + limit]

    pages = list(paginate_rest(fetch, page_size=2000))
    assert [len(p) for p in pages] == [2000, 2000, 500]
    assert pages[2][-1]["id"] == 4499


def test_extract_since_watermark(tmp_path):
    log = RunLog(str(tmp_path))
    store = [{"id": 1, "ts": 100}, {"id": 2, "ts": 200}]

    def fetch_since(since):
        cutoff = int(since) if since else 0
        return [r for r in store if r["ts"] > cutoff]

    got = extract_since_watermark(
        log, "src", fetch_since, lambda rs: str(max(r["ts"] for r in rs)), "0"
    )
    assert len(got) == 2 and log.last_successful_run("src") == "200"
    # second run: nothing new, watermark unchanged
    assert extract_since_watermark(log, "src", fetch_since, lambda rs: "x") == []
    assert log.last_successful_run("src") == "200"
    store.append({"id": 3, "ts": 300})
    got = extract_since_watermark(log, "src", fetch_since, lambda rs: str(max(r["ts"] for r in rs)))
    assert [r["id"] for r in got] == [3] and log.last_successful_run("src") == "300"


def test_paginate_odata():
    pages = {
        "base": {"value": [{"a": 1}], "@odata.nextLink": "p2"},
        "p2": {"value": [{"a": 2}]},
    }
    got = list(paginate_odata(pages.__getitem__, "base"))
    assert got == [[{"a": 1}], [{"a": 2}]]


def test_build_odata_query():
    url = build_odata_query(
        "https://x/odata", "DOMIPERMIT", select=["A", "B"], expand="SEG", filter_expr="ACTIVE eq 1"
    )
    assert url == "https://x/odata/DOMIPERMIT?$select=A,B&$expand=SEG&$filter=ACTIVE eq 1"


def test_synthesize_ckan_query():
    q = synthesize_ckan_query(
        "res-1", select=["name", "dept"], where="dept = 'DPW'", order_by='"name"', limit=10
    )
    assert q == 'SELECT "name", "dept" FROM "res-1" WHERE dept = \'DPW\' ORDER BY "name" LIMIT 10'
    assert f"LIMIT {CKAN_ROW_LIMIT}" in synthesize_ckan_query("res-1")


def test_soap_envelope():
    xml = generate_soap_envelope("<GetEmployees/>")
    assert xml.startswith('<?xml version="1.0"')
    assert "<soap12:Body><GetEmployees/></soap12:Body>" in xml
