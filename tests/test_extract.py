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


def test_poll_until_ready_happy_path_with_pending():
    from data_rivers_spark.sources.extract import poll_until_ready

    slept = []
    states = iter(["pending", "pending", "ready"])

    out = poll_until_ready(
        submit=lambda: "uri-1",
        check=lambda h: (
            (s := next(states)),
            {"csv": "data"} if s == "ready" else None,
        ),
        sleep=slept.append,
        base_delay=3.0,
        delay_factor=1.25,
    )
    assert out == {"csv": "data"}
    # progressive 1.25x waits, exactly the reference's posture
    assert slept == [3.0, 3.75]


def test_poll_until_ready_refreshes_expired_auth():
    from data_rivers_spark.sources.extract import poll_until_ready

    refreshes = []
    states = iter(["pending", "auth_expired", "pending", "ready"])
    slept = []

    out = poll_until_ready(
        submit=lambda: "uri-2",
        check=lambda h: ((s := next(states)), "payload" if s == "ready" else None),
        refresh_auth=lambda: refreshes.append(1),
        sleep=slept.append,
        base_delay=3.0,
    )
    assert out == "payload"
    assert refreshes == [1]
    # delay resets to base after the token refresh (new round)
    assert slept == [3.0, 3.0]


def test_poll_until_ready_times_out_and_auth_guard():
    from data_rivers_spark.sources.extract import poll_until_ready

    with pytest.raises(TimeoutError):
        poll_until_ready(
            submit=lambda: "h",
            check=lambda h: ("pending", None),
            max_rounds=2,
            max_attempts=2,
            sleep=lambda d: None,
        )
    with pytest.raises(PermissionError):
        poll_until_ready(
            submit=lambda: "h",
            check=lambda h: ("auth_expired", None),
            refresh_auth=None,
            sleep=lambda d: None,
        )


class _FakeResp:
    def __init__(self, status_code, payload, url="https://redirected.example/x"):
        self.status_code = status_code
        self.url = url
        self._payload = payload

    def json(self):
        return self._payload


def test_fetch_paged_redirect_retries_401_at_redirect_url():
    """The Ceridian shape: first GET 401s at the original URL; the retry at
    response.url (same session, auth preserved) succeeds; Paging.Next links
    are followed until absent."""
    from data_rivers_spark.sources.extract import fetch_paged_redirect

    calls = []
    pages = {
        "https://host/api/reports/r1": _FakeResp(
            401, None, url="https://real-host/api/reports/r1"
        ),
        "https://real-host/api/reports/r1": _FakeResp(
            200,
            {"Data": {"Rows": [{"a": 1}, {"a": 2}]},
             "Paging": {"Next": "https://real-host/api/reports/r1?p=2"}},
        ),
        "https://real-host/api/reports/r1?p=2": _FakeResp(
            200, {"Data": {"Rows": [{"a": 3}]}, "Paging": {"Next": None}}
        ),
    }

    def get(url):
        calls.append(url)
        return pages[url]

    out = fetch_paged_redirect(
        get,
        "https://host/api/reports/r1",
        rows=lambda p: p["Data"]["Rows"],
        next_url=lambda p: p["Paging"]["Next"],
    )
    assert out == [{"a": 1}, {"a": 2}, {"a": 3}]
    assert calls[0] == "https://host/api/reports/r1"
    assert calls[1] == "https://real-host/api/reports/r1"  # 401 → redirect retry
