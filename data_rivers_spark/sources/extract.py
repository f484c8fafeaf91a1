"""Extraction layer (SURVEY.md §2.5): the reference's connector patterns as
transport-injected, hermetic abstractions.

The reference pulls from ~15 external systems with hand-rolled pagination,
incremental watermarks, and retry/backoff (gcs_loaders/gcs_utils.py). Network
specifics stay at the edge: every extractor here takes a ``fetch`` callable
(page request → parsed payload) so production wires in requests/zeep/etc.
while tests (and this container) wire in fakes. The outputs are lists of
dicts ready for ``spark.createDataFrame`` / ndjson landing — extraction is
driver-side by design (the reference's model: bounded API pulls land in
object storage; Spark parallelism starts at the landing zone).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator


def backoff_retry(
    call: Callable[[], object],
    retries: int = 5,
    base_sleep: float = 0.1,
    max_sleep: float = 10.0,
    retry_on: tuple[type[Exception], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
):
    """Exponential backoff 0.1s → 10s cap around any call — the reference's
    universal posture for external calls (gcs_utils.py:76-142,
    dataflow_utils.py:1020-1062)."""
    delay = base_sleep
    for attempt in range(retries):
        try:
            return call()
        except retry_on:
            if attempt == retries - 1:
                raise
            sleep(delay)
            delay = min(delay * 2, max_sleep)
    raise AssertionError("unreachable")


def paginate_rest(
    fetch: Callable[[int, int], list[dict]],
    page_size: int = 2000,
    max_pages: int = 10_000,
) -> Iterator[list[dict]]:
    """Offset/limit REST pagination: keep fetching until a short/empty page
    (the QAlert loop shape, qalert_requests_gcs.py:22-71; API_LIMIT=2000)."""
    offset = 0
    for _ in range(max_pages):
        page = fetch(offset, page_size)
        if not page:
            return
        yield page
        if len(page) < page_size:
            return
        offset += len(page)


def extract_since_watermark(
    run_log,
    source: str,
    fetch_since: Callable[[str | None], list[dict]],
    new_watermark: Callable[[list[dict]], str],
    default_since: str | None = None,
) -> list[dict]:
    """Incremental since-watermark extraction: read the stored watermark,
    fetch changes since it, store the new watermark only after success
    (find_last_successful_run + run-log write, gcs_utils.py:893-904,
    qalert_requests_gcs.py:22-71)."""
    since = run_log.last_successful_run(source, default_since)
    records = fetch_since(since)
    if records:
        run_log.record_successful_run(source, new_watermark(records), rows=len(records))
    return records


def paginate_odata(
    fetch_url: Callable[[str], dict],
    base_url: str,
    max_pages: int = 10_000,
) -> Iterator[list[dict]]:
    """OData @odata.nextLink pagination (call_odata_api_error_handling,
    gcs_utils.py:40-154): follow nextLink until absent; each payload is
    {'value': [...], '@odata.nextLink'?: url}."""
    url = base_url
    for _ in range(max_pages):
        payload = fetch_url(url)
        yield payload.get("value", [])
        url = payload.get("@odata.nextLink")
        if not url:
            return


def build_odata_query(
    base: str,
    entity: str,
    select: list[str] | None = None,
    expand: str | None = None,
    filter_expr: str | None = None,
) -> str:
    """$select/$expand/$filter OData URL construction
    (computronix_gis_street_closures_gcs.py:31-58)."""
    params = []
    if select:
        params.append("$select=" + ",".join(select))
    if expand:
        params.append("$expand=" + expand)
    if filter_expr:
        params.append("$filter=" + filter_expr)
    return f"{base}/{entity}" + ("?" + "&".join(params) if params else "")


CKAN_ROW_LIMIT = 500_001  # WPRDC instance hard cap (gcs_utils.py:37)


def synthesize_ckan_query(
    resource_id: str,
    select: list[str] | None = None,
    where: str | None = None,
    group_by: list[str] | None = None,
    order_by: str | None = None,
    limit: int | None = None,
) -> str:
    """CKAN datastore_search_sql query synthesis — SELECT/WHERE/GROUP BY/
    ORDER BY/LIMIT pushed to the remote API (synthesize_query,
    gcs_utils.py:665-853). The remote caps rows at 500,001."""
    cols = ", ".join(f'"{c}"' for c in select) if select else "*"
    sql = f'SELECT {cols} FROM "{resource_id}"'
    if where:
        sql += f" WHERE {where}"
    if group_by:
        sql += " GROUP BY " + ", ".join(f'"{c}"' for c in group_by)
    if order_by:
        sql += f" ORDER BY {order_by}"
    sql += f" LIMIT {min(limit, CKAN_ROW_LIMIT) if limit else CKAN_ROW_LIMIT}"
    return sql


def generate_soap_envelope(body_xml: str, ns: str = "http://www.w3.org/2003/05/soap-envelope") -> str:
    """SOAP envelope construction (generate_xml, gcs_utils.py:924-946)."""
    return (
        f'<?xml version="1.0" encoding="utf-8"?>'
        f'<soap12:Envelope xmlns:soap12="{ns}">'
        f"<soap12:Body>{body_xml}</soap12:Body>"
        f"</soap12:Envelope>"
    )


def poll_until_ready(
    submit: Callable[[], object],
    check: Callable[[object], tuple[str, object]],
    refresh_auth: Callable[[], None] | None = None,
    max_rounds: int = 5,
    max_attempts: int = 5,
    base_delay: float = 3.0,
    delay_factor: float = 1.25,
    sleep: Callable[[float], None] = time.sleep,
):
    """Submit-then-poll export retrieval — the async-report API shape
    (Twilio Flex Insights raw export, pandas_etl/twilio_conversations_etl.py:
    108-147: POST the report request, then GET the result URI until the
    server stops answering 202-still-computing, refreshing the short-lived
    token on 401).

    ``submit()`` starts the job and returns a handle (e.g. the result URI).
    ``check(handle)`` polls once and returns a ``(status, payload)`` pair:
    ``("ready", payload)`` ends the poll, ``("pending", _)`` sleeps and
    retries with the delay growing by ``delay_factor`` (the reference's
    1.25x progressive wait), ``("auth_expired", _)`` invokes
    ``refresh_auth`` and starts a fresh round with the delay reset — at
    most ``max_rounds`` rounds of ``max_attempts`` polls each, then
    ``TimeoutError``. Transport-agnostic: callers close over their HTTP
    session/headers; tests wire in fakes."""
    handle = submit()
    delay = base_delay
    for _round in range(max_rounds):
        for _attempt in range(max_attempts):
            status, payload = check(handle)
            if status == "ready":
                return payload
            if status == "auth_expired":
                break  # refresh and burn a round
            sleep(delay)
            delay *= delay_factor
        else:
            continue  # attempts exhausted without auth expiry → next round
        if refresh_auth is None:
            raise PermissionError("auth expired and no refresh_auth provided")
        refresh_auth()
        delay = base_delay
    raise TimeoutError(
        f"export not ready after {max_rounds} rounds x {max_attempts} polls"
    )


def fetch_paged_redirect(
    get: Callable[[str], object],
    url: str,
    rows: Callable[[dict], list[dict]],
    next_url: Callable[[dict], str | None],
    retry_unauthorized: bool = True,
    max_pages: int = 10_000,
) -> list[dict]:
    """Paged report pull through an auth-preserving redirect — the Ceridian
    Dayforce report shape (get_ceridian_report, gcs_utils.py:751-778: the
    first GET 401s because the service answers from a redirected URL; retry
    the SAME session at ``response.url`` so the auth header survives the
    hop, then follow ``Paging.Next`` links until exhausted).

    ``get(url)`` returns a response-like object with ``.status_code``,
    ``.url`` (the post-redirect location) and ``.json()`` — a
    ``requests.Session().get`` bound with auth in production, a fake in
    tests. ``rows(payload)`` extracts the record list; ``next_url(payload)``
    returns the next page URL or None."""
    all_records: list[dict] = []
    pages = 0
    while url and pages < max_pages:
        resp = get(url)
        if retry_unauthorized and getattr(resp, "status_code", 200) == 401:
            resp = get(resp.url)
        payload = resp.json()
        all_records.extend(rows(payload))
        url = next_url(payload)
        pages += 1
    return all_records
