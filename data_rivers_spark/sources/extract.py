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
