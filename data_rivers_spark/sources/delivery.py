"""Delivery sinks (SURVEY.md §2.5): email report, SharePoint upload, and
SOAP write-back — the reference's three report-delivery channels, as
transport-injected hermetic components.

These are the last-mile notification/delivery paths of the reference:

- ``gcs_to_email`` (airflow_utils.py:193-236) mails an exported CSV as a
  base64 attachment via SendGrid, gated on a minimum content length, an
  optional day-of-week schedule, and a prod-resources flag;
- ``send_alert_email`` (gcs_utils.py:157-191) mails an alert with an
  optional in-memory CSV attachment built from a list of dicts;
- ``upload_to_sharepoint`` (ceridian_new_hires_etl.py:65-82) uploads a CSV
  into a SharePoint folder, creating the subfolder on first failure;
- the InTime balance write-back (intime_set_balances_gcs.py:22-60) posts
  one SOAP ``setBalance`` envelope per CSV row, keeps an update log of
  successes, and mails the log as a CSV alert.

Like the extraction layer (extract.py), network specifics stay at the edge:
every sink takes a ``transport``/``client``/``post`` callable, so
production wires in sendgrid/office365/requests while tests (and this
container) wire in fakes. Delivery is driver-side BY DESIGN — these carry
export-sized report artifacts (tens of KB), never table-scale data; the
scale path for bulk data is export.py's parallel parquet/CSV writers.
"""

from __future__ import annotations

import base64
import csv
import io
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from .extract import backoff_retry

# ---------------------------------------------------------------------------
# Email report sink (SendGrid shape)
# ---------------------------------------------------------------------------


@dataclass
class EmailMessage:
    """Provider-neutral rendering of the reference's SendGrid Mail object
    (airflow_utils.py:200-224): personalization with to/cc lists, HTML
    body, and one optional base64-encoded attachment."""

    from_email: str
    recipients: list[str]
    cc: list[str]
    subject: str
    html_content: str
    attachment_name: str | None = None
    attachment_type: str | None = None
    attachment_b64: str | None = None


@dataclass
class DeliveryResult:
    """What happened at the sink — the reference prints these outcomes
    (``'Requested file is empty, no email sent'`` etc.); we return them so
    pipelines can branch/log instead of parsing stdout."""

    sent: bool
    reason: str
    message: EmailMessage | None = None


def rows_to_csv_bytes(rows: Sequence[dict], columns: list[str] | None = None) -> bytes:
    """CSV-serialize a small list of dicts (send_alert_email's
    ``pd.DataFrame(data).to_csv`` shape, gcs_utils.py:173-177) without a
    pandas dependency in the sink. Column order = first row's key order
    unless given."""
    if not rows:
        return b""
    cols = columns or list(rows[0].keys())
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols, extrasaction="ignore", lineterminator="\n")
    w.writeheader()
    for r in rows:
        w.writerow({c: r.get(c) for c in cols})
    return buf.getvalue().encode("utf-8")


def email_report(
    content: bytes,
    recipients: list[str],
    cc: list[str] | None,
    subject: str,
    body_html: str,
    attachment_name: str,
    from_email: str,
    transport: Callable[[EmailMessage], None] | None = None,
    file_type: str = "csv",
    min_length: int = 50,
    weekday_gate: tuple[bool, int | None] = (False, None),
    today_weekday: int | None = None,
) -> DeliveryResult:
    """Email an exported report file as an attachment — ``gcs_to_email``
    (airflow_utils.py:193-236) semantics:

    - ``min_length`` gate: content shorter than 50 bytes (a header-only
      CSV) sends nothing ("Requested file is empty, no email sent");
    - ``weekday_gate=(True, d)``: send only when today is weekday ``d``
      (``on_certain_day``); ``today_weekday`` is injected for hermetic
      tests (production passes ``date.today().weekday()``);
    - attachment is base64-encoded with MIME type ``application/<type>``;
    - ``transport=None`` is the reference's non-prod dry-run branch
      (``USE_PROD_RESOURCES`` false → print, don't send): the message is
      fully built and returned, but nothing leaves the process.
    """
    gate_on, gate_day = weekday_gate
    if gate_on and today_weekday != gate_day:
        return DeliveryResult(False, f"weekday gate: only sends on day {gate_day}")
    if len(content) < min_length:
        return DeliveryResult(False, "empty report: no email sent")
    msg = EmailMessage(
        from_email=from_email,
        recipients=list(recipients),
        cc=list(cc or []),
        subject=subject,
        html_content=body_html,
        attachment_name=f"{attachment_name}.{file_type}",
        attachment_type=f"application/{file_type}",
        attachment_b64=base64.b64encode(content).decode(),
    )
    if transport is None:
        return DeliveryResult(False, "dry run: email built but not sent", msg)
    transport(msg)
    return DeliveryResult(True, "sent", msg)


def alert_email(
    recipients: list[str],
    cc: list[str] | None,
    subject: str,
    content_html: str,
    from_email: str,
    transport: Callable[[EmailMessage], None] | None = None,
    rows: Sequence[dict] | None = None,
    attachment_name: str | None = None,
) -> DeliveryResult:
    """Alert email with an optional in-memory CSV attachment built from a
    row list — ``send_alert_email`` (gcs_utils.py:157-191). Unlike
    email_report there is no length/weekday gate: alerts always fire."""
    msg = EmailMessage(
        from_email=from_email,
        recipients=list(recipients),
        cc=list(cc or []),
        subject=subject,
        html_content=content_html,
    )
    if rows:
        msg.attachment_name = attachment_name
        msg.attachment_type = "application/csv"
        msg.attachment_b64 = base64.b64encode(rows_to_csv_bytes(rows)).decode()
    if transport is None:
        return DeliveryResult(False, "dry run: email built but not sent", msg)
    transport(msg)
    return DeliveryResult(True, "sent", msg)


# ---------------------------------------------------------------------------
# SharePoint upload sink
# ---------------------------------------------------------------------------


class FolderNotFound(Exception):
    """Raised by a SharePoint client when the target folder is missing —
    stands in for office365's ClientRequestException."""


def sharepoint_upload(
    client,
    content: bytes,
    directory: str,
    file_name: str,
    subdirectory: str | None = None,
) -> str:
    """Upload a report file into a SharePoint folder, creating the
    subfolder if absent — ``upload_to_sharepoint``
    (ceridian_new_hires_etl.py:65-82) semantics: try the direct upload into
    ``directory/subdirectory``; on FolderNotFound, create the subfolder
    under ``directory`` and retry once. Returns the server-relative path
    uploaded to.

    ``client`` is any object with ``upload(folder, file_name, content)``
    raising FolderNotFound when the folder is missing, and
    ``create_folder(parent, name)`` — tests use an in-memory fake;
    production adapts office365's ClientContext.
    """
    target = f"{directory}/{subdirectory}" if subdirectory else directory
    try:
        client.upload(target, file_name, content)
    except FolderNotFound:
        if not subdirectory:
            raise
        client.create_folder(directory, subdirectory)
        client.upload(target, file_name, content)
    return f"{target}/{file_name}"


# ---------------------------------------------------------------------------
# SOAP write-back sink (InTime setBalance shape)
# ---------------------------------------------------------------------------


def generate_rpc_xml(
    soap_url: str, request: str, params: Sequence[dict], prefix: str = "v3"
) -> str:
    """RPC-style SOAP 1.1 envelope with a namespaced request element and
    flat parameter tags — ``generate_xml`` (gcs_utils.py:924-946). The
    namespace derives from the service URL fragment, matching the
    reference's ``http://<soap_url>.rise.intimesoft.com/`` convention."""
    body = "".join(f"<{p['tag']}>{p['content']}</{p['tag']}>" for p in params)
    ns = f"http://{soap_url}.rise.intimesoft.com/"
    return (
        '<S:Envelope xmlns:S="http://schemas.xmlsoap.org/soap/envelope/" '
        f'xmlns:{prefix}="{ns}">'
        f"<S:Body><{prefix}:{request}>{body}</{prefix}:{request}></S:Body>"
        "</S:Envelope>"
    )


#: the InTime service's "update failed" response shape
#: (intime_set_balances_gcs.py:50): an envelope whose return element is empty.
EMPTY_SOAP_RESPONSE: dict = {"root": {"return": None}}


@dataclass
class WriteBackResult:
    """Per-row outcome log of a SOAP write-back run."""

    updated: list[dict] = field(default_factory=list)
    failed: list[dict] = field(default_factory=list)


def soap_write_back(
    rows: Sequence[dict],
    build_params: Callable[[dict], list[dict]],
    post: Callable[[str], dict],
    soap_url: str = "timebank.export.attendance.bo",
    request: str = "setBalance",
    prefix: str = "tns",
    retries: int = 3,
) -> WriteBackResult:
    """Write each row back to a SOAP service, one RPC envelope per row,
    keeping an update log — the InTime balance-correction loop
    (intime_set_balances_gcs.py:22-60):

    - ``build_params(row)`` maps a row to the tag/content list (the
      reference maps Employee ID / Time Bank Reference / date / balance);
    - a response equal to ``EMPTY_SOAP_RESPONSE`` means the service
      rejected the update → the row goes to ``failed``; anything else is a
      success → the row goes to ``updated`` (the alertable CSV);
    - each post is wrapped in the extraction layer's exponential backoff
      (transient-fault posture shared with every other connector).

    Driver-side by design: the mismatch report this consumes is a small
    reconciliation diff (compare_timebank_balances output), not a table.
    """
    result = WriteBackResult()
    for row in rows:
        envelope = generate_rpc_xml(soap_url, request, build_params(row), prefix)
        response = backoff_retry(lambda: post(envelope), retries=retries, base_sleep=0.0, sleep=lambda _s: None)
        if response == EMPTY_SOAP_RESPONSE:
            result.failed.append(dict(row))
        else:
            result.updated.append(dict(row))
    return result
