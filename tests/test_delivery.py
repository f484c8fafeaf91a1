"""Delivery-sink tests with fake transports (hermetic)."""

from __future__ import annotations

import base64

import pytest

from data_rivers_spark.sources.delivery import (
    EMPTY_SOAP_RESPONSE,
    FolderNotFound,
    alert_email,
    email_report,
    generate_rpc_xml,
    rows_to_csv_bytes,
    sharepoint_upload,
    soap_write_back,
)

CSV = b"employee_num,first_name\n101,Alice\n102,Bob\n103,Carol\n104,Dave\n"


def test_email_report_sends_with_attachment():
    sent = []
    res = email_report(
        CSV,
        recipients=["a@example.org", "b@example.org"],
        cc=["c@example.org"],
        subject="weekly report",
        body_html="<p>attached</p>",
        attachment_name="report",
        from_email="noreply@example.org",
        transport=sent.append,
    )
    assert res.sent and len(sent) == 1
    msg = sent[0]
    assert msg.recipients == ["a@example.org", "b@example.org"]
    assert msg.cc == ["c@example.org"]
    assert msg.attachment_name == "report.csv"
    assert msg.attachment_type == "application/csv"
    assert base64.b64decode(msg.attachment_b64) == CSV


def test_email_report_min_length_gate():
    # a header-only CSV under 50 bytes sends nothing (gcs_to_email's
    # "Requested file is empty" branch)
    sent = []
    res = email_report(
        b"id\n",
        recipients=["a@example.org"],
        cc=None,
        subject="s",
        body_html="b",
        attachment_name="r",
        from_email="f@example.org",
        transport=sent.append,
    )
    assert not res.sent and sent == [] and "empty" in res.reason


def test_email_report_weekday_gate():
    sent = []
    kwargs = dict(
        recipients=["a@example.org"],
        cc=None,
        subject="s",
        body_html="b",
        attachment_name="r",
        from_email="f@example.org",
        transport=sent.append,
        weekday_gate=(True, 2),
    )
    assert not email_report(CSV, today_weekday=4, **kwargs).sent
    assert email_report(CSV, today_weekday=2, **kwargs).sent
    assert len(sent) == 1


def test_email_report_dry_run_builds_but_does_not_send():
    res = email_report(
        CSV,
        recipients=["a@example.org"],
        cc=None,
        subject="s",
        body_html="b",
        attachment_name="r",
        from_email="f@example.org",
        transport=None,
    )
    assert not res.sent and res.message is not None
    assert res.message.attachment_b64 is not None


def test_alert_email_rows_attachment_and_no_gates():
    sent = []
    rows = [{"id": 1, "bank": "VAC"}, {"id": 2, "bank": "SIC"}]
    res = alert_email(
        recipients=["ops@example.org"],
        cc=None,
        subject="ALERT",
        content_html="<p>updates</p>",
        from_email="noreply@example.org",
        transport=sent.append,
        rows=rows,
        attachment_name="updates.csv",
    )
    assert res.sent
    body = base64.b64decode(sent[0].attachment_b64).decode()
    assert body.splitlines() == ["id,bank", "1,VAC", "2,SIC"]


def test_rows_to_csv_bytes_empty_and_column_order():
    assert rows_to_csv_bytes([]) == b""
    rows = [{"b": 2, "a": 1}]
    assert rows_to_csv_bytes(rows, columns=["a", "b"]).decode().splitlines() == ["a,b", "1,2"]


class FakeSharePoint:
    def __init__(self, folders):
        self.folders = set(folders)
        self.uploads = []

    def upload(self, folder, file_name, content):
        if folder not in self.folders:
            raise FolderNotFound(folder)
        self.uploads.append((folder, file_name, content))

    def create_folder(self, parent, name):
        assert parent in self.folders
        self.folders.add(f"{parent}/{name}")


def test_sharepoint_upload_direct():
    sp = FakeSharePoint({"Shared Documents/reports", "Shared Documents/reports/2026/08"})
    path = sharepoint_upload(sp, CSV, "Shared Documents/reports", "new_hires.csv", "2026/08")
    assert path == "Shared Documents/reports/2026/08/new_hires.csv"
    assert sp.uploads == [("Shared Documents/reports/2026/08", "new_hires.csv", CSV)]


def test_sharepoint_upload_creates_missing_subfolder():
    # the reference's ClientRequestException → create-then-retry branch
    sp = FakeSharePoint({"Shared Documents/reports"})
    sharepoint_upload(sp, CSV, "Shared Documents/reports", "new_hires.csv", "2026/09")
    assert "Shared Documents/reports/2026/09" in sp.folders
    assert len(sp.uploads) == 1


def test_sharepoint_upload_missing_root_raises():
    sp = FakeSharePoint(set())
    with pytest.raises(FolderNotFound):
        sharepoint_upload(sp, CSV, "Shared Documents/missing", "f.csv")


def test_generate_rpc_xml_shape():
    xml = generate_rpc_xml(
        "timebank.export.attendance.bo",
        "setBalance",
        [{"tag": "employeeId", "content": "101"}, {"tag": "balance", "content": 8.5}],
        prefix="tns",
    )
    assert 'xmlns:tns="http://timebank.export.attendance.bo.rise.intimesoft.com/"' in xml
    assert "<tns:setBalance><employeeId>101</employeeId><balance>8.5</balance></tns:setBalance>" in xml


def test_soap_write_back_logs_success_and_failure():
    posts = []

    def post(envelope):
        posts.append(envelope)
        # reject employee 102 with the empty-return envelope
        if "<employeeId>102</employeeId>" in envelope:
            return EMPTY_SOAP_RESPONSE
        return {"root": {"return": {"status": "ok"}}}

    rows = [
        {"employee_id": "101", "bank": "VAC", "balance": 8.5},
        {"employee_id": "102", "bank": "SIC", "balance": 1.0},
        {"employee_id": "103", "bank": "VAC", "balance": 2.0},
    ]
    res = soap_write_back(
        rows,
        build_params=lambda r: [
            {"tag": "employeeId", "content": r["employee_id"]},
            {"tag": "timeBankRef", "content": r["bank"]},
            {"tag": "balance", "content": r["balance"]},
        ],
        post=post,
    )
    assert [r["employee_id"] for r in res.updated] == ["101", "103"]
    assert [r["employee_id"] for r in res.failed] == ["102"]
    assert len(posts) == 3


def test_soap_write_back_retries_transient_faults():
    attempts = {"n": 0}

    def post(envelope):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise ConnectionError("transient")
        return {"root": {"return": "ok"}}

    res = soap_write_back(
        [{"employee_id": "101"}],
        build_params=lambda r: [{"tag": "employeeId", "content": r["employee_id"]}],
        post=post,
    )
    assert res.updated and attempts["n"] == 2
