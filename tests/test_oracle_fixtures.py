"""The 12 reference unit fixtures, ported verbatim (FIXTURES.md §2).

Pins the pure-Python oracle to the reference's exact behavior
(reference src/lib/mod.rs:103-173 and src/lib/transcompiler.rs:111-195).
"""

from __future__ import annotations

import pytest

from beamium_ray import oracle

LINE = "1484828198557102// f{job_id=123,job_name=job1,another_id=456} 10"


# --- relabel fixtures (src/lib/mod.rs:103-173) ---

def test_no_labels_at_all():
    line = "1484828198557102// f{} 10"
    assert oracle.remove_labels(line, ["job_name", "another_id"]) == line


def test_remove_no_labels():
    assert oracle.remove_labels(LINE, []) == LINE


def test_remove_one_label():
    assert (
        oracle.remove_labels(LINE, ["job_name"])
        == "1484828198557102// f{job_id=123,another_id=456} 10"
    )


def test_remove_multiple_labels():
    assert (
        oracle.remove_labels(LINE, ["job_name", "another_id"])
        == "1484828198557102// f{job_id=123} 10"
    )


def test_add_one_label():
    line = "1562656816000000// f{type=count} 1486"
    assert (
        oracle.add_labels(line, "host=foo")
        == "1562656816000000// f{host=foo,type=count} 1486"
    )


def test_add_multiple_labels():
    line = "1562656816000000// f{type=count} 1486"
    assert (
        oracle.add_labels(line, "host=foo,rack=toto")
        == "1562656816000000// f{host=foo,rack=toto,type=count} 1486"
    )


def test_add_empty_is_identity():
    assert oracle.add_labels(LINE, "") == LINE


def test_add_to_empty_labels_no_comma():
    line = "1562656816000000// f{} 1486"
    assert oracle.add_labels(line, "host=foo") == "1562656816000000// f{host=foo} 1486"


# --- transcompiler fixtures (src/lib/transcompiler.rs:111-195), now=1 ---

@pytest.mark.parametrize(
    "line",
    [
        'f{job_id="123"} +Inf',
        'f{job_id="123"} -Inf',
        "",
        "# HELP f number of foo",
        'f{job_id="123"} nan',
        'f{job_id="123"} NaN',
    ],
)
def test_prometheus_skip(line):
    assert oracle.format_prometheus(line, 1) == ""


@pytest.mark.parametrize(
    "line,expected",
    [
        ('f{job_id="1%3"} 1', "1// f{job_id=1%253} 1"),
        ('f{job_id="1 3"} 1', "1// f{job_id=1%203} 1"),
        ('f{job_id="1+3"} 1', "1// f{job_id=1%2B3} 1"),
    ],
)
def test_prometheus_urlencoding(line, expected):
    assert oracle.format_prometheus(line, 1) == expected


# --- additional edges defined by reference code (FIXTURES.md §2.2) ---

def test_prometheus_ms_timestamp_to_us():
    assert (
        oracle.format_prometheus('f{job_id="123"} 10 1484828198557', 1)
        == "1484828198557000// f{job_id=123} 10"
    )


def test_prometheus_bad_timestamp_falls_back_to_now():
    assert (
        oracle.format_prometheus('f{job_id="123"} 10 not-a-ts', 7)
        == "7// f{job_id=123} 10"
    )


def test_prometheus_no_braces():
    assert oracle.format_prometheus("http_requests_total 42", 5) == (
        "5// http_requests_total{} 42"
    )


def test_sensision_passthrough():
    assert oracle.format_warp10("  1// a{} 2  ") == "1// a{} 2"


def test_quoted_delimiters_stay_in_value():
    # ',' and '=' inside quotes are part of the value, then URL-encoded
    assert (
        oracle.format_prometheus('f{k="a,b=c"} 1', 1)
        == "1// f{k=a%2Cb%3Dc} 1"
    )


def test_selector_and_whitelist_semantics():
    line = "1484828198557102// metrics.cpu{host=a} 1"
    assert oracle.selector_match(line, "metrics.*")
    assert not oracle.selector_match(line, "node.*")
    # whitelist is unanchored on the whole line
    assert oracle.whitelist_match(line, ["host="])
    assert not oracle.whitelist_match(line, ["^host="])
