"""Vectorized parse/relabel/filter stages vs the pure-Python oracle.

Conformance strategy from SURVEY.md §5: every row the oracle produces,
the Arrow kernels must reproduce exactly (and drop exactly the rows the
oracle drops). Includes seeded randomized property tests.
"""

from __future__ import annotations

import random
import string as _string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from beamium_ray import oracle
from beamium_ray.stages.filters import route_batch, whitelist_batch
from beamium_ray.stages.parse import parse_prometheus_batch
from beamium_ray.stages.relabel import (
    add_labels_column,
    relabel_batch,
    remove_labels_column,
)

NOW = 1_484_828_198_557_102


def oracle_lines(lines: list[str], now: int = NOW) -> list[str]:
    out = []
    for l in lines:
        try:
            f = oracle.format_prometheus(l, now)
        except oracle.LineError:
            continue
        if f:
            out.append(f)
    return out


def engine_lines(lines: list[str], now: int = NOW) -> list[str]:
    t = parse_prometheus_batch(pa.array(lines), now)
    return t["line"].to_pylist()


FIXTURE_LINES = [
    'f{job_id="123"} +Inf',
    'f{job_id="123"} -Inf',
    "",
    "   ",
    "# HELP f number of foo",
    'f{job_id="123"} nan',
    'f{job_id="123"} NaN',
    'f{job_id="1%3"} 1',
    'f{job_id="1 3"} 1',
    'f{job_id="1+3"} 1',
    'f{job_id="123"} 10 1484828198557',
    'f{job_id="123"} 10 not-a-ts',
    "http_requests_total 42",
    'f{k="a,b=c"} 1',
    'metric_with_many{a="1",b="2",c="3"} 1.5e3 1600000000000',
    "no_space_no_brace",  # oracle error → dropped
    'f{} 3',
    'weird{a="x"} 10 99 extra tokens',
    'f{ a = "1" , b = "2" } 7',
    'f{unquoted=raw,q="v"} 8',
    'üñïçødé{å="ø"} 1',
    "a} b{c 1",  # first '{' AFTER the last '}': brace belongs to the value
    "x} {y} 2",
    "p}q r 3",
]


def test_fixture_lines_match_oracle():
    assert engine_lines(FIXTURE_LINES) == oracle_lines(FIXTURE_LINES)


def test_parsed_columns():
    t = parse_prometheus_batch(pa.array(['f{job_id="1 3"} 2.5 1000']), NOW)
    assert t["ts"].to_pylist() == [1_000_000]
    assert t["class"].to_pylist() == ["f"]
    assert t["labels"].to_pylist() == ["job_id=1%203"]
    assert t["value_str"].to_pylist() == ["2.5"]
    assert t["value"].to_pylist() == [2.5]
    assert t["line"].to_pylist() == ["1000000// f{job_id=1%203} 2.5"]


def _random_line(rng: random.Random) -> str:
    choice = rng.random()
    if choice < 0.05:
        return ""
    if choice < 0.1:
        return "# comment " + "".join(rng.choices(_string.printable.strip(), k=5))
    name = "".join(rng.choices(_string.ascii_lowercase + "_:", k=rng.randint(1, 10)))
    nlabels = rng.randint(0, 4)
    labelchars = _string.ascii_letters + _string.digits + " %+.-/|{=,#"
    labels = ",".join(
        '%s="%s"'
        % (
            "".join(rng.choices(_string.ascii_lowercase, k=rng.randint(1, 6))),
            "".join(rng.choices(labelchars, k=rng.randint(0, 8))),
        )
        for _ in range(nlabels)
    )
    value = rng.choice(
        ["1", "2.5", "-0.25", "1e10", "+Inf", "-Inf", "nan", "NaN", "3.14"]
    )
    ts = rng.choice(["", " 1600000000000", " -5", " xx", " 99999999999999999999"])
    if nlabels == 0 and rng.random() < 0.5:
        return f"{name} {value}{ts}"
    return f"{name}{{{labels}}} {value}{ts}"


def test_randomized_parse_matches_oracle():
    rng = random.Random(42)
    lines = [_random_line(rng) for _ in range(5000)]
    assert engine_lines(lines) == oracle_lines(lines)


def test_randomized_relabel_matches_oracle():
    rng = random.Random(7)
    raw = [_random_line(rng) for _ in range(3000)]
    formatted = oracle_lines(raw)
    add = "host=foo,rack=r%201"
    drop = ["job", "host", "aa"]
    want = [
        oracle.remove_labels(oracle.add_labels(l, add), drop) for l in formatted
    ]

    t = parse_prometheus_batch(pa.array(raw), NOW)
    t = relabel_batch(t, add=add, drop=drop)
    assert t["line"].to_pylist() == want


def test_remove_label_multi_eq_item():
    # reference quirk: 'a=b=c' → key 'b', re-emitted as 'b=c'
    out = remove_labels_column(pa.array(["a=b=c,x=1"]), ["zz"])
    assert out.to_pylist() == ["b=c,x=1"]
    out = remove_labels_column(pa.array(["a=b=c,x=1"]), ["b"])
    assert out.to_pylist() == ["x=1"]
    # item with no '=' vanishes
    out = remove_labels_column(pa.array(["noeq,x=1"]), ["zz"])
    assert out.to_pylist() == ["x=1"]
    # empty labels stay empty
    out = remove_labels_column(pa.array(["", "x=1"]), ["x"])
    assert out.to_pylist() == ["", ""]


def test_add_labels_column_matches_oracle():
    cases = ["", "a=1", "a=1,b=2"]
    got = add_labels_column(pa.array(cases), "h=x,r=y").to_pylist()
    for inp, out in zip(cases, got):
        line = f"1// f{{{inp}}} 1"
        assert f"1// f{{{out}}} 1" == oracle.add_labels(line, "h=x,r=y")


def test_whitelist_and_selector_match_oracle():
    rng = random.Random(13)
    raw = [_random_line(rng) for _ in range(2000)]
    formatted = oracle_lines(raw)
    t = parse_prometheus_batch(pa.array(raw), NOW)

    patterns = ["a", "[0-9]{3}", "^16"]
    want = [l for l in formatted if oracle.whitelist_match(l, patterns)]
    got = whitelist_batch(t, patterns)["line"].to_pylist()
    assert got == want

    for sel in ["a", "a.*b", "x|y"]:
        want = [l for l in formatted if oracle.selector_match(l, sel)]
        got = route_batch(t, sel)["line"].to_pylist()
        assert got == want
    assert route_batch(t, None).num_rows == t.num_rows


def test_empty_batch():
    t = parse_prometheus_batch(pa.array([], pa.string()), NOW)
    assert t.num_rows == 0
    t2 = parse_prometheus_batch(pa.array(["# only", "", "   "]), NOW)
    assert t2.num_rows == 0
    assert relabel_batch(t2, add="a=1", drop=["x"]).num_rows == 0
