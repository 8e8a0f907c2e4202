"""Hypothesis property tests: vectorized kernels ≡ line-level oracle
for arbitrary generated content (SURVEY.md §5 item 5)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from beamium_ray import oracle
from beamium_ray.stages.parse import parse_prometheus_batch, parse_warp10_batch
from beamium_ray.stages.relabel import add_labels_column, remove_labels_column

NOW = 77

# label values may contain anything except '"' (which terminates the
# quoted value) — including delimiters, unicode, spaces, percent signs
label_value = st.text(
    alphabet=st.characters(blacklist_characters='"', blacklist_categories=("Cs",)),
    max_size=12,
)
label_key = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)
metric_name = st.text(alphabet="abcdefghijklmnop_:0123456789", min_size=1, max_size=12)
value_tok = st.sampled_from(
    ["0", "1", "-2.5", "1e9", "3.14", "+Inf", "-Inf", "nan", "NaN", "abc"]
)
ts_tok = st.sampled_from(["", "12345", "-1", "99999999999999999999", "xx", "+7"])


@st.composite
def prom_line(draw):
    name = draw(metric_name)
    labels = draw(st.lists(st.tuples(label_key, label_value), max_size=4))
    value = draw(value_tok)
    ts = draw(ts_tok)
    lab = ",".join(f'{k}="{v}"' for k, v in labels)
    suffix = f" {ts}" if ts else ""
    if labels:
        return f"{name}{{{lab}}} {value}{suffix}"
    if draw(st.booleans()):
        return f"{name} {value}{suffix}"
    return f"{name}{{}} {value}{suffix}"


def oracle_lines(lines):
    out = []
    for l in lines:
        try:
            f = oracle.format_prometheus(l, NOW)
        except oracle.LineError:
            continue
        if f:
            out.append(f)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(prom_line(), max_size=20))
def test_parse_matches_oracle(lines):
    got = parse_prometheus_batch(pa.array(lines, pa.string()), NOW)[
        "line"
    ].to_pylist()
    assert got == oracle_lines(lines)


@settings(max_examples=150, deadline=None)
@given(st.lists(prom_line(), max_size=10), st.lists(label_key, max_size=3))
def test_relabel_matches_oracle(lines, drop):
    formatted = oracle_lines(lines)
    if not formatted:
        return
    add = "zz=prop,yy=2"
    want = [oracle.remove_labels(oracle.add_labels(l, add), drop) for l in formatted]

    t = parse_prometheus_batch(pa.array(lines, pa.string()), NOW)
    labels = add_labels_column(t["labels"], add)
    labels = remove_labels_column(labels, drop)
    from beamium_ray.stages.parse import _compose_line

    got = _compose_line(t["ts"], t["class"], labels, t["value_str"]).to_pylist()
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(prom_line(), max_size=15))
def test_warp10_roundtrip(lines):
    p = parse_prometheus_batch(pa.array(lines, pa.string()), NOW)
    w = parse_warp10_batch(p["line"])
    assert w["line"].to_pylist() == p["line"].to_pylist()
