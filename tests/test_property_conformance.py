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


# ---- Warp10 ingest (full lines + '='-continuations) vs oracle spec ----

w10_class = st.text(alphabet="abcdef.:_0123456789", min_size=1, max_size=10)
w10_labels = st.text(alphabet="abc=,%20 ", max_size=12)
w10_value = st.sampled_from(
    ["1", "-2.5", "1e9", "3.14", "abc", "", "+0.5", "NaN"]
)
w10_ts = st.sampled_from(
    ["0", "123", "-1", "9223372036854775807", "9223372036854775808",
     "99999999999999999999", "xx", "+7", ""]
)


@st.composite
def warp10_line(draw):
    kind = draw(st.integers(0, 9))
    ts = draw(w10_ts)
    v = draw(w10_value)
    if kind <= 5:  # full line
        klass = draw(w10_class)
        lab = draw(w10_labels)
        return f"{ts}// {klass}{{{lab}}} {v}"
    if kind <= 7:  # continuation
        return f"={ts}// {v}"
    if kind == 8:  # junk shapes
        return draw(
            st.sampled_from(
                ["garbage", "1/x{y} 2", "5//missing{space} 1 "[:-1],
                 "  ", "=", "=5//", "=bogus// 3", "1// noclose{ 2"]
            )
        )
    return ""


@settings(max_examples=200, deadline=None)
@given(st.lists(warp10_line(), max_size=25))
def test_warp10_parse_matches_oracle_spec(lines):
    got = parse_warp10_batch(pa.array(lines, pa.string()))
    want = oracle.parse_warp10_lines(lines)
    assert got.num_rows == len(want), (lines, got.to_pylist(), want)
    for col in ["ts", "class", "labels", "value_str", "value"]:
        g = got[col].to_pylist()
        w = [r[col] for r in want]
        assert g == w, (col, lines)


# ---- connected components vs brute-force BFS on random graphs ----


def _bfs_components(edge_list):
    """Brute force: BFS components over the undirected edge list."""
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    for start in sorted(adj):
        if start in want:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            want[x] = m
    return want


def _cc_check(edge_list, thresh, ray_np=4):
    import ray.data

    from beamium_ray.datapipe.dedup import connected_components

    edges = pa.table(
        {
            "a": pa.array([a for a, _ in edge_list], pa.int64()),
            "b": pa.array([b for _, b in edge_list], pa.int64()),
        }
    )
    out = connected_components(
        ray.data.from_arrow(edges), driver_threshold=thresh,
        num_partitions=ray_np,
    )
    got = {r["doc_id"]: r["cluster"] for r in out.take_all()}
    assert got == _bfs_components(edge_list), (edge_list, thresh)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
)
def test_connected_components_matches_bfs_driver(ray_session, edge_list):
    """Property coverage on the DRIVER union-find (cheap per example —
    one tiny Ray materialize + pure-Python union-find). ray_session is
    the conftest SESSION-scoped fixture (hypothesis only forbids
    function-scoped fixtures in @given tests)."""
    _cc_check(edge_list, thresh=10_000_000)


def test_connected_components_matches_bfs_distributed(ray_session):
    """The distributed edge-relax + pointer-jump path costs ~15 Ray
    executions per graph, so it gets a FIXED seeded battery instead of
    a hypothesis sweep (shrinking would replay it hundreds of times)."""
    import random

    rng = random.Random(7)
    for _ in range(3):
        n_edges = rng.randint(3, 30)
        edge_list = [
            (rng.randint(0, 25), rng.randint(0, 25)) for _ in range(n_edges)
        ]
        _cc_check(edge_list, thresh=0)
