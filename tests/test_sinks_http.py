"""HTTP forwarder sink: chunk planning, token header, backoff+retry,
delete-after-ack, loud give-up with files intact (ref http.rs:49-243)."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from beamium_ray.sinks import (
    BackoffPolicy,
    HttpSinkConf,
    forward_dataset,
    forward_spool,
    plan_post_batches,
)

FAST = BackoffPolicy(initial_s=0.01, max_s=0.02, randomization=0.0)


class _SinkRecorder:
    """Loopback sink: records acked POST bodies+headers (and serves
    ``body_to_serve`` on GET, for scrape tests); optionally 500s the
    first ``fail_first`` requests (global), like a sink that comes
    back after a blip. HTTP/1.1, so keep-alive connection reuse is
    observable via ``connections`` (one Handler per TCP connection)."""

    def __init__(
        self,
        fail_first: int = 0,
        body_to_serve: bytes = b"",
        fail_status: int = 500,
    ):
        self.lock = threading.Lock()
        self.requests = 0
        self.connections = 0
        self.acked: list[dict] = []
        self.gets: list[dict] = []
        self.fail_first = fail_first
        self.fail_status = fail_status
        self.body_to_serve = body_to_serve
        recorder = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def setup(self):
                super().setup()
                with recorder.lock:
                    recorder.connections += 1

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with recorder.lock:
                    recorder.requests += 1
                    fail = recorder.requests <= recorder.fail_first
                    if not fail:
                        recorder.acked.append({
                            "body": body,
                            "token": self.headers.get("X-Warp10-Token"),
                            "headers": dict(self.headers),
                        })
                if fail:
                    self.send_error(recorder.fail_status)
                else:
                    self.send_response(200)
                    self.send_header("Content-Length", "0")
                    self.end_headers()

            def do_GET(self):
                with recorder.lock:
                    recorder.requests += 1
                    recorder.gets.append({"headers": dict(self.headers)})
                self.send_response(200)
                self.send_header(
                    "Content-Length", str(len(recorder.body_to_serve))
                )
                self.end_headers()
                self.wfile.write(recorder.body_to_serve)

            def log_message(self, *a):
                pass

        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.srv.daemon_threads = True
        self.url = f"http://127.0.0.1:{self.srv.server_address[1]}/api/v0/update"
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_plan_post_batches_caps():
    files = [(f"f{i}", 10) for i in range(7)]
    # count cap
    assert plan_post_batches(files, 3, 10**6) == [
        ["f0", "f1", "f2"], ["f3", "f4", "f5"], ["f6"]]
    # byte cap
    assert plan_post_batches(files, 100, 25) == [
        ["f0", "f1"], ["f2", "f3"], ["f4", "f5"], ["f6"]]
    # an oversized file still ships (alone)
    assert plan_post_batches([("big", 999), ("s", 1)], 10, 100) == [
        ["big"], ["s"]]
    assert plan_post_batches([], 10, 100) == []


def _spool(tmp_path, n_files: int, lines_per: int = 3):
    spool = tmp_path / "sinkspool"
    spool.mkdir()
    expected = []
    for i in range(n_files):
        lines = [f"170000000000000{i}// seq.fwd{{f={i}}} {j}.5"
                 for j in range(lines_per)]
        (spool / f"s{i:03d}.metrics").write_text("\n".join(lines) + "\n")
        expected.extend(lines)
    return spool, expected


def test_forward_spool_acks_deletes_and_retries(ray_session, tmp_path):
    spool, expected = _spool(tmp_path, 6)
    sink = _SinkRecorder(fail_first=2)
    try:
        conf = HttpSinkConf(url=sink.url, token="tok-123", batch_count=2,
                            batch_size=10**6, backoff=FAST)
        res = forward_spool(str(spool), conf, concurrency=2)
    finally:
        sink.close()
    assert res["files"] == 6 and res["status"] == {"200": 3}
    assert res["retries"] == 2 and res["requests"] == 5
    # delete-after-ack: the spool is drained
    assert list(spool.iterdir()) == []
    # every line arrived exactly once, token header on every request
    got = sorted(
        ln for a in sink.acked
        for ln in a["body"].decode().strip().splitlines()
    )
    assert got == sorted(expected)
    assert all(a["token"] == "tok-123" for a in sink.acked)


def test_forward_spool_missing_trailing_newline_no_splice(
    ray_session, tmp_path
):
    """A spool file without its trailing newline (truncated producer)
    must not splice its last line into the next file's first line —
    that corrupts both datapoints and the ack deletes them for good."""
    spool = tmp_path / "sinkspool"
    spool.mkdir()
    (spool / "a.metrics").write_bytes(b"1700// seq.a{} 1.5")  # no \n
    (spool / "b.metrics").write_bytes(b"1700// seq.b{} 2.5\n")
    sink = _SinkRecorder()
    try:
        conf = HttpSinkConf(url=sink.url, batch_count=10,
                            batch_size=10**6, backoff=FAST)
        res = forward_spool(str(spool), conf, concurrency=1)
    finally:
        sink.close()
    assert res["files"] == 2
    got = sorted(
        ln for a in sink.acked
        for ln in a["body"].decode().strip().splitlines()
    )
    assert got == ["1700// seq.a{} 1.5", "1700// seq.b{} 2.5"]


def test_backoff_and_url_guards():
    """randomization ≥ 1 must clamp to a non-negative delay (it flows
    in unvalidated via parameters.backoff.randomization), and a
    scheme-less sink url fails as a clear config error, not a cryptic
    http.client crash inside the actor."""
    import random

    from beamium_ray.sinks.http_forward import BackoffPolicy, HttpSession

    pol = BackoffPolicy(initial_s=0.5, randomization=1.5)
    rng = random.Random(0)
    assert all(pol.delay(a, rng) >= 0.0 for a in range(6))

    with pytest.raises(ValueError, match="invalid sink url"):
        HttpSession().request(
            "POST", "localhost:8080/api", b"", {}, timeout_s=1.0
        )


def test_forward_spool_gives_up_loudly_files_intact(ray_session, tmp_path):
    spool, _ = _spool(tmp_path, 2)
    sink = _SinkRecorder(fail_first=10**9)  # permanently down
    try:
        conf = HttpSinkConf(url=sink.url, batch_count=10, batch_size=10**6,
                            backoff=FAST, max_attempts=2)
        with pytest.raises(Exception, match="after 2 attempts"):
            forward_spool(str(spool), conf, concurrency=1)
    finally:
        sink.close()
    # nothing acked ⇒ nothing deleted ⇒ a rerun re-ships everything
    assert len(list(spool.iterdir())) == 2


def test_giveup_on_permanent_client_error():
    """With max_attempts=None (daemon retry-forever), a status listed in
    giveup_on raises immediately instead of wedging the POST loop at the
    backoff cap; the same status NOT listed keeps retrying (here until
    the bounded max_attempts surfaces it)."""
    import random

    from beamium_ray.sinks.http_forward import HttpSession, _post_with_backoff

    sink = _SinkRecorder(fail_first=10**9, fail_status=403)
    try:
        conf = HttpSinkConf(
            url=sink.url, backoff=FAST, max_attempts=None,
            giveup_on=(401, 403, 413),
        )
        with pytest.raises(RuntimeError, match="non-retryable status 403"):
            _post_with_backoff(
                b"x", conf, random.Random(0), HttpSession()
            )
        assert sink.requests == 1  # no retry burned on a permanent error

        conf2 = HttpSinkConf(
            url=sink.url, backoff=FAST, max_attempts=3, giveup_on=()
        )
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            _post_with_backoff(
                b"x", conf2, random.Random(0), HttpSession()
            )
        assert sink.requests == 4  # 1 (above) + 3 bounded attempts
    finally:
        sink.close()


def test_run_multi_forward_e2e(tmp_path):
    """Full reference topology over HTTP: scraper spool → router →
    selector sink with a url → run_multi --forward ships the routed
    datapoints to the sink endpoint with the configured token."""
    import os
    import subprocess
    import sys

    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "a.metrics").write_text(
        "seq.keep{} 1.5 1700000000000\n"
        "other.drop{} 9.9 1700000000000\n"
    )
    sink = _SinkRecorder()
    conf = tmp_path / "conf.yaml"
    conf.write_text(
        "scrapers:\n"
        "  s1:\n"
        f"    input: {spool}\n"
        "    format: prometheus\n"
        "sinks:\n"
        "  w10:\n"
        "    selector: seq.*\n"
        f"    url: {sink.url}\n"
        "    token: tok-e2e\n"
    )
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    try:
        p = subprocess.run(
            [sys.executable, "-m", "beamium_ray.run_multi",
             "--config", str(conf), "--output", str(tmp_path / "out"),
             "--forward", "--num-cpus", "4"],
            capture_output=True, text=True, env=env, timeout=300,
        )
    finally:
        sink.close()
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])["sinks"]
    assert summary["w10"]["rows"] == 1  # selector dropped other.drop
    assert summary["w10"]["forwarded"]["rows"] == 1
    assert summary["w10"]["forwarded"]["status"] == {"200": 1}
    lines = [ln for a in sink.acked
             for ln in a["body"].decode().splitlines()]
    assert len(lines) == 1 and lines[0].endswith("// seq.keep{} 1.5")
    assert sink.acked[0]["token"] == "tok-e2e"
    # durable sink store stays in place (not a spool)
    assert (tmp_path / "out").exists()


def test_run_watch_relay_mode(tmp_path):
    """run_watch --relay-url: the reference's spool→sender loop. Files
    dropped across ticks are shipped once and deleted after ack."""
    import os
    import subprocess
    import sys
    import time

    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "a.metrics").write_text("1700000000000000// seq.r{} 1\n")
    sink = _SinkRecorder()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    p = subprocess.Popen(
        [sys.executable, "-m", "beamium_ray.run_watch",
         "--input", str(spool), "--relay-url", sink.url,
         "--relay-token", "tok-r", "--scan-period", "0.3",
         "--max-ticks", "200", "--idle-exit", "8", "--num-cpus", "4"],
        stdout=subprocess.PIPE, text=True, env=env,
    )
    try:
        # second file arrives mid-run
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline and not sink.acked:
            time.sleep(0.3)
        (spool / "b.metrics").write_text("1700000000000001// seq.r{} 2\n")
        p.wait(timeout=240)
    finally:
        p.terminate()
        sink.close()
    assert p.returncode == 0
    lines = sorted(ln for a in sink.acked
                   for ln in a["body"].decode().splitlines())
    assert lines == ["1700000000000000// seq.r{} 1",
                     "1700000000000001// seq.r{} 2"]
    assert all(a["token"] == "tok-r" for a in sink.acked)
    assert list(spool.iterdir()) == []  # delete-after-ack drained it


def test_forward_dataset_line_granular_chunks(ray_session):
    import ray.data

    dp = pa.table({
        "ts": pa.array([1700000000000000 + i for i in range(40)], pa.int64()),
        "class": pa.array(["seq.live"] * 40),
        "labels": pa.array(["a=b"] * 40),
        "value_str": pa.array([f"{i}.25" for i in range(40)]),
    })
    sink = _SinkRecorder()
    try:
        conf = HttpSinkConf(url=sink.url, batch_size=500, backoff=FAST)
        stats = forward_dataset(ray.data.from_arrow(dp), conf,
                                concurrency=1)
        t = pa.concat_tables(list(
            stats.iter_batches(batch_format="pyarrow", batch_size=None)))
    finally:
        sink.close()
    assert int(pa.compute.sum(t["n_rows"]).as_py()) == 40
    assert t.num_rows > 1  # byte cap actually chunked the stream
    # no line was split across bodies and the composed form is parseable
    lines = [ln for a in sink.acked
             for ln in a["body"].decode().splitlines()]
    assert sorted(lines) == sorted(
        f"{1700000000000000 + i}// seq.live{{a=b}} {i}.25"
        for i in range(40))
    assert all(len(a["body"]) <= 500 for a in sink.acked)


def test_http_session_keep_alive_reuses_connection():
    """keep_alive=True pools the socket across requests (one TCP
    connection for N posts); keep_alive=False sends Connection: close
    and dials fresh every time (conf.rs:318-319 semantics)."""
    from beamium_ray.sinks import HttpSession

    sink = _SinkRecorder()
    try:
        s = HttpSession(keep_alive=True)
        for _ in range(3):
            status, _ = s.request("POST", sink.url, b"x", {}, 5.0)
            assert status == 200
        assert sink.connections == 1
        s.close()

        nk = HttpSession(keep_alive=False)
        for _ in range(2):
            status, _ = nk.request("POST", sink.url, b"x", {}, 5.0)
            assert status == 200
        assert sink.connections == 3  # two fresh dials
        assert all(
            a["headers"].get("Connection") == "close"
            for a in sink.acked[3:]
        )
    finally:
        sink.close()


def test_http_session_keep_alive_timeout_expires():
    """An idle gap over keep-alive-timeout drops the pooled socket and
    the next request dials fresh (conf.rs:338-342)."""
    import time as _time

    from beamium_ray.sinks import HttpSession

    sink = _SinkRecorder()
    try:
        s = HttpSession(keep_alive=True, keep_alive_timeout_s=0.05)
        assert s.request("POST", sink.url, b"x", {}, 5.0)[0] == 200
        _time.sleep(0.1)
        assert s.request("POST", sink.url, b"x", {}, 5.0)[0] == 200
        assert sink.connections == 2
        s.close()
    finally:
        sink.close()


def test_custom_headers_on_forward(ray_session, tmp_path):
    """Arbitrary configured headers ride every POST (the scraper form
    is conf.rs:31/scraper.rs:100-105); the token header still wins."""
    spool, _ = _spool(tmp_path, 1)
    sink = _SinkRecorder()
    try:
        conf = HttpSinkConf(
            url=sink.url, token="tok-h", backoff=FAST,
            headers={"X-Scope-OrgID": "team-42", "X-Warp10-Token": "loser"},
        )
        forward_spool(str(spool), conf, concurrency=1)
    finally:
        sink.close()
    assert sink.acked, "nothing shipped"
    h = sink.acked[0]["headers"]
    assert h.get("X-Scope-Orgid", h.get("X-Scope-OrgID")) == "team-42"
    assert sink.acked[0]["token"] == "tok-h"  # token header wins


def test_scrape_to_spool_headers_and_chunking(tmp_path):
    """Live scrape (S1): GET with custom headers, body landed as
    .metrics spool files under the byte cap with the '='-continuation
    guard, tmp+rename atomic (scraper.rs:100-105,236-265)."""
    from beamium_ray.sources.scrape import chunk_lines, scrape_to_spool

    body = b"m_a{} 1 1700000000000\nm_b{} 2 1700000000000\n"
    sink = _SinkRecorder(body_to_serve=body)
    try:
        paths = scrape_to_spool(
            sink.url, str(tmp_path / "spool"), "s1",
            headers={"Authorization": "Bearer tok-s"},
            now_us=1700000000000000,
        )
    finally:
        sink.close()
    assert sink.gets and sink.gets[0]["headers"]["Authorization"] == \
        "Bearer tok-s"
    assert [p.rsplit("/", 1)[1] for p in paths] == \
        ["s1-1700000000000000-0.metrics"]
    with open(paths[0]) as f:
        assert f.read() == body.decode()
    # chunker: '='-continuation lines never start a new file
    chunks = chunk_lines(["a" * 10, "=cont", "b" * 10, "c" * 10], 12)
    assert chunks == [["a" * 10, "=cont"], ["b" * 10], ["c" * 10]]


def test_run_multi_scrapes_url_scraper(tmp_path):
    """run_multi with a url scraper (no input dir): one scrape tick
    lands the endpoint body in the spool and the topology routes it."""
    import os
    import subprocess
    import sys

    body = b"seq.keep{} 1.5 1700000000000\nother.drop{} 9 1700000000000\n"
    sink = _SinkRecorder(body_to_serve=body)
    conf = tmp_path / "conf.yaml"
    conf.write_text(
        "scrapers:\n"
        "  s1:\n"
        f"    url: {sink.url}\n"
        "    format: prometheus\n"
        "    headers:\n"
        "      X-Scrape-Auth: sekrit\n"
        "sinks:\n"
        "  w10:\n"
        "    selector: seq.*\n"
        "parameters:\n"
        "  timeout: 5s\n"
    )
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    try:
        p = subprocess.run(
            [sys.executable, "-m", "beamium_ray.run_multi",
             "--config", str(conf), "--output", str(tmp_path / "out"),
             "--num-cpus", "4"],
            capture_output=True, text=True, env=env, timeout=300,
        )
    finally:
        sink.close()
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])["sinks"]
    assert summary["w10"]["rows"] == 1  # selector dropped other.drop
    assert sink.gets[0]["headers"]["X-Scrape-Auth"] == "sekrit"


def test_http_conf_from_config_parameter_surface():
    """timeout / batch caps / backoff.* / keep-alive knobs / headers all
    flow from the config maps into HttpSinkConf (conf.rs:120-138)."""
    from beamium_ray.config import SinkConfig
    from beamium_ray.sinks import http_conf_from_config

    sk = SinkConfig(
        name="w", url="http://x/api", token="t", keep_alive=False,
        keep_alive_timeout="2s", headers={"X-A": "1"},
    )
    params = {
        "timeout": "5s",
        "batch-size": 1000,
        "batch-count": 7,
        "backoff": {"initial": "10ms", "max": "1s",
                    "multiplier": 2.0, "randomization": 0.1},
    }
    c = http_conf_from_config(sk, params)
    assert c.timeout_s == 5.0 and c.batch_size == 1000 and c.batch_count == 7
    assert c.backoff.initial_s == 0.01 and c.backoff.max_s == 1.0
    assert c.backoff.multiplier == 2.0 and c.backoff.randomization == 0.1
    assert c.keep_alive is False and c.keep_alive_timeout_s == 2.0
    assert c.headers == {"X-A": "1"}
    # defaults match the reference's (conf.rs:120-138,338-342)
    d = http_conf_from_config(SinkConfig(name="d", url="http://y"), {})
    assert d.timeout_s == 500.0 and d.keep_alive is True
    assert d.keep_alive_timeout_s == 3600.0
    assert d.backoff.initial_s == 0.5 and d.backoff.max_s == 60.0
    assert d.backoff.randomization == 0.3


def test_parse_duration_forms():
    from beamium_ray.config import parse_duration_s

    assert parse_duration_s("500ms") == 0.5
    assert parse_duration_s("1m") == 60.0
    assert parse_duration_s("1m30s") == 90.0
    assert parse_duration_s("500s") == 500.0
    assert parse_duration_s(7) == 7.0
    assert parse_duration_s("2.5") == 2.5
    for bad in ("", "xyz", "1x", "s"):
        with pytest.raises(ValueError):
            parse_duration_s(bad)
