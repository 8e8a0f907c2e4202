"""Live HTTP scrape source (the reference scraper's fetch→spool loop,
``src/scraper.rs``), for topologies whose scrapers name a ``url``
instead of a spool ``input`` dir.

Semantics carried over:

- the GET applies the scraper's custom ``headers`` from config
  (``conf.rs:31``, applied at ``scraper.rs:100-105``) and the global
  ``parameters.timeout`` (``scraper.rs:109,151-160``);
- a non-2xx response or transport failure is a loud fetch error
  (the reference's ``beamium_fetch_errors`` path);
- the body is written into the source spool as ``<name>-<now>-<k>``
  ``.tmp`` files renamed to ``.metrics`` (atomic finalize,
  ``scraper.rs:241-265``), chunked under ``parameters.batch-size``
  bytes — never splitting before a ``=``-continuation line (the
  sensision multi-line guard the reference chunker has);
- connections are kept alive across scrapes via
  :class:`~beamium_ray.sinks.http_forward.HttpSession`
  (``scraper.rs:59-60`` keeps hyper's pool warm the same way).

One deliberate divergence: the reference transcompiles to sensision
BEFORE spooling; this engine spools the RAW body and lets the scraper
pipeline's format dispatch (P3) parse it downstream — one parse, not
two, and the spool stays byte-faithful to the endpoint.
"""

from __future__ import annotations

import os
import time


def fetch_text(
    url: str,
    *,
    headers: dict | None = None,
    timeout_s: float = 500.0,
    session=None,
) -> str:
    """GET ``url`` with the scraper's custom headers; returns the body
    text. Raises RuntimeError on a non-2xx status or transport failure
    (the caller's tick records the fetch error and moves on, like the
    reference's error counter)."""
    from beamium_ray.sinks.http_forward import HttpSession

    owned = session is None
    session = session or HttpSession()
    try:
        status, body = session.request(
            "GET", url, None, dict(headers or {}), timeout_s
        )
    finally:
        # a session we created exists only for this call — close it or
        # its pooled keep-alive socket leaks (one per scrape on the
        # no-session path)
        if owned:
            session.close()
    if not (200 <= status < 300):
        raise RuntimeError(
            f"scrape GET {url} failed with status {status}"
            + ("" if status else " (transport error)")
        )
    return body.decode("utf-8", errors="replace")


def chunk_lines(lines: list[str], batch_size: int) -> list[list[str]]:
    """Split lines into spool-file chunks of at most ``batch_size``
    bytes each, never cutting before a ``=``-continuation line
    (``scraper.rs:236-239``: the byte budget check is skipped while the
    next line continues the previous datapoint)."""
    chunks: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for line in lines:
        if (
            cur
            and cur_bytes + len(line.encode()) > batch_size
            and not line.startswith("=")
        ):
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(line)
        cur_bytes += len(line.encode())
    if cur:
        chunks.append(cur)
    return chunks


def scrape_to_spool(
    url: str,
    source_dir: str,
    name: str,
    *,
    headers: dict | None = None,
    timeout_s: float = 500.0,
    batch_size: int = 200_000,
    now_us: int | None = None,
    session=None,
) -> list[str]:
    """One scrape tick: GET the endpoint and land its lines in the
    source spool as ``<name>-<now>-<k>.metrics`` files (tmp+rename,
    ``scraper.rs:241-265``). Returns the finalized paths; the directory
    watcher / lines source ingests them like any other spool file."""
    body = fetch_text(
        url, headers=headers, timeout_s=timeout_s, session=session
    )
    lines = [ln for ln in body.split("\n") if ln]
    now = int(time.time() * 1e6) if now_us is None else now_us
    os.makedirs(source_dir, exist_ok=True)
    out: list[str] = []
    for k, chunk in enumerate(chunk_lines(lines, batch_size)):
        final = os.path.join(source_dir, f"{name}-{now}-{k}.metrics")
        tmp = os.path.join(source_dir, f"{name}-{now}-{k}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(chunk) + "\n")
        os.replace(tmp, final)
        out.append(final)
    return out


def scrape_scraper(
    scfg,
    source_dir: str,
    *,
    parameters: dict | None = None,
    now_us: int | None = None,
    session=None,
) -> list[str]:
    """Scrape one configured scraper (:class:`EngineConfig` with
    ``url``/``headers`` set) into ``source_dir``, honoring the global
    ``parameters`` timeout and batch-size (``conf.rs:120-126``)."""
    from beamium_ray.config import parse_duration_s

    p = dict(parameters or {})

    def get(k: str, d):
        return p.get(k, p.get(k.replace("-", "_"), d))

    if not scfg.url:
        raise ValueError(f"scraper {scfg.name!r} has no url to scrape")
    return scrape_to_spool(
        scfg.url,
        source_dir,
        scfg.name or "scraper",
        headers=dict(scfg.headers or {}),
        timeout_s=parse_duration_s(get("timeout", "500s")),
        batch_size=int(get("batch-size", 200_000)),
        now_us=now_us,
        session=session,
    )
