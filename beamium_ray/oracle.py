"""Pure-Python line-level oracle: reference-exact parse/relabel semantics.

Transliterates the *behavior* of the reference's line operators so the
vectorized Arrow stages can be conformance-tested row-by-row against it
(SURVEY.md §5 strategy 2):

- ``format_prometheus`` — reference ``src/lib/transcompiler.rs:38-109``
- ``format_warp10``     — reference ``src/lib/transcompiler.rs:33-35``
- ``add_labels``        — reference ``src/lib/mod.rs:26-52``
- ``remove_labels``     — reference ``src/lib/mod.rs:55-101``
- URL-encoding parity with Rust ``urlencoding::encode`` (everything but
  ``[A-Za-z0-9_.~-]`` percent-encoded, uppercase hex, UTF-8 bytes) —
  fixtures ``src/lib/transcompiler.rs:164-194``.

This module is NOT used in the hot path — it is the spec.
"""

from __future__ import annotations

import re

_SAFE = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.~-"
)

_INT_RE = re.compile(r"^[+-]?[0-9]+$")


class LineError(ValueError):
    """Parse error — the reference logs and skips such lines."""


def urlencode(s: str) -> str:
    """Percent-encode every UTF-8 byte outside ``[A-Za-z0-9_.~-]``.

    Matches Rust ``urlencoding::encode`` (uppercase hex), e.g.
    ``1%3 -> 1%253``, ``1 3 -> 1%203``, ``1+3 -> 1%2B3``
    (reference fixtures ``src/lib/transcompiler.rs:164-194``).
    """
    out = []
    for b in s.encode("utf-8"):
        if b in _SAFE:
            out.append(chr(b))
        else:
            out.append("%%%02X" % b)
    return "".join(out)


def format_warp10(line: str) -> str:
    """Sensision passthrough: trim only (ref ``transcompiler.rs:33-35``)."""
    return line.strip()


def parse_warp10_lines(lines: list[str]) -> list[dict]:
    """Pure-Python SPEC for the engine's Warp10/Sensision columnar
    ingest (``stages/parse.py:parse_warp10_batch``) — row-at-a-time,
    mirrored byte-for-byte by the vectorized kernels (property-tested).

    Full lines: ``ts// class{labels} value`` (integer i64 ts, '{'
    after the first '/', matching '}' = LAST '}' in the line, value
    after '} '). Continuations: ``=ts// value`` inherit class+labels
    from the nearest PRECEDING full line that parsed successfully;
    orphans (no such predecessor) are dropped. Junk rows are dropped.
    """
    import re

    out: list[dict] = []
    prev: dict | None = None
    int_re = re.compile(r"^[+-]?[0-9]+$")
    val_re = re.compile(r"^[+-]?([0-9]*\.?[0-9]+([eE][+-]?[0-9]+)?)$")

    def parse_ts(tok: str) -> int | None:
        if not int_re.match(tok):
            return None
        v = int(tok)
        if not (-(2**63) <= v < 2**63):
            return None
        return v

    for raw in lines:
        line = (raw or "").strip()
        if not line:
            continue
        if line.startswith("="):
            body = line[1:]
            slash = body.find("/")
            if slash < 1 or body[slash: slash + 3] != "// " or len(body) <= slash + 3:
                continue
            ts = parse_ts(body[:slash])
            if ts is None or prev is None:
                continue
            vs = body[slash + 3:]
            out.append(
                {
                    "ts": ts,
                    "class": prev["class"],
                    "labels": prev["labels"],
                    "value_str": vs,
                    "value": float(vs) if val_re.match(vs) else None,
                }
            )
            continue
        slash = line.find("/")
        brace = line.find("{")
        rbrace = line.rfind("}")
        if (
            slash < 1
            or brace <= slash
            or rbrace <= brace
            or line[slash: slash + 3] != "// "
        ):
            continue
        ts = parse_ts(line[:slash])
        if ts is None:
            continue
        vs = line[rbrace + 2:] if rbrace + 2 <= len(line) else ""
        row = {
            "ts": ts,
            "class": line[slash + 3: brace],
            "labels": line[brace + 1: rbrace],
            "value_str": vs,
            "value": float(vs) if val_re.match(vs) else None,
        }
        out.append(row)
        prev = row
    return out


def format_prometheus(line: str, now: int) -> str:
    """One Prometheus text line -> one Warp10 line ``ts// class{labels} value``.

    Returns "" for dropped lines (comment / empty / ±Inf / NaN values).
    Raises LineError where the reference returns Err (caller skips+counts).
    ``now`` is the scrape-time timestamp in µs, captured once per partition
    (ref ``transcompiler.rs:16-21``; determinism note SURVEY.md §2.3 T4).
    """
    line = line.strip()
    if not line or line.startswith("#"):
        return ""

    # class boundary: last '}' when braces present, else first space
    # (ref transcompiler.rs:47-52)
    if "{" in line:
        idx = line.rfind("}")
        if idx < 0:
            raise LineError("bad class")
    else:
        idx = line.find(" ")
        if idx < 0:
            raise LineError("bad class")
    class_part, rest = line[: idx + 1], line[idx + 1 :]

    tokens = rest.split()
    if not tokens:
        raise LineError("no value")
    value = tokens[0]

    # drop rule (ref transcompiler.rs:55-60)
    if value in ("+Inf", "-Inf", "nan", "NaN"):
        return ""

    # timestamp: 2nd token, ms -> µs when an i64, else `now` (ref :62-66;
    # i64::from_str_radix errors on out-of-range, the ×1000 wraps like
    # release-mode Rust two's complement)
    timestamp = now
    if len(tokens) >= 2 and _INT_RE.match(tokens[1]):
        v = int(tokens[1])
        if -(2**63) <= v < 2**63:
            w = (v * 1000) & (2**64 - 1)
            timestamp = w - 2**64 if w >= 2**63 else w

    # class + quote-aware label machine (ref :68-104)
    brace = class_part.find("{")
    if brace < 0:
        klass, plabels = class_part, None
    else:
        klass, plabels = class_part[:brace], class_part[brace + 1 :]
    klass = urlencode(klass.strip())

    if plabels is None:
        slabels = ""
    else:
        parts: list[str] = []
        in_label = False
        buf: list[str] = []
        for c in plabels:
            if c == '"':
                in_label = not in_label
                continue
            if not in_label and c in ("=", ",", "}"):
                parts.append(urlencode("".join(buf)))
                buf = []
                if c == ",":
                    parts.append(",")
                elif c == "=":
                    parts.append("=")
                continue
            buf.append(c)
        slabels = "".join(parts)

    return "%d// %s{%s} %s" % (timestamp, klass, slabels, value)


def add_labels(line: str, labels: str) -> str:
    """Prepend static ``k=v,k=v`` labels to a formatted line.

    Reference ``src/lib/mod.rs:26-52``: empty config is identity; the new
    labels are PREPENDED; a separating comma only when existing labels are
    non-empty; a line without '{' is an error.
    """
    if not labels:
        return line
    brace = line.find("{")
    if brace < 0:
        raise LineError("no_labels")
    klass, plabels = line[:brace], line[brace + 1 :]
    sep = "" if plabels.strip().startswith("}") else ","
    return "%s{%s%s%s" % (klass, labels, sep, plabels)


def remove_labels(line: str, labels_to_drop: list[str]) -> str:
    """Drop the given label keys from a formatted line.

    Reference ``src/lib/mod.rs:55-101``: split at first '{' then at the
    first "} "; label items split on ',' then '=' with key = 2nd-from-last
    element and value = last (so ``a=b=c`` parses key ``b``, value ``c``);
    items with fewer than 2 '='-parts vanish.
    """
    if not labels_to_drop:
        return line
    brace = line.find("{")
    if brace < 0:
        raise LineError("no_labels")
    klass, plabels = line[:brace], line[brace + 1 :]
    end = plabels.find("} ")
    if end < 0:
        raise LineError("no_end")
    labels_str, value = plabels[:end], plabels[end + 2 :]

    kept: list[str] = []
    for item in labels_str.split(","):
        splits = item.split("=")
        if len(splits) < 2:
            continue
        val = splits[-1]
        key = splits[-2]
        if key in labels_to_drop:
            continue
        kept.append("%s=%s" % (key, val))
    return "%s{%s} %s" % (klass, ",".join(kept), value)


def whitelist_match(line: str, patterns: list[str]) -> bool:
    """Scraper metric whitelist: unanchored search of ANY pattern against
    the WHOLE formatted line (ref ``src/scraper.rs:204-208`` RegexSet)."""
    return any(re.search(p, line) for p in patterns)


def selector_match(line: str, selector: str) -> bool:
    """Sink routing predicate: regex anchored as ``^pattern`` against the
    2nd whitespace token, i.e. ``class{labels}``
    (ref ``src/router.rs:179-197``, ``src/conf.rs:329-336``)."""
    tokens = line.split()
    if len(tokens) < 2:
        return False
    # the reference literally prepends '^' to the pattern text, so
    # "a|b" becomes "^a|b" (alternation binds looser than the anchor)
    return re.search("^" + selector, tokens[1]) is not None
