"""Byte-level vectorized string kernels over Arrow string arrays.

These implement the reference's URL-encoding and quote-aware label
scanning (reference ``src/lib/transcompiler.rs:70-104``) as batch
operations on the raw UTF-8 buffers of a ``pyarrow.StringArray`` —
no per-row Python in the hot path. Encoding parity is with Rust
``urlencoding::encode``: every byte outside ``[A-Za-z0-9_.~-]`` becomes
``%XX`` (uppercase hex); multi-byte UTF-8 sequences are encoded
byte-by-byte, which is exactly what the reference does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SAFE_TABLE = np.zeros(256, dtype=bool)
for _b in b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.~-":
    _SAFE_TABLE[_b] = True

_HEX = np.frombuffer(b"0123456789ABCDEF", dtype=np.uint8)

_QUOTE = 0x22  # '"'
_EQ = 0x3D  # '='
_COMMA = 0x2C  # ','
_RBRACE = 0x7D  # '}'


def string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a string array as (uint8 bytes, int64 offsets).

    Accepts string / large_string, ChunkedArray (combined first). Nulls are
    not supported (callers fill/drop nulls before parsing).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if arr.null_count:
        raise ValueError("string_bytes: nulls not supported")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=offsets[-1]) if len(bufs) > 2 and bufs[2] is not None else np.empty(0, np.uint8)
    # normalize so offsets[0] == 0
    if offsets[0] != 0:
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    else:
        data = data[: offsets[-1]]
    return data, offsets


def strings_from_bytes(data: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Build a pa.StringArray from a uint8 buffer + int offsets (copies once).

    Raises when total bytes exceed INT32_MAX: with whole-block batches
    URL-encoding can expand 3×, and silently wrapping the int32 offsets
    would corrupt output (ADVICE r1). Failing loudly (instead of
    building a >2 GiB large_string only for the string cast to raise
    anyway) costs no transient copies at the worst memory moment."""
    if len(offsets) and int(offsets[-1]) > np.iinfo(np.int32).max:
        raise ValueError(
            f"strings_from_bytes: {int(offsets[-1])} total bytes exceed the "
            "2 GiB string-offset limit for one batch — reduce the block/"
            "batch size (DataContext.target_max_block_size) for this stage"
        )
    off32 = offsets.astype(np.int32)
    return pa.StringArray.from_buffers(
        len(offsets) - 1,
        pa.py_buffer(off32.tobytes()),
        pa.py_buffer(data.tobytes()),
    )


def _row_ids(offsets: np.ndarray) -> np.ndarray:
    lens = np.diff(offsets)
    return np.repeat(np.arange(len(lens), dtype=np.int64), lens)


def _scatter_encoded(
    b: np.ndarray,
    out_len: np.ndarray,
    emit_self: np.ndarray,
    emit_hex: np.ndarray,
    offsets: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble the output byte stream given per-input-byte output widths.

    out_len[i] in {0,1,3}; emit_self → copy b[i]; emit_hex → '%' + hex(b[i]).
    Returns (out_bytes, new_offsets aligned with input rows).
    """
    cum = np.cumsum(out_len, dtype=np.int64)
    total = int(cum[-1]) if len(cum) else 0
    pos = cum - out_len  # exclusive prefix sum = write position
    out = np.empty(total, dtype=np.uint8)
    if emit_self.any():
        out[pos[emit_self]] = b[emit_self]
    if emit_hex.any():
        p = pos[emit_hex]
        v = b[emit_hex]
        out[p] = 0x25  # '%'
        out[p + 1] = _HEX[v >> 4]
        out[p + 2] = _HEX[v & 0x0F]
    cum_pad = np.concatenate(([0], cum))
    new_offsets = cum_pad[offsets]
    return out, new_offsets


def urlencode_bytes(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Percent-encode every row of a byte buffer (Rust urlencoding parity)."""
    safe = _SAFE_TABLE[data]
    out_len = np.where(safe, 1, 3).astype(np.int64)
    return _scatter_encoded(data, out_len, safe, ~safe, offsets)


def urlencode_array(arr: pa.Array) -> pa.Array:
    """URL-encode each element of a string array (vectorized)."""
    data, offsets = string_bytes(arr)
    out, new_off = urlencode_bytes(data, offsets)
    return strings_from_bytes(out, new_off)


def label_machine(arr: pa.Array) -> pa.Array:
    """The reference's quote-aware label scanner, vectorized.

    Input: per row, the text after the first '{' of a Prometheus class
    (e.g. ``job_id="1 3",x="y"}``). Output: the Warp10 label string
    (``job_id=1%203,x=y``). Semantics (ref ``transcompiler.rs:73-104``):
    '"' toggles quoting and is dropped; outside quotes '=' ',' '}' flush
    the pending buffer URL-encoded and '='/',' are emitted literally
    ('}' emits nothing); everything else (including delimiters inside
    quotes) is buffered and URL-encoded on flush.
    """
    data, offsets = string_bytes(arr)
    if len(data) == 0:
        return strings_from_bytes(data, offsets)

    is_quote = data == _QUOTE
    # quotes strictly before byte i, within its row → in-quote parity
    qcum = np.cumsum(is_quote, dtype=np.int64)
    before = qcum - is_quote
    qcum_pad = np.concatenate(([0], qcum))
    row_base = qcum_pad[offsets[:-1]]
    rid = _row_ids(offsets)
    in_label = ((before - row_base[rid]) & 1).astype(bool)

    is_delim = (~in_label) & ((data == _EQ) | (data == _COMMA) | (data == _RBRACE))
    emit_delim = is_delim & (data != _RBRACE)
    is_seg = (~is_quote) & (~is_delim)
    safe_seg = is_seg & _SAFE_TABLE[data]
    unsafe_seg = is_seg & ~_SAFE_TABLE[data]

    out_len = np.zeros(len(data), dtype=np.int64)
    out_len[emit_delim] = 1
    out_len[safe_seg] = 1
    out_len[unsafe_seg] = 3
    out, new_off = _scatter_encoded(
        data, out_len, emit_delim | safe_seg, unsafe_seg, offsets
    )
    return strings_from_bytes(out, new_off)


def first_index_of(data: np.ndarray, offsets: np.ndarray, byte: int) -> np.ndarray:
    """Per row, index (row-local) of first occurrence of `byte`, -1 if none."""
    n = len(offsets) - 1
    res = np.full(n, -1, dtype=np.int64)
    hits = np.flatnonzero(data == byte)
    if len(hits):
        rid = np.searchsorted(offsets, hits, side="right") - 1
        local = hits - offsets[rid]
        # reversed so the FIRST occurrence is assigned last (np setitem: last wins)
        res[rid[::-1]] = local[::-1]
    return res


def last_index_of(data: np.ndarray, offsets: np.ndarray, byte: int) -> np.ndarray:
    """Per row, index (row-local) of last occurrence of `byte`, -1 if none."""
    n = len(offsets) - 1
    res = np.full(n, -1, dtype=np.int64)
    hits = np.flatnonzero(data == byte)
    if len(hits):
        rid = np.searchsorted(offsets, hits, side="right") - 1
        local = hits - offsets[rid]
        res[rid] = local  # ascending → last occurrence wins
    return res


def slice_rows(
    data: np.ndarray,
    offsets: np.ndarray,
    start: np.ndarray,
    stop: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row substring [start, stop) (row-local indices) → new buffer.

    start/stop are clipped to row bounds; start>stop treated as empty.
    """
    lens = np.diff(offsets)
    start = np.clip(start, 0, lens)
    stop = np.clip(stop, start, lens)
    out_lens = stop - start
    new_off = np.concatenate(([0], np.cumsum(out_lens, dtype=np.int64)))
    total = int(new_off[-1])
    # gather: for each output byte, its source index
    rid = np.repeat(np.arange(len(lens), dtype=np.int64), out_lens)
    # position within the output row
    within = np.arange(total, dtype=np.int64) - new_off[rid]
    src = offsets[:-1][rid] + start[rid] + within
    return data[src], new_off
