"""Text-line ingest: the reference's native input formats.

Beamium scrapes Prometheus text or reads Sensision ``.metrics``
files-of-lines (SURVEY.md §2.1 S2/S3). Here that becomes
``ray.data.read_text`` over a directory of line files feeding the same
vectorized parse stage — one bounded batch job replaces the periodic
scanner; the resume manifest replaces "only new files" incremental
logic (SURVEY.md S2 mapping).
"""

from __future__ import annotations

import pyarrow as pa

from beamium_ray.stages.parse import format_warp10_batch, parse_table


def read_metric_lines(paths: str | list[str], file_extension: str | None = "metrics"):
    """Dataset with a ``line`` column from ``*.metrics`` text files.

    Only the configured extension is scanned (ref ``src/constants.rs:7``,
    enforced at ``src/lib/asynch/fs.rs:83``); zero-length files are
    simply empty (the reference deletes them, ``fs.rs:120-132`` — a
    batch read has nothing to clean up).
    """
    import ray.data

    kwargs = {}
    if file_extension:
        kwargs["file_extensions"] = [file_extension]
    ds = ray.data.read_text(paths, **kwargs)
    return ds.map_batches(
        lambda b: pa.table({"line": b["text"]}),
        batch_format="pyarrow",
        batch_size=None,
    )


def read_metric_lines_whole_files(
    paths: str | list[str], file_extension: str | None = "metrics"
):
    """Like :func:`read_metric_lines` but NEVER splits a file across
    blocks: each block holds whole files, so line adjacency within a
    file is preserved into ``map_batches`` batches. Required for
    Warp10 '='-continuation inheritance — the reference's writer keeps
    a continuation glued to its parent within one file
    (``src/scraper.rs:239``), and this reader keeps that guarantee
    through ingest (``read_text`` may split a file mid-stream and
    orphan a continuation at a block boundary)."""
    import ray.data

    kwargs = {}
    if file_extension:
        kwargs["file_extensions"] = [file_extension]
    ds = ray.data.read_binary_files(paths, **kwargs)

    def split(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = pc.cast(b["bytes"], pa.string())
        lines = pc.split_pattern(txt, "\n").combine_chunks().flatten()
        lines = lines.filter(pc.invert(pc.equal(lines, "")))
        return pa.table({"line": lines})

    return ds.map_batches(split, batch_format="pyarrow", batch_size=None)


def parse_lines_dataset(
    ds,
    fmt: str = "prometheus",
    now_us: int = 0,
    passthrough: list[str] | None = None,
):
    """Format dispatch (P3, ref ``transcompiler.rs:15-30``): Prometheus
    lines are transcompiled; Sensision lines pass through trimmed."""
    if fmt == "prometheus":
        return ds.map_batches(
            lambda b: parse_table(b, now_us, "line", passthrough),
            batch_format="pyarrow",
            batch_size=None,
        )
    if fmt == "sensision":

        def _trim(b: pa.Table) -> pa.Table:
            out = b.set_column(
                b.column_names.index("line"), "line", format_warp10_batch(b["line"])
            )
            return out

        return ds.map_batches(_trim, batch_format="pyarrow", batch_size=None)
    raise ValueError(f"unknown format {fmt!r} (prometheus|sensision)")
