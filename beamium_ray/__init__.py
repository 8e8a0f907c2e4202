"""beamium_ray — a Ray-Data-native time-series rollup/downsample/retention engine.

A from-scratch rebuild of the data-processing capabilities of ovh/beamium
(reference at /root/reference, v2.0.8) on top of ``ray.data.Dataset``:

- the Prometheus-text / Sensision parsing and relabel/filter rules
  (reference ``src/lib/transcompiler.rs``, ``src/lib/mod.rs``) become
  vectorized ``map_batches`` stages over zero-copy Arrow batches;
- the scrape->route->forward file dataflow becomes a streaming Dataset
  pipeline: read_parquet -> parse/relabel -> per-tier filter ->
  windowed rollup (min/max/sum/count/last at 1m/1h/1d) with gap-fill ->
  Gorilla/delta-of-delta compressed blocks written by a stateful actor
  pool, plus per-partition lineage manifests for resume;
- beamium's DFO disk-buffer retention (TTL + size cap,
  reference ``src/sink.rs:102-221``) becomes manifest-driven retention
  over persisted rollup blocks.

Everything here derives from public knowledge only: the Ray Data and
pyarrow public APIs, and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
