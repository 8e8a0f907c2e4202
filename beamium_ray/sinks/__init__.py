from beamium_ray.sinks.http_forward import (  # noqa: F401
    BackoffPolicy,
    HttpSinkConf,
    forward_dataset,
    forward_parquet_sink,
    forward_spool,
    plan_post_batches,
)
