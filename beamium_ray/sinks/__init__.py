from beamium_ray.sinks.http_forward import (  # noqa: F401
    BackoffPolicy,
    HttpSession,
    HttpSinkConf,
    forward_dataset,
    forward_parquet_sink,
    forward_spool,
    http_conf_from_config,
    plan_post_batches,
)
