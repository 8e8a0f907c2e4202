"""Logging parameters: the reference's ``log-file`` / ``log-level`` /
``syslog`` config surface (``src/conf.rs:78-82``, ``src/log.rs:29-99``)
re-expressed on stdlib logging.

The reference duplicates every record to console + append-mode log
file (mode 0o640), optionally to syslog; the CONSOLE level is
``log-level + verbose`` (the CLI ``-v`` count) capped at trace, while
file/syslog stay at ``log-level``. Levels are slog's integers
(1=critical … 6=trace); 5 and 6 both map to Python DEBUG.

Console records go to stderr — stdout stays reserved for each CLI's
one-line JSON contract.
"""

from __future__ import annotations

import logging
import os

# slog::Level::as_usize() (log.rs:63-65) → python levels
_SLOG_TO_PY = {
    1: logging.CRITICAL,
    2: logging.ERROR,
    3: logging.WARNING,
    4: logging.INFO,
    5: logging.DEBUG,
    6: logging.DEBUG,  # trace: python has no finer stock level
}

ENGINE_LOGGER = "beamium_ray"


class LogGuard:
    """Handle returned by :func:`initialize_logging`; ``close()``
    detaches the installed handlers (the reference's logger guard)."""

    def __init__(self, logger: logging.Logger, handlers: list):
        self.logger = logger
        self.handlers = handlers

    def close(self) -> None:
        for h in self.handlers:
            self.logger.removeHandler(h)
            try:
                h.close()
            except Exception:
                pass
        self.handlers = []


def _level(slog_level: int) -> int:
    return _SLOG_TO_PY[max(1, min(6, int(slog_level)))]


def initialize_logging(
    parameters: dict | None = None, verbose: int = 0
) -> LogGuard:
    """Install console + file (+ optional syslog) handlers on the
    engine logger per the config ``parameters`` map. Defaults match
    the reference (``conf.rs:120-127``): log-file ``beamium.log``,
    log-level 4 (info), syslog off."""
    p = dict(parameters or {})

    def get(k: str, d):
        return p.get(k, p.get(k.replace("-", "_"), d))

    log_file = str(get("log-file", "beamium.log"))
    log_level = int(get("log-level", 4))
    use_syslog = bool(get("syslog", False))

    logger = logging.getLogger(ENGINE_LOGGER)
    logger.setLevel(logging.DEBUG)  # handlers gate per-sink
    handlers: list[logging.Handler] = []
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s %(message)s"
    )

    console = logging.StreamHandler()  # stderr
    console.setLevel(_level(log_level + verbose))
    console.setFormatter(fmt)
    logger.addHandler(console)
    handlers.append(console)

    parent = os.path.dirname(log_file)
    if parent:
        os.makedirs(parent, exist_ok=True)  # log.rs:34-42
    fh = logging.FileHandler(log_file, mode="a")
    try:
        os.chmod(log_file, 0o640)  # log.rs:53 mode(0o640)
    except OSError:
        pass
    fh.setLevel(_level(log_level))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    handlers.append(fh)

    if use_syslog:
        from logging.handlers import SysLogHandler

        address = str(get("syslog-address", "/dev/log"))
        try:
            if not os.path.exists(address):
                # SysLogHandler constructs lazily — probe the socket
                # NOW so a bad config fails at startup, the same place
                # the reference's unix_3164 errors
                raise OSError(f"{address} does not exist")
            sh = SysLogHandler(
                address=address, facility=SysLogHandler.LOG_DAEMON
            )
        except OSError as ex:
            for h in handlers:
                logger.removeHandler(h)
            raise ValueError(
                f"syslog requested but {address} is unavailable: {ex}"
            ) from ex
        sh.setLevel(_level(log_level))
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        handlers.append(sh)

    return LogGuard(logger, handlers)
