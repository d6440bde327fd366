"""Server config file — the ``mkts.yml`` analogue.

The reference's ``start`` command loads a YAML config
(utils/config.go:109 MktsConfig; cmd/start) naming the store root, the
listen address, and the trigger / bgworker plugin lists.  This module
loads the same shape for ``marketstore-spark serve --config``:

.. code-block:: yaml

    root_directory: /data/mktsdb
    listen_host: 127.0.0.1
    listen_port: 5993
    stream_delivery_root: /data/deliveries   # this engine's stream hub
    stream_key_col: tbk
    triggers:
      - module: marketstore_spark.triggers
        on: "*/1Min/TICK"
        config: {destinations: ["5Min", "1D"]}
    bgworkers:
      - module: my_plugin.worker
        name: sweeper
        config: {interval: 60}

Field-name parity with utils/config.go where the concept carries over
(``root_directory``, ``listen_host``, ``listen_port``, ``triggers[].
module/on/config``, ``bgworkers[].module/name/config``); fields tied
to the reference's storage internals (WAL rotation, variable
compression) have no analogue here — Spark commit protocols replace
them — and are rejected loudly rather than silently ignored, so a
copied-over reference config fails fast with a clear message instead
of half-working.

Plugin conventions: a trigger module exposes ``new_trigger(config,
catalog)`` returning an object with ``fire(key, written_df)``; a
bgworker module exposes ``new_bg_worker(config)`` (bgworker.WorkerSpec
— same factory convention as the reference's plugin loader).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field

_KNOWN_KEYS = {
    "root_directory",
    "listen_host",
    "listen_port",
    "grpc_listen_port",
    "log_level",
    "timezone",
    "stream_delivery_root",
    "stream_key_col",
    "triggers",
    "bgworkers",
}


@dataclass
class ServerConfig:
    """Parsed ``mkts.yml`` analogue (utils/config.go MktsConfig)."""

    root_directory: str
    listen_host: str = "127.0.0.1"
    listen_port: int = 5993
    #: reference mkts.yml grpc_listen_port (utils/config.go:112);
    #: None keeps the gRPC listener off
    grpc_listen_port: int | None = None
    log_level: str = "info"
    timezone: str = "UTC"
    stream_delivery_root: str | None = None
    stream_key_col: str = "tbk"
    triggers: list[dict] = field(default_factory=list)
    bgworkers: list[dict] = field(default_factory=list)


def load_config(path: str) -> ServerConfig:
    """Load + validate a server config file.  Raises ``ValueError`` on
    unknown keys (loud — a reference-internals key like
    ``wal_rotate_interval`` means the operator expects behavior this
    engine expresses differently) and on a missing/empty
    ``root_directory`` (utils/config.go errors the same way)."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    if not isinstance(raw, dict):
        raise ValueError(f"config {path!r}: top level must be a mapping")
    unknown = sorted(set(raw) - _KNOWN_KEYS)
    if unknown:
        raise ValueError(
            f"config {path!r}: unknown key(s) {unknown} — supported: "
            f"{sorted(_KNOWN_KEYS)}"
        )
    root = raw.get("root_directory")
    if not root:
        raise ValueError(f"config {path!r}: root_directory is required")
    for section, req in (("triggers", {"module", "on"}), ("bgworkers", {"module"})):
        for i, entry in enumerate(raw.get(section) or []):
            # YAML 1.1 (pyyaml) resolves a bare `on:` KEY to boolean
            # True — the reference's own mkts.yml spells the trigger
            # glob key exactly that way, so normalize it back
            if isinstance(entry, dict) and True in entry:
                entry["on"] = entry.pop(True)
            if not isinstance(entry, dict) or not req <= set(entry):
                raise ValueError(
                    f"config {path!r}: {section}[{i}] must be a mapping "
                    f"with keys {sorted(req)}"
                )
    return ServerConfig(
        root_directory=str(root),
        listen_host=str(raw.get("listen_host", "127.0.0.1")),
        listen_port=int(raw.get("listen_port", 5993)),
        grpc_listen_port=(
            int(raw["grpc_listen_port"]) if raw.get("grpc_listen_port") else None
        ),
        log_level=str(raw.get("log_level", "info")),
        timezone=str(raw.get("timezone", "UTC")),
        stream_delivery_root=(
            str(raw["stream_delivery_root"])
            if raw.get("stream_delivery_root")
            else None
        ),
        stream_key_col=str(raw.get("stream_key_col", "tbk")),
        triggers=list(raw.get("triggers") or []),
        bgworkers=list(raw.get("bgworkers") or []),
    )


def wire_triggers(cfg: ServerConfig, catalog) -> None:
    """Build the TriggerRegistry from ``triggers:`` entries and attach
    it to the catalog (plugins/trigger startup).  Import/config errors
    raise at LOAD time — before the server binds."""
    if not cfg.triggers:
        return
    from marketstore_spark.triggers import TriggerRegistry

    reg = TriggerRegistry()
    for entry in cfg.triggers:
        mod = importlib.import_module(entry["module"])
        factory = getattr(mod, "new_trigger", None)
        if factory is None:
            raise AttributeError(
                f"trigger module {entry['module']!r} has no new_trigger factory"
            )
        trig = factory(dict(entry.get("config") or {}), catalog)
        if not callable(getattr(trig, "fire", None)):
            raise TypeError(
                f"{entry['module']}.new_trigger returned "
                f"{type(trig).__name__}, which has no fire()"
            )
        reg.register(entry["on"], trig)
    catalog.triggers = reg


def wire_bgworkers(cfg: ServerConfig):
    """Load + start the ``bgworkers:`` entries; returns the running
    BgWorkerHost (or None when the section is empty) so the caller can
    ``stop()`` it on shutdown."""
    if not cfg.bgworkers:
        return None
    from marketstore_spark.bgworker import BgWorkerHost

    host = BgWorkerHost()
    host.load(
        [
            {
                "module": e["module"],
                "name": e.get("name", e["module"]),
                "config": dict(e.get("config") or {}),
            }
            for e in cfg.bgworkers
        ]
    )
    host.start()
    return host
