"""Server config file (config.py) — the mkts.yml analogue
(utils/config.go MktsConfig; cmd/start loads it): parse/validate, and
boot `serve --config` end-to-end serving a query with triggers and
bgworkers wired from the file."""

import io
import json
import re
import threading
import time

import pytest

from marketstore_spark.config import load_config, wire_bgworkers, wire_triggers


def _write(tmp_path, text):
    p = tmp_path / "mkts.yml"
    p.write_text(text)
    return str(p)


def test_load_config_full(tmp_path):
    path = _write(
        tmp_path,
        """
root_directory: /data/mktsdb
listen_host: 0.0.0.0
listen_port: 6000
log_level: debug
timezone: UTC
stream_delivery_root: /data/deliveries
stream_key_col: bucket
triggers:
  - module: marketstore_spark.triggers
    on: "*/1Min/TICK"
    config: {destinations: ["5Min"]}
bgworkers:
  - module: my.worker
    name: sweeper
    config: {interval: 60}
""",
    )
    cfg = load_config(path)
    assert cfg.root_directory == "/data/mktsdb"
    assert cfg.listen_host == "0.0.0.0" and cfg.listen_port == 6000
    assert cfg.stream_delivery_root == "/data/deliveries"
    assert cfg.stream_key_col == "bucket"
    assert cfg.triggers[0]["on"] == "*/1Min/TICK"
    assert cfg.bgworkers[0]["name"] == "sweeper"


def test_load_config_defaults(tmp_path):
    cfg = load_config(_write(tmp_path, "root_directory: /x\n"))
    assert cfg.listen_host == "127.0.0.1" and cfg.listen_port == 5993
    assert cfg.stream_delivery_root is None
    assert cfg.triggers == [] and cfg.bgworkers == []


def test_load_config_rejects_reference_internals_keys(tmp_path):
    # a copied-over reference mkts.yml must fail FAST, not half-work
    path = _write(
        tmp_path, "root_directory: /x\nwal_rotate_interval: 5\n"
    )
    with pytest.raises(ValueError, match="wal_rotate_interval"):
        load_config(path)


def test_load_config_requires_root(tmp_path):
    with pytest.raises(ValueError, match="root_directory"):
        load_config(_write(tmp_path, "listen_port: 5993\n"))


def test_load_config_validates_plugin_entries(tmp_path):
    path = _write(
        tmp_path,
        "root_directory: /x\ntriggers:\n  - module: m\n",  # missing `on`
    )
    with pytest.raises(ValueError, match="triggers\\[0\\]"):
        load_config(path)


def test_wire_triggers_loads_builtin_factory(tmp_path, spark):
    from marketstore_spark.catalog import Catalog
    from marketstore_spark.triggers import OnDiskAggTrigger

    cfg = load_config(
        _write(
            tmp_path,
            """
root_directory: /x
triggers:
  - module: marketstore_spark.triggers
    on: "*/1Min/TICK"
    config: {destinations: ["5Min", "1D"]}
""",
        )
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    wire_triggers(cfg, cat)
    assert cat.triggers is not None
    trig = cat.triggers.matchers[0].trigger
    assert isinstance(trig, OnDiskAggTrigger)
    assert trig.destinations == ["5Min", "1D"]


def test_wire_triggers_bad_module_raises_at_load(tmp_path, spark):
    from marketstore_spark.catalog import Catalog

    cfg = load_config(
        _write(
            tmp_path,
            "root_directory: /x\ntriggers:\n"
            "  - module: marketstore_spark.config\n    on: '*/*/*'\n",
        )
    )
    cat = Catalog(spark, str(tmp_path / "cat2"))
    with pytest.raises(AttributeError, match="new_trigger"):
        wire_triggers(cfg, cat)  # config.py has no new_trigger factory


def test_wire_bgworkers_starts_and_stops(tmp_path, monkeypatch):
    import sys

    plug = tmp_path / "cfg_plug.py"
    plug.write_text(
        "import threading\n"
        "class W:\n"
        "    def __init__(self, c): self.stopped = threading.Event()\n"
        "    def run(self): self.stopped.wait()\n"
        "    def stop(self): self.stopped.set()\n"
        "def new_bg_worker(config):\n"
        "    return W(config)\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("cfg_plug", None)
    cfg = load_config(
        _write(
            tmp_path,
            "root_directory: /x\nbgworkers:\n"
            "  - module: cfg_plug\n    name: w\n    config: {}\n",
        )
    )
    host = wire_bgworkers(cfg)
    assert host is not None and len(host.handles) == 1
    assert host.handles[0].alive
    host.stop()
    assert not host.handles[0].alive


def test_serve_from_config_file_end_to_end(tmp_path, spark, sf_dir):
    """cmd/start parity: boot the server purely from a config file
    (port 0 → ephemeral) and serve a live Query over the wire; the
    configured ondiskagg trigger must also be attached."""
    from pyspark.sql import functions as F

    from marketstore_spark.catalog import Catalog, load_table
    from marketstore_spark.cli import main
    from marketstore_spark.client import HttpClient

    root = str(tmp_path / "store")
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    cat.write("CFG1/1Min/TICK", ev.filter(F.col("user_id") == 1))
    cfg_path = _write(
        tmp_path,
        f"""
root_directory: {root}
listen_host: 127.0.0.1
listen_port: 0
triggers:
  - module: marketstore_spark.triggers
    on: "*/1Sec/TICK"
    config: {{destinations: ["1Min"]}}
""",
    )
    out = io.StringIO()
    t = threading.Thread(
        target=main,
        args=(["serve", "--config", cfg_path, "--max-seconds", "30"],),
        kwargs={"spark": spark, "out": out},
        daemon=True,
    )
    t.start()
    deadline = time.monotonic() + 60
    port = None
    while port is None and time.monotonic() < deadline:
        m = re.search(r'"listening": \["[^"]+", (\d+)\]', out.getvalue())
        if m:
            port = int(m.group(1))
        else:
            time.sleep(0.1)
    assert port, f"server never reported listening: {out.getvalue()!r}"
    cli = HttpClient(f"http://127.0.0.1:{port}", codec="msgpack")
    assert cli.list_symbols() == ["CFG1"]
    series = cli.query("CFG1/1Min/TICK", limit_record_count=3)["CFG1/1Min/TICK"]
    assert len(series["ts"]) == 3


def test_serve_flag_overrides_config(tmp_path, spark):
    """CLI flags beat config values (cmd/start precedence)."""
    from marketstore_spark.catalog import Catalog
    from marketstore_spark.cli import main

    root = str(tmp_path / "store2")
    Catalog(spark, root)  # empty store is fine
    cfg_path = _write(
        tmp_path, f"root_directory: {root}\nlisten_port: 1\n"  # bad port
    )
    out = io.StringIO()
    rc = main(
        ["serve", "--config", cfg_path, "--port", "0", "--max-seconds", "0.5"],
        spark=spark,
        out=out,
    )
    assert rc == 0
    listening = json.loads(out.getvalue().splitlines()[0])["listening"]
    assert listening[1] != 1  # --port 0 (ephemeral) overrode the config
