"""Operational telemetry — counters/gauges/histograms + disk usage.

Reference: ``metrics/metrics.go`` (Prometheus registry: request
durations, write durations, WAL replay gauges) and ``metrics/du.go``
(periodic disk-usage monitor over the store root).  The reference
serves these over a Prometheus HTTP endpoint; here the registry is an
in-process object whose ``render_prometheus()`` emits the standard
text exposition format, so a deployment scrapes it from any HTTP
handler (or ships the snapshot dict to its own sink).  No third-party
client library — the exposition format is a public, trivially stable
text protocol.

Scale note: metrics are DRIVER-side observations of catalog/query
operations (counts, durations, bytes).  Nothing here ever collects
executor data; distributed work is observed by Spark's own metrics
system, which a real cluster scrapes separately.
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

NAMESPACE = "marketstore_spark"

#: Histogram bucket upper bounds (seconds) — the reference's
#: WriteCSMDuration buckets (metrics/metrics.go) plus a top end for
#: distributed jobs, which run longer than a single-node write.
DEFAULT_BUCKETS = (0.001, 0.005, 0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 5.0, 30.0)


class MetricsRegistry:
    """Threadsafe counters, gauges, and fixed-bucket histograms keyed
    by (name, label tuple)."""

    def __init__(self, buckets: tuple[float, ...] = DEFAULT_BUCKETS):
        self._lock = threading.Lock()
        self._buckets = tuple(sorted(buckets))
        self._counters: dict[tuple, float] = defaultdict(float)
        self._gauges: dict[tuple, float] = {}
        # histogram: key -> [bucket counts..., +Inf count, sum]
        self._hists: dict[tuple, list[float]] = {}

    @staticmethod
    def _key(name: str, labels: dict | None) -> tuple:
        return (name, tuple(sorted((labels or {}).items())))

    def inc(self, name: str, amount: float = 1.0, **labels) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += amount

    def set_gauge(self, name: str, value: float, **labels) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def observe(self, name: str, value: float, **labels) -> None:
        key = self._key(name, labels)
        with self._lock:
            h = self._hists.setdefault(key, [0.0] * (len(self._buckets) + 2))
            for i, ub in enumerate(self._buckets):
                if value <= ub:
                    h[i] += 1
            h[-2] += 1  # +Inf
            h[-1] += value  # sum

    @contextmanager
    def time(self, name: str, **labels):
        """Context manager observing the elapsed seconds into the
        ``<name>`` histogram (RPCSuccessfulRequestDuration analogue)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0, **labels)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": {self._fmt(k): v for k, v in self._counters.items()},
                "gauges": {self._fmt(k): v for k, v in self._gauges.items()},
                "histograms": {
                    self._fmt(k): {
                        "count": h[-2],
                        "sum": h[-1],
                        "buckets": dict(zip(map(str, self._buckets), h[:-2])),
                    }
                    for k, h in self._hists.items()
                },
            }

    @staticmethod
    def _fmt(key: tuple) -> str:
        name, labels = key
        if not labels:
            return name
        inner = ",".join(f'{k}="{v}"' for k, v in labels)
        return f"{name}{{{inner}}}"

    def render_prometheus(self) -> str:
        """Text exposition format (the public Prometheus line
        protocol), names prefixed ``marketstore_spark_``."""
        lines: list[str] = []
        snap = self.snapshot()
        for metric, value in snap["counters"].items():
            lines.append(f"# TYPE {NAMESPACE}_{metric.split('{')[0]} counter")
            lines.append(f"{NAMESPACE}_{metric} {value}")
        for metric, value in snap["gauges"].items():
            lines.append(f"# TYPE {NAMESPACE}_{metric.split('{')[0]} gauge")
            lines.append(f"{NAMESPACE}_{metric} {value}")
        for metric, h in snap["histograms"].items():
            base, _, labelpart = metric.partition("{")
            labels = labelpart[:-1] if labelpart else ""
            lines.append(f"# TYPE {NAMESPACE}_{base} histogram")
            cum = 0.0
            for ub, n in h["buckets"].items():
                cum = n  # bucket counts are already cumulative
                le = f'le="{ub}"' + (f",{labels}" if labels else "")
                lines.append(f"{NAMESPACE}_{base}_bucket{{{le}}} {cum}")
            le = 'le="+Inf"' + (f",{labels}" if labels else "")
            lines.append(f"{NAMESPACE}_{base}_bucket{{{le}}} {h['count']}")
            suffix = f"{{{labels}}}" if labels else ""
            lines.append(f"{NAMESPACE}_{base}_sum{suffix} {h['sum']}")
            lines.append(f"{NAMESPACE}_{base}_count{suffix} {h['count']}")
        return "\n".join(lines) + "\n"


#: Default in-process registry (promauto's package-level pattern).
DEFAULT = MetricsRegistry()


def disk_usage(root: str) -> int:
    """Total bytes under ``root`` (metrics/du.go's diskUsage).  Uses
    ``st_blocks`` where available so sparse allocations report actual
    consumption — the same distinction du.go makes for its
    fp.truncate'd files; parquet is dense, but crash-leftover staging
    may not be."""
    total = 0
    for r, _, fs in os.walk(root):
        for f in fs:
            try:
                st = os.stat(os.path.join(r, f))
            except OSError:
                continue
            blocks = getattr(st, "st_blocks", None)
            total += blocks * 512 if blocks is not None else st.st_size
    return total


def du_report(catalog) -> list[dict]:
    """Per-bucket usage report: total bytes on disk, live bytes (the
    current committed snapshot), file counts, and version count —
    live vs. total is the vacuum-reclaimable gap, which du.go can't
    see (it predates the manifest protocol's superseded-file window).
    """
    from marketstore_spark import txn
    from marketstore_spark.catalog import TimeBucketKey

    out = []
    for key in catalog.list_buckets():
        path = TimeBucketKey(key).path(catalog.root)
        live = txn.data_files(path)
        live_bytes = 0
        for f in live:
            try:
                live_bytes += os.path.getsize(f)
            except OSError:
                pass
        cur = txn.current_version(path)
        out.append(
            {
                "key": key,
                "total_bytes": disk_usage(path),
                "live_bytes": live_bytes,
                "live_files": len(live),
                "versions": 0 if cur is None else cur + 1,
            }
        )
    return out


def start_disk_usage_monitor(
    registry: MetricsRegistry,
    root: str,
    interval_s: float = 60.0,
    stop_event: threading.Event | None = None,
) -> threading.Thread:
    """Background gauge refresh (StartDiskUsageMonitor analogue).
    Returns the daemon thread; set ``stop_event`` to stop it."""
    stop = stop_event or threading.Event()

    def run():
        while True:
            registry.set_gauge("disk_usage_bytes", float(disk_usage(root)))
            if stop.wait(interval_s):
                return

    t = threading.Thread(target=run, daemon=True, name="msprk-du-monitor")
    t._stop_event = stop  # noqa: SLF001 — test/caller handle
    t.start()
    return t
