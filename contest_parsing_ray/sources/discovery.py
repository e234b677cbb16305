"""S1 corpus discovery — the reference's ``FilepathFinder`` analog.

Reference: ``FilepathFinder.py:11-64`` — scan the input folder for one
directory per service, each holding ``monitor*/ *.json`` (Prometheus
exports), ``ts*|trace*/ *.json`` (Jaeger exports) and ``logs*/ *.log``
(plus top-level ``logs*.txt``); keep only files > 100 bytes; DROP services
missing either a monitoring or a traces stream; ``test_mode`` truncates to
the first two services.

This is driver-side metadata work (file listing, not data): at 100 TB the
listing itself is thousands of paths, not bytes — a plain os.scandir is the
right tool, and the RESULT feeds ``read_binary_files``/``read_text`` so the
data itself never touches the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class ServiceStreams:
    monitoring: list[str] = field(default_factory=list)
    traces: list[str] = field(default_factory=list)
    logs: list[str] = field(default_factory=list)


def find_files(
    source_dir: str,
    min_bytes: int = 100,
    test_mode: bool = False,
    max_test_services: int = 2,
) -> dict[str, ServiceStreams]:
    """service name → its stream file lists (reference semantics, above).

    Services missing monitoring OR traces are dropped (``FilepathFinder.py:
    53-59``); ``test_mode`` keeps the first ``max_test_services`` in
    directory order (``:61-63``)."""

    def _sized(paths: list[str]) -> list[str]:
        return sorted(
            p for p in paths
            if os.path.isfile(p) and os.path.getsize(p) > min_bytes
        )

    out: dict[str, ServiceStreams] = {}
    for service in sorted(os.listdir(source_dir)):
        sdir = os.path.join(source_dir, service)
        if not os.path.isdir(sdir):
            continue
        streams = ServiceStreams()
        for entry in sorted(os.listdir(sdir)):
            path = os.path.join(sdir, entry)
            low = entry.lower()
            if os.path.isfile(path):
                # logs may live in one top-level logs*.txt (reference :24-29)
                if low.startswith("logs") and low.endswith(".txt"):
                    streams.logs.append(path)
                continue
            files_in = [os.path.join(path, f) for f in os.listdir(path)]
            if low.startswith("logs"):
                streams.logs.extend(
                    _sized([p for p in files_in if p.endswith(".log")])
                )
            json_files = _sized([p for p in files_in if p.endswith(".json")])
            if low.startswith("monitor"):
                streams.monitoring.extend(json_files)
            if low.startswith("ts") or low.startswith("trace"):
                streams.traces.extend(json_files)
        if streams.monitoring and streams.traces:
            out[service] = streams
    if test_mode:
        out = dict(list(out.items())[:max_test_services])
    return out


def corpus_stats(path_list: dict[str, ServiceStreams]) -> dict[str, dict[str, float]]:
    """Per-service stream sizes in MB (reference ``__print_statistics``,
    ``JoinManager.py:197-214``)."""
    stats = {}
    for name, s in path_list.items():
        stats[name] = {
            "monitoring_mb": sum(os.path.getsize(p) for p in s.monitoring) / 1e6,
            "traces_mb": sum(os.path.getsize(p) for p in s.traces) / 1e6,
            "logs_mb": sum(os.path.getsize(p) for p in s.logs) / 1e6,
        }
    return stats
