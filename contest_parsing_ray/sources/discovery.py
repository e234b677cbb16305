"""S1 corpus discovery — the reference's ``FilepathFinder`` analog.

Reference: ``FilepathFinder.py:11-64`` — scan the input folder for one
directory per service, each holding ``monitor*/ *.json`` (Prometheus
exports), ``ts*|trace*/ *.json`` (Jaeger exports) and ``logs*/ *.log``
(plus top-level ``logs*.txt``); keep only files > 100 bytes; DROP services
missing either a monitoring or a traces stream; ``test_mode`` truncates to
the first two services.

This is driver-side metadata work (file listing, not data): at 100 TB the
listing itself is thousands of paths, not bytes. Listing goes through
``pyarrow.fs`` (SURVEY S1's own recommendation), so ``source_dir`` may be a
plain local path or an ``s3://``-style URI — sizes come back with the
listing (one round trip on object stores, no per-file stat). The RESULT
feeds ``read_binary_files``/``read_text`` so the data itself never touches
the driver; when the input was a URI, returned paths keep the scheme so
the Ray readers resolve the same filesystem.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field

from pyarrow import fs as pafs

from ..fsutil import is_uri, resolve_fs


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
    fsys, root = resolve_fs(source_dir)
    prefix = source_dir.split("://", 1)[0] + "://" if is_uri(source_dir) else ""

    def _out(fs_path: str) -> str:
        return prefix + fs_path

    def _ls(path: str) -> list[pafs.FileInfo]:
        return sorted(
            fsys.get_file_info(pafs.FileSelector(path)), key=lambda i: i.path
        )

    def _sized(infos: list[pafs.FileInfo], suffix: str) -> list[str]:
        return sorted(
            _out(i.path)
            for i in infos
            if i.is_file and i.path.endswith(suffix) and (i.size or 0) > min_bytes
        )

    out: dict[str, ServiceStreams] = {}
    for svc_info in _ls(root):
        if svc_info.type != pafs.FileType.Directory:
            continue
        service = posixpath.basename(svc_info.path)
        streams = ServiceStreams()
        for entry in _ls(svc_info.path):
            low = posixpath.basename(entry.path).lower()
            if entry.is_file:
                # logs may live in one top-level logs*.txt (reference :24-29)
                if low.startswith("logs") and low.endswith(".txt"):
                    streams.logs.append(_out(entry.path))
                continue
            if entry.type != pafs.FileType.Directory:
                continue
            files_in = _ls(entry.path)
            if low.startswith("logs"):
                streams.logs.extend(_sized(files_in, ".log"))
            if low.startswith("monitor"):
                streams.monitoring.extend(_sized(files_in, ".json"))
            if low.startswith("ts") or low.startswith("trace"):
                streams.traces.extend(_sized(files_in, ".json"))
        if streams.monitoring and streams.traces:
            out[service] = streams
    if test_mode:
        out = dict(list(out.items())[:max_test_services])
    return out


def corpus_stats(path_list: dict[str, ServiceStreams]) -> dict[str, dict[str, float]]:
    """Per-service stream sizes in MB (reference ``__print_statistics``,
    ``JoinManager.py:197-214``)."""

    def _mb(paths: list[str]) -> float:
        total = 0
        for p in paths:
            fsys, fp = resolve_fs(p)
            total += fsys.get_file_info(fp).size or 0
        return total / 1e6

    return {
        name: {
            "monitoring_mb": _mb(s.monitoring),
            "traces_mb": _mb(s.traces),
            "logs_mb": _mb(s.logs),
        }
        for name, s in path_list.items()
    }
