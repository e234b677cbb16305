"""Structured-log parser + deterministic template miner (conformance).

Reference: ``LogsParser.py`` — runs the AEL template miner from the public
``logparser`` package over raw ``.log`` files with format
``"<Date> <Time> <Level> <Number>---<LoggingReporter>: <Content>"``
(``:21-37`` S4/ST1), then normalizes rows: service name from the filename,
``Date+Time → timestamp`` rounded to the grid plus the original, both
shifted by a configurable tz offset (``:44-52`` M11).

Engine shape: ``read_text`` → actor-pool parser whose per-actor state is
the compiled line regex + the template dictionary. AEL itself isn't
available here; the miner is a deterministic stand-in with the same
contract: mask variable fragments (numbers, hex ids, uuids) and hash the
resulting template to an ``event_id`` — equal templates ⇒ equal ids, which
is all the downstream cumulative-distinct aggregate (``Joiner.py:246-252``)
needs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from ..functions.bucketing import bucket_us

LINE_RE = re.compile(
    r"^(?P<date>\d{4}-\d{2}-\d{2}) (?P<time>\d{2}:\d{2}:\d{2}(?:\.\d+)?) "
    r"(?P<level>[A-Z]+) (?P<number>\d+)---(?P<reporter>\[[^\]]*\]\s*\S+): "
    r"(?P<content>.*)$"
)

_MASKS = [
    (re.compile(r"\b[0-9a-fA-F]{8}-[0-9a-fA-F-]{27,}\b"), "<UUID>"),
    (re.compile(r"\b0x[0-9a-fA-F]+\b"), "<HEX>"),
    (re.compile(r"\b\d+\b"), "<NUM>"),
]


def _template_id(content: str) -> int:
    masked = content
    for rx, repl in _MASKS:
        masked = rx.sub(repl, masked)
    # FNV-1a over the template string (deterministic across runs/workers)
    h = 0xCBF29CE484222325
    for b in masked.encode("utf-8", "ignore"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


class LogParser:
    """Actor-pool stage: compiled regex + template cache per actor (ST1)."""

    def __init__(self, rounding_us: int = 30_000_000, tz_shift_hours: int = 0):
        self.rounding_us = rounding_us
        self.tz_shift_us = tz_shift_hours * 3_600_000_000
        self.template_cache: dict[str, int] = {}

    def _event_id(self, content: str) -> int:
        eid = self.template_cache.get(content)
        if eid is None:
            eid = _template_id(content)
            self.template_cache[content] = eid
        return eid

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {
            k: []
            for k in (
                "service", "level", "event_id", "reporter", "content",
                "original_timestamp_us",
            )
        }
        for text, path in zip(batch["text"], batch.get("path", [""] * len(batch))):
            # M11: source-servicename from the file name (LogsParser.py:46)
            service = str(path).rsplit("/", 1)[-1].split(".")[0] or "unknown"
            m = LINE_RE.match(text)
            if not m:
                continue
            ts = pd.Timestamp(f"{m['date']} {m['time']}").value // 1000
            rows["service"].append(service)
            rows["level"].append(m["level"])
            rows["event_id"].append(self._event_id(m["content"]))
            rows["reporter"].append(m["reporter"])
            rows["content"].append(m["content"])
            rows["original_timestamp_us"].append(ts + self.tz_shift_us)
        df = pd.DataFrame(rows)
        ts = df["original_timestamp_us"].to_numpy(dtype=np.int64) if len(df) else np.array([], dtype=np.int64)
        df["timestamp_us"] = bucket_us(ts, self.rounding_us)
        df["event_id"] = df["event_id"].astype(np.int64) if len(df) else df["event_id"]
        return df


def read_structured_logs(
    paths: str | list[str],
    rounding_us: int = 30_000_000,
    tz_shift_hours: int = 0,
    concurrency: int = 4,
) -> ray.data.Dataset:
    lines = ray.data.read_text(paths, include_paths=True)
    return lines.map_batches(
        LogParser(rounding_us=rounding_us, tz_shift_hours=tz_shift_hours),
        batch_format="pandas",
        batch_size=4096,
    )
