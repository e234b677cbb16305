"""Per-partition lineage manifests for checkpoint/resume.

The reference's only "resume" story is that every stage writes intermediates
per service and ``__clear_output`` rm -rf's them on rerun
(``JoinManager.py:189-195``) — a full recompute. The engine instead records,
per output partition (tier x source), what was computed from which input:

    manifest.json = {
      "input_fingerprint": <hash of input file paths+sizes+mtimes>,
      "config_fingerprint": <hash of the knobs that affect the output>,
      "partitions": {"<source>": {"rows": n, "checksum": h}},
      "completed": true,
    }

On resume, a tier whose manifest matches the current input+config
fingerprint is skipped wholesale; per-partition rows/checksums give the
audit trail (metrics lineage). Writes are atomic: tmp file + move (a true
rename on local/posix filesystems; object stores get copy+delete, which is
still safe here because readers treat a missing/partial manifest as
"rebuild").

All file ops go through ``pyarrow.fs`` (``..fsutil``), so ``out_dir`` and
the input root may be plain local paths or ``s3://``-style URIs.
"""

from __future__ import annotations

import hashlib
import json
import posixpath

from pyarrow import fs as pafs

from ..fsutil import file_infos, join_path, resolve_fs


def _mtime_s(info: pafs.FileInfo) -> int:
    mt = info.mtime_ns
    return int(mt // 1_000_000_000) if mt is not None else 0


def fingerprint_input(path: str) -> str:
    """Stable fingerprint of the input: file names + sizes (+ mtime)."""
    _, root = resolve_fs(path)
    _, infos = file_infos(path, recursive=True)
    entries = [
        f"{posixpath.relpath(i.path, root)}:{i.size}:{_mtime_s(i)}"
        for i in infos
        if i.is_file
    ]
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()[:32]


def fingerprint_config(cfg_dict: dict) -> str:
    return hashlib.sha256(
        json.dumps(cfg_dict, sort_keys=True, default=str).encode()
    ).hexdigest()[:32]


def manifest_path(tier_dir: str) -> str:
    return join_path(tier_dir, "manifest.json")


def write_manifest(tier_dir: str, manifest: dict) -> None:
    fsys, d = resolve_fs(tier_dir)
    fsys.create_dir(d, recursive=True)
    tmp = join_path(d, "manifest.json.tmp")
    with fsys.open_output_stream(tmp) as f:
        f.write(json.dumps(manifest, indent=1, sort_keys=True).encode())
    fsys.move(tmp, join_path(d, "manifest.json"))


def read_manifest(tier_dir: str) -> dict | None:
    fsys, d = resolve_fs(tier_dir)
    try:
        with fsys.open_input_stream(posixpath.join(d, "manifest.json")) as f:
            return json.loads(f.read().decode())
    except (FileNotFoundError, OSError, json.JSONDecodeError):
        return None


def tier_is_complete(tier_dir: str, input_fp: str, config_fp: str) -> bool:
    m = read_manifest(tier_dir)
    return bool(
        m
        and m.get("completed")
        and m.get("input_fingerprint") == input_fp
        and m.get("config_fingerprint") == config_fp
    )


def clear_dir(path: str) -> None:
    """Reference __clear_output analog (JoinManager.py:189-195), scoped to
    one tier directory, used when a stale/partial output must be replaced."""
    fsys, p = resolve_fs(path)
    if fsys.get_file_info(p).type == pafs.FileType.Directory:
        fsys.delete_dir(p)


def input_file_fingerprints(path: str) -> dict[str, str]:
    """Per-file fingerprints (size:mtime) keyed by fs path — the basis for
    incremental append: a prior build whose recorded files are all unchanged
    and a superset-free subset of the current listing can be extended by
    processing only the new files."""
    _, infos = file_infos(path, recursive=True)
    return {i.path: f"{i.size}:{_mtime_s(i)}" for i in infos if i.is_file}
