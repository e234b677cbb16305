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
audit trail (metrics lineage). Writes are atomic: tmp dir + rename.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def fingerprint_input(path: str) -> str:
    """Stable fingerprint of the input: file names + sizes (+ mtime)."""
    entries = []
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(f"{os.path.relpath(p, path)}:{st.st_size}:{int(st.st_mtime)}")
    else:
        st = os.stat(path)
        entries.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()[:32]


def fingerprint_config(cfg_dict: dict) -> str:
    return hashlib.sha256(
        json.dumps(cfg_dict, sort_keys=True, default=str).encode()
    ).hexdigest()[:32]


def manifest_path(tier_dir: str) -> str:
    return os.path.join(tier_dir, "manifest.json")


def write_manifest(tier_dir: str, manifest: dict) -> None:
    os.makedirs(tier_dir, exist_ok=True)
    tmp = manifest_path(tier_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path(tier_dir))


def read_manifest(tier_dir: str) -> dict | None:
    try:
        with open(manifest_path(tier_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
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
    if os.path.isdir(path):
        shutil.rmtree(path)


def input_file_fingerprints(path: str) -> dict[str, str]:
    """Per-file fingerprints (size:mtime) keyed by absolute path — the
    basis for incremental append: a prior build whose recorded files are
    all unchanged and a superset-free subset of the current listing can be
    extended by processing only the new files."""
    out: dict[str, str] = {}
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.abspath(p)] = f"{st.st_size}:{int(st.st_mtime)}"
    else:
        st = os.stat(path)
        out[os.path.abspath(path)] = f"{st.st_size}:{int(st.st_mtime)}"
    return out
