"""pyarrow.fs resolution — one place that turns a user-facing path/URI into
``(FileSystem, fs-internal path)`` so every file op in the engine works the
same against local disks and object stores (``s3://...``-style URIs).

SURVEY S1's own recommendation: drive discovery and the metadata file ops
through ``pyarrow.fs`` instead of ``os`` so a multi-node cluster can point
the pipeline at a shared object store. Local plain paths resolve to
``LocalFileSystem`` with unchanged behavior.

pyarrow FileSystem objects are picklable, so a resolved filesystem can be
captured by Ray tasks/actors directly.
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs


def is_uri(path: str) -> bool:
    return "://" in path


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """``(filesystem, fs_path)`` for a plain local path or a filesystem URI.

    ``file:///x`` and ``/x`` both resolve to ``LocalFileSystem`` + ``/x``;
    ``s3://bucket/key`` resolves to ``S3FileSystem`` + ``bucket/key``.
    """
    if is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def join_path(base: str, *parts: str) -> str:
    """Join path components, preserving a URI scheme on ``base``."""
    return posixpath.join(base, *parts)


def file_infos(
    path: str, recursive: bool = True
) -> tuple[pafs.FileSystem, list[pafs.FileInfo]]:
    """List a directory (files only when recursive) via the resolved
    filesystem; returns the filesystem and FileInfo entries sorted by path.
    A non-directory path returns its own single FileInfo."""
    fsys, p = resolve_fs(path)
    info = fsys.get_file_info(p)
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(p, recursive=recursive)
        infos = sorted(fsys.get_file_info(sel), key=lambda i: i.path)
    elif info.type == pafs.FileType.NotFound:
        infos = []
    else:
        infos = [info]
    return fsys, infos
