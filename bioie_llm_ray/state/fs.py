"""Shared-filesystem plumbing for the persisted store layouts.

On a real cluster the bucketed / sorted / Z-order / IVF / LSH layouts live
on shared storage (S3, HDFS, NFS), not the driver's local disk.  Every
store accepts either a plain local path, a URI (``file://``, ``s3://``,
``memory://``, …), or an explicit fsspec filesystem via ``filesystem=`` —
metadata and directory listings go through the fsspec API, bulk Parquet
I/O through Ray Data's ``filesystem=`` pyarrow handoff.

Local paths keep the native fast path (``ray_fs`` returns ``None`` so Ray
uses its own local-FS reader).  Note ``memory://`` is driver-process-local
by construction (fsspec's MemoryFileSystem stores bytes in a class dict),
so it round-trips metadata and listings but cannot carry Parquet blocks
across Ray worker processes — use ``file://`` or a real shared FS for
end-to-end runs; tests cover both.
"""

from __future__ import annotations

import posixpath

join = posixpath.join


def resolve(path: str, filesystem=None):
    """(fsspec filesystem, scheme-free path) for a path / URI / explicit FS."""
    if filesystem is not None:
        return filesystem, path
    import fsspec

    return fsspec.core.url_to_fs(path)


def ray_fs(fs):
    """``filesystem=`` argument for ``ray.data`` read/write: ``None`` for a
    local FS (native path fast path), a pyarrow wrapper otherwise."""
    from fsspec.implementations.local import LocalFileSystem

    if fs is None or isinstance(fs, LocalFileSystem):
        return None
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    return PyFileSystem(FSSpecHandler(fs))


def listdir(fs, d) -> list:
    """Sorted base names inside ``d`` (fsspec ``ls`` returns full paths).

    Invalidates the filesystem's directory cache first: store builds list
    a directory BEFORE a Ray-worker write (stale-file sweep) and again
    AFTER it (zone-map/partition discovery); cached backends (s3fs, gcsfs)
    would otherwise replay the pre-write listing.  Listings are
    metadata-scale, so the lost caching is noise."""
    inv = getattr(fs, "invalidate_cache", None)
    if inv is not None:
        inv(d)
    return sorted(
        posixpath.basename(p.rstrip("/")) for p in fs.ls(d, detail=False)
    )


def isdir(fs, d) -> bool:
    """Directory-existence probe with the same dircache invalidation as
    ``listdir``: store searches probe partitions AFTER Ray-worker writes,
    and a cached backend would answer from the pre-write listing —
    silently skipping a real partition."""
    inv = getattr(fs, "invalidate_cache", None)
    if inv is not None:
        inv(d)
    return fs.isdir(d)
