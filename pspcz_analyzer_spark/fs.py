"""Filesystem shim for the manifest-committed lake ops.

The manifest protocol (``manifest.py``) needs a small, explicit set of
primitives — list a directory, read/delete/rename a file, publish a blob
create-exclusively, read a Parquet footer — and NOTHING else. Routing
them through this shim removes the remaining POSIX assumption from the
100 TB story: :class:`LocalFS` is the os-module implementation the tests
and the local driver run on; :class:`ArrowFS` adapts any
``pyarrow.fs.FileSystem`` (S3, HDFS, GCS — all resolvable from a URI via
the public ``FileSystem.from_uri``), so the same manifest code plans
against object stores.

What each primitive needs from the store, and who provides it:

===================  =========================================================
primitive            requirement
===================  =========================================================
listdir/size/exists  plain metadata reads — every store
remove/rename        only ever applied to files INVISIBLE to readers (staged
                     data files pre-commit, vacuum garbage), so S3's
                     copy+delete "rename" and its non-atomicity are FINE —
                     the protocol never depends on them for correctness
create_exclusive     the ONE correctness-critical primitive: the manifest
                     version publish. POSIX link(2)/O_EXCL (LocalFS), HDFS
                     create(overwrite=false), S3 conditional PUT
                     (If-None-Match: *). ArrowFS emulates with
                     check-then-write-then-VERIFY (re-read + byte compare,
                     raising on mismatch — fail-closed, a lost race is
                     reported, never silent); pyarrow exposes no
                     conditional write, so a production S3 deployment must
                     swap in a conditional-PUT client for THIS one call
                     (everything else carries over).
mtime                last-modified epoch seconds — vacuum's retention
                     input; None disables collection of that file (safe)
parquet_file         footer metadata for stats pruning/row accounting —
                     pyarrow reads through any of its filesystems
===================  =========================================================
"""

from __future__ import annotations

import os
import shutil
import uuid


class LocalFS:
    """os-module implementation: plain paths, atomic create-exclusive via
    link(2) of an fsync'd temp file."""

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime(self, path: str) -> "float | None":
        """Last-modified time (epoch seconds) — vacuum's retention input.
        None when the store doesn't expose one (the caller must then treat
        the file as too-young-to-collect: fail safe)."""
        return os.path.getmtime(path)

    def remove(self, path: str) -> None:
        os.unlink(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def create_exclusive(self, path: str, data: bytes) -> None:
        """Atomic publish: the file appears fully-written or not at all,
        and a concurrent publisher of the same name loses with
        FileExistsError. fsync-then-link keeps both properties."""
        tmp = os.path.join(
            os.path.dirname(path), f".tmp_{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def parquet_file(self, path: str):
        import pyarrow.parquet as pq

        return pq.ParquetFile(path)

    def copy(self, src: str, dst: str) -> None:
        """Byte copy (deep clone's primitive) — never used on a path
        readers can already see, so non-atomicity is fine."""
        shutil.copyfile(src, dst)


class ArrowFS:
    """Adapter over a ``pyarrow.fs.FileSystem`` — S3/HDFS/GCS/local from
    one URI. Paths passed in are store-relative (scheme stripped by
    :func:`get_fs`)."""

    def __init__(self, fs) -> None:
        self._fs = fs

    def _info(self, path: str):
        from pyarrow.fs import FileSelector  # noqa: F401  (doc pointer)

        return self._fs.get_file_info(path)

    def listdir(self, path: str) -> list[str]:
        from pyarrow.fs import FileSelector

        return [
            os.path.basename(i.path)
            for i in self._fs.get_file_info(FileSelector(path))
        ]

    def exists(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self._info(path).type != FileType.NotFound

    def isdir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self._info(path).type == FileType.Directory

    def size(self, path: str) -> int:
        return self._info(path).size

    def mtime(self, path: str) -> "float | None":
        mt = self._info(path).mtime
        return None if mt is None else mt.timestamp()

    def remove(self, path: str) -> None:
        self._fs.delete_file(path)

    def rename(self, src: str, dst: str) -> None:
        # Object stores implement this as copy+delete; only ever used on
        # files no committed manifest references (see module doc).
        self._fs.move(src, dst)

    def makedirs(self, path: str) -> None:
        self._fs.create_dir(path, recursive=True)

    def rmtree(self, path: str) -> None:
        from pyarrow.fs import FileType

        if self._info(path).type != FileType.NotFound:
            self._fs.delete_dir(path)

    def read_bytes(self, path: str) -> bytes:
        with self._fs.open_input_file(path) as fh:
            return fh.read()

    def create_exclusive(self, path: str, data: bytes) -> None:
        """Best-effort exclusivity, FAIL-CLOSED: pyarrow exposes no
        conditional put, so the check-then-write has a TOCTOU window on
        object stores. Instead of silently emulating, we verify AFTER the
        write — re-read the blob and compare bytes; a mismatch means a
        racer overwrote (or was overwritten by) us and the commit is
        reported LOST (FileExistsError -> CommitConflict upstream), never
        silently dropped. The residual hazard is two racers writing and
        BOTH reading their own bytes back before the store settles —
        last-writer-wins with both verifying clean is still possible on
        eventually-consistent stores, so a production S3 deployment must
        replace this one method with a conditional PUT (If-None-Match: *);
        HDFS gets exclusivity from create(overwrite=false) natively."""
        from pyarrow.fs import FileType

        if self._fs.get_file_info(path).type != FileType.NotFound:
            raise FileExistsError(path)
        with self._fs.open_output_stream(path) as fh:
            fh.write(data)
        try:
            back = self.read_bytes(path)
        except Exception as e:
            raise FileExistsError(
                f"{path}: verify-after-write readback failed ({e}); "
                "treat the commit as lost and re-plan"
            ) from e
        if back != data:
            raise FileExistsError(
                f"{path}: verify-after-write mismatch — a concurrent "
                "committer won the race; re-plan against the new version"
            )

    def parquet_file(self, path: str):
        import pyarrow.parquet as pq

        return pq.ParquetFile(path, filesystem=self._fs)

    def copy(self, src: str, dst: str) -> None:
        with self._fs.open_input_stream(src) as r, self._fs.open_output_stream(
            dst
        ) as w:
            while True:
                chunk = r.read(8 << 20)
                if not chunk:
                    break
                w.write(chunk)


def get_fs(path: str) -> "tuple[LocalFS | ArrowFS, str]":
    """Resolve (filesystem, store-relative path) for ``path``. Scheme-less
    and ``file://`` paths get :class:`LocalFS`; any other URI resolves
    through ``pyarrow.fs.FileSystem.from_uri`` (s3://, hdfs://, gs://,
    ...)."""
    if "://" not in path:
        return LocalFS(), path
    scheme, _, rest = path.partition("://")
    if scheme == "file":
        return LocalFS(), "/" + rest.lstrip("/")
    from pyarrow.fs import FileSystem

    fs, rel = FileSystem.from_uri(path)
    return ArrowFS(fs), rel
