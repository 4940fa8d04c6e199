"""The metadata-filesystem seam for the lakehouse layer.

Every piece of *metadata* I/O the manifest-versioned storage does —
manifest JSON, `_stats.json` skipping sidecars, the `_clones.json`
registry, mview sidecars and refresh locks, vacuum's directory walk —
goes through the one :class:`LocalMetadataIO` instance below
(``partitioned.py``, ``mview.py``, ``sources/manifest_stream.py``
import it as ``metaio.IO``).  Executor-side *data* I/O (parquet
scans/writes) already goes through Spark/Arrow and is NOT behind this
seam; neither are the pyarrow footer reads in ``_dir_stats`` (stats
collection belongs to the write job at cluster scale — Delta computes
them inside the transaction).

Why a seam: SCALE.md names the local-FS metadata boundary as the one
port surface between this single-node sandbox and a 1000-executor
deployment.  This class IS that surface — a Hadoop-FS/object-store
port implements these ~10 operations (the same boundary Delta draws
with its per-filesystem ``LogStore``):

- ``write_new``      → PUT-if-absent / LogStore exclusive create (the
  commit point: first-committer-wins rides on its atomicity)
- ``replace_text``   → rename-or-CAS (atomic pointer swap)
- ``publish_lock``   → lock file with content-atomic publish
- ``list_dir`` / ``exists`` / ``is_dir`` / ``remove`` /
  ``remove_tree`` / ``make_dirs`` / ``read_text`` → the obvious LIST /
  HEAD / DELETE / GET calls

Implementations must preserve the exception contract (the callers'
control flow rides on it): ``write_new`` and ``publish_lock`` raise
``FileExistsError`` when the target exists; ``read_text`` and
``remove`` raise ``FileNotFoundError`` when it does not;
``make_dirs(exist_ok=False)`` raises ``FileExistsError``.  A test
fake (``tests/test_metaio.py``) runs the same semantics suite against
both the local implementation and an in-memory one to prove the seam
is complete enough to swap.
"""

from __future__ import annotations

import os
import shutil


class LocalMetadataIO:
    """POSIX-filesystem implementation — the sandbox default."""

    # -- reads --------------------------------------------------------
    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        return os.listdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def file_size(self, path: str) -> int:
        """Size in bytes; FileNotFoundError when absent (the
        ``read_text`` convention).  Object-store port: HEAD."""
        return os.path.getsize(path)

    # -- writes -------------------------------------------------------
    def write_new(self, path: str, text: str) -> None:
        """Create-exclusive publish — the COMMIT POINT of every
        manifest write.  FileExistsError = a concurrent committer won.
        Object-store port: PUT-if-absent, or a LogStore when the store
        lacks one (S3's conditional PUT, GCS generation-match)."""
        with open(path, "x") as f:
            f.write(text)

    def replace_text(self, path: str, text: str) -> None:
        """Atomic overwrite-publish (write tmp, rename over) — readers
        see the old content or the new, never a torn file.  Object
        -store port: rename-or-CAS."""
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def publish_lock(self, path: str, text: str) -> None:
        """Create the lock ATOMICALLY WITH ITS CONTENT (hard-link a
        fully-written tmp into place); FileExistsError = held.  A
        plain create-then-write would expose an empty lock a reader
        could mistake for stale.  Filesystems without hard-link
        support (some NFS/FUSE/object-store mounts raise EPERM /
        EOPNOTSUPP / ENOSYS / EXDEV) fall back to O_EXCL
        create+write+fsync: the held/free signal — what every caller's
        control flow rides on — is preserved; only content atomicity
        narrows to a sub-millisecond write window, and lock readers
        already treat unparseable content as held-not-stale."""
        import errno

        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise
        except OSError as exc:
            if exc.errno not in (errno.EPERM, errno.EOPNOTSUPP,
                                 errno.ENOSYS, errno.EXDEV,
                                 errno.EACCES):
                raise
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, text.encode())
                os.fsync(fd)
            finally:
                os.close(fd)
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass

    def make_dirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def remove(self, path: str) -> None:
        os.remove(path)

    def remove_tree(self, path: str) -> None:
        """Recursive delete, idempotent (missing = no-op)."""
        shutil.rmtree(path, ignore_errors=True)


#: The instance the lakehouse modules route through.  Swap it (or
#: monkeypatch it) to retarget ALL metadata I/O — the data plane is
#: untouched by design.
IO = LocalMetadataIO()
