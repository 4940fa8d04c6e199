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


class HadoopMetadataIO:
    """Hadoop-FileSystem implementation of the seam — the cluster /
    object-store port SCALE.md names as the one deployment delta.

    Routes every call through the JVM ``org.apache.hadoop.fs
    .FileSystem`` Spark already ships, so the same instance serves
    ``file://``, ``hdfs://``, and (with the usual connector jars)
    ``s3a://`` / ``gs://`` / ``abfss://`` paths — the filesystem is
    resolved PER PATH from the session's Hadoop configuration, exactly
    how Spark's own data plane resolves it.

    Atomicity story by operation (the commit protocol's load-bearing
    semantics, mirroring Delta's per-store ``LogStore`` matrix):

    - ``write_new`` (the commit point): HDFS ``create(overwrite =
      false)`` is an atomic namenode operation — first-committer-wins
      holds.  ``file://`` goes through ``RawLocalFileSystem``'s
      exists-then-create, a TOCTOU window this sandbox tolerates (the
      POSIX ``LocalMetadataIO`` with ``O_EXCL`` is the local default;
      this backend exists for cluster URIs).  S3A before conditional
      -PUT support (and any store without create-exclusive) needs an
      external coordination layer — Delta's ``S3SingleDriverLogStore``
      / DynamoDB LogStore is the published answer; plugging one in
      replaces only THIS method.
    - ``replace_text``: write tmp + ``FileContext.rename(OVERWRITE)``
      — atomic on HDFS.  On S3A rename is copy+delete (non-atomic,
      readers may glimpse the old object then the new — never a torn
      one, since the copy is of a fully-written tmp).
    - ``publish_lock``: create-exclusive then write+close.  The
      held/free signal rides on create-exclusive atomicity (HDFS:
      atomic); content visibility has the same sub-millisecond
      open-to-close window as the POSIX ``O_EXCL`` fallback above, and
      lock readers already treat unparseable/empty content as
      held-not-stale, so the window is benign by protocol.

    Exception contract: Java ``FileNotFoundException`` /
    ``FileAlreadyExistsException`` (and the raw-local ``IOException:
    ... already exists`` variant) are translated to the Python
    ``FileNotFoundError`` / ``FileExistsError`` the callers' control
    flow rides on — proven by running the same semantics suite as the
    local backend (tests/test_metaio.py)."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()

    # -- plumbing -----------------------------------------------------
    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, jpath):
        return jpath.getFileSystem(self._conf)

    @staticmethod
    def _translate(exc, path: str):
        """Map a Py4J-wrapped Java IO exception onto the seam's
        Python exception contract; return None when unrecognized."""
        j = getattr(exc, "java_exception", None)
        if j is None:
            return None
        name = j.getClass().getName()
        msg = str(j.getMessage() or "")
        if "FileNotFoundException" in name or "PathNotFoundException" in name:
            return FileNotFoundError(path)
        if ("FileAlreadyExistsException" in name
                or "already exists" in msg.lower()):
            return FileExistsError(path)
        return None

    def _write_stream(self, out, text: str) -> None:
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- reads --------------------------------------------------------
    def read_text(self, path: str) -> str:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            stream = self._fs(p).open(p)
        except Py4JJavaError as exc:
            py = self._translate(exc, path)
            if py is not None:
                raise py from None
            raise
        try:
            data = self._jvm.org.apache.commons.io.IOUtils \
                .toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def list_dir(self, path: str) -> list[str]:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            statuses = self._fs(p).listStatus(p)
        except Py4JJavaError as exc:
            py = self._translate(exc, path)
            if py is not None:
                raise py from None
            raise
        return [s.getPath().getName() for s in statuses]

    def exists(self, path: str) -> bool:
        p = self._path(path)
        return bool(self._fs(p).exists(p))

    def is_dir(self, path: str) -> bool:
        p = self._path(path)
        fs = self._fs(p)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def file_size(self, path: str) -> int:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            return int(self._fs(p).getFileStatus(p).getLen())
        except Py4JJavaError as exc:
            py = self._translate(exc, path)
            if py is not None:
                raise py from None
            raise

    # -- writes -------------------------------------------------------
    def write_new(self, path: str, text: str) -> None:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            out = self._fs(p).create(p, False)
        except Py4JJavaError as exc:
            py = self._translate(exc, path)
            if py is not None:
                raise py from None
            raise
        self._write_stream(out, text)

    def replace_text(self, path: str, text: str) -> None:
        jvm = self._jvm
        p = self._path(path)
        fs = self._fs(p)
        tmp = self._path(f"{path}.tmp.{os.getpid()}")
        self._write_stream(fs.create(tmp, True), text)
        # FileContext.rename(OVERWRITE) — the public atomic-overwrite
        # rename (FileSystem's Rename-options overload is protected);
        # py4j varargs need an explicit Java array
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        rename_opts = self._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1)
        rename_opts[0] = overwrite
        # FileContext rides the raw (checksum-less) AbstractFileSystem,
        # so on a ChecksumFileSystem (file:// LocalFileSystem) the
        # destination's .crc sidecar would, after the rename, describe
        # the OLD content and the tmp's .crc would be orphaned — a
        # stale crc makes every later read throw ChecksumException.
        # Drop both BEFORE the rename (tmp is fully written; absent
        # sidecar = "no verification"): a crash at any point then
        # leaves either the old file or the new one, both readable —
        # cleanup-after-rename left a PERSISTENTLY unreadable dest if
        # the process died between the two steps.
        try:
            for q in (tmp, p):
                crc = fs.getChecksumFile(q)
                if fs.exists(crc):
                    fs.delete(crc, False)
        except Exception:       # not a ChecksumFileSystem (e.g. HDFS)
            pass
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri(), self._conf)
        ctx.rename(tmp, p, rename_opts)

    def publish_lock(self, path: str, text: str) -> None:
        # create-exclusive IS the held/free signal; content follows in
        # the same open-write-close breath (see class docstring for
        # the visibility-window argument)
        self.write_new(path, text)

    def make_dirs(self, path: str, exist_ok: bool = False) -> None:
        p = self._path(path)
        fs = self._fs(p)
        if not exist_ok and fs.exists(p):
            raise FileExistsError(path)
        fs.mkdirs(p)

    def remove(self, path: str) -> None:
        p = self._path(path)
        fs = self._fs(p)
        if not fs.delete(p, False):
            if not fs.exists(p):
                raise FileNotFoundError(path)
            # delete() returned false but the path is still there
            # (permissions, trash policy, ...) — callers like
            # build_postings_index's retract-meta-first crash-safety
            # step rely on remove actually removing; a silent no-op
            # would leave a loadable meta pointing at doomed tables.
            raise OSError(
                f"delete failed but path still exists: {path}")

    def remove_tree(self, path: str) -> None:
        """Recursive delete, idempotent (missing = no-op)."""
        p = self._path(path)
        self._fs(p).delete(p, True)


#: The instance the lakehouse modules route through.  Swap it (or
#: monkeypatch it) to retarget ALL metadata I/O — the data plane is
#: untouched by design.
IO = LocalMetadataIO()


def use_hadoop_io(spark) -> HadoopMetadataIO:
    """Swap the module-global seam to the Hadoop-FS backend (cluster
    deployments: call once after building the session).  Returns the
    installed instance; reassign ``metaio.IO = LocalMetadataIO()`` to
    revert."""
    global IO
    IO = HadoopMetadataIO(spark)
    return IO
