"""Storage interface for streaming-sink side state (generation markers,
snapshot completeness markers, version listings).

The three crash-safe sinks (ledger-gated fact, CMS, HLL —
``streaming/pipeline.py``) keep two kinds of state:

* the PARQUET payload — always read/written through Spark, which already
  speaks every filesystem (local, HDFS, S3A, ...); and
* tiny CONTROL objects — the per-incarnation generation marker and the
  per-snapshot ``_BATCH-<tag>`` completeness markers, plus the ``v=N``
  directory listing that finds the newest complete snapshot.

Only the control side needs filesystem calls from the driver, and that is
what this interface abstracts. Its primitives are deliberately shaped like
an OBJECT STORE, not POSIX — conditional put, get, list-prefix, delete —
so the sink protocols provably need nothing stronger (no rename, no
directory atomicity), and a real remote backend (an S3 client with
``If-None-Match``, a DynamoDB conditional write, ...) can slot in by
implementing four methods:

  put_if_absent(path, text) -> bool   atomic create-if-not-exists; the
                                      object is never observable partially
                                      written (False = already existed)
  get_text(path) -> str | None        read a whole object (None = absent)
  put_marker(path)                    unconditional put of an empty object
  list_dir(path) -> list[str]         immediate child names ([] if absent)
  delete_tree(path)                   recursive delete, ignore-missing
  ensure_dir(path)                    pre-create a container (no-op where
                                      directories don't exist as objects)

``storage_for(path)`` picks the default backend: plain local paths get
:class:`LocalPosixStorage`; URI-schemed paths raise with instructions to
pass an explicit backend — a loud capability probe instead of silently
binding control state to a driver-local path that neither fails over nor
gets deleted with the real checkpoint.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid


class StateStorage:
    """Abstract control-state backend (see module docstring)."""

    def put_if_absent(self, path: str, text: str) -> bool:
        raise NotImplementedError

    def get_text(self, path: str) -> str | None:
        raise NotImplementedError

    def put_marker(self, path: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError

    def delete_tree(self, path: str) -> None:
        raise NotImplementedError

    def ensure_dir(self, path: str) -> None:
        raise NotImplementedError


class LocalPosixStorage(StateStorage):
    """Local-filesystem backend.

    ``put_if_absent`` publishes atomically via write-temp-then-``os.link``:
    the hard link either materializes the COMPLETE object under the final
    name or fails with FileExistsError — the object is never observable
    empty or half-written. (A bare O_EXCL-create-then-write has a crash
    window between create and write that leaves a permanently empty marker,
    wedging every later stream start; plain rename would silently clobber a
    concurrent first writer.)
    """

    def put_if_absent(self, path: str, text: str) -> bool:
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def get_text(self, path: str) -> str | None:
        try:
            with open(path) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def put_marker(self, path: str) -> None:
        open(path, "w").close()

    def list_dir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class FakeRemoteStorage(StateStorage):
    """Test double with OBJECT-STORE semantics over a local directory.

    Uses only whole-object writes guarded by an in-process lock — no
    O_EXCL, no link, no rename — mimicking a remote store's conditional
    put (S3 ``If-None-Match``). Sink tests run against this backend to
    prove the snapshot/generation protocols rely on nothing stronger than
    the four object-store primitives; it is NOT multi-process safe (a real
    remote backend gets its atomicity from the store itself).

    Spark still reads/writes the parquet payload at the same local paths —
    exactly as a real deployment pairs an S3A parquet path with an S3
    client for control objects.
    """

    _lock = threading.Lock()

    def put_if_absent(self, path: str, text: str) -> bool:
        with self._lock:
            if os.path.exists(path):
                return False
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(text)
            return True

    def get_text(self, path: str) -> str | None:
        try:
            with open(path) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def put_marker(self, path: str) -> None:
        with self._lock:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            open(path, "w").close()

    def list_dir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def ensure_dir(self, path: str) -> None:
        # Object stores have no directories; mirror that by doing nothing
        # (put_* creates parents on demand).
        return None


def storage_for(path: str) -> StateStorage:
    """Default backend for ``path``: local paths → :class:`LocalPosixStorage`;
    URI-schemed paths (s3://, hdfs://, ...) raise — pass an explicit
    :class:`StateStorage` implementation for the scheme instead."""
    if "://" in path:
        raise ValueError(
            f"{path!r} is a remote URI; control-state operations need a "
            "StateStorage backend for that scheme (the parquet payload "
            "goes through Spark either way). Pass storage=<impl> to the "
            "sink — see streaming/state_store.py."
        )
    return LocalPosixStorage()
