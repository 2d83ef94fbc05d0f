"""Filesystem abstraction for index control-plane files.

The DATA plane (docs/postings/norms parquet) always goes through Spark's
own Hadoop filesystem layer and needs nothing from us. The CONTROL plane —
commit log, tombstone listings, lineage markers, meta.json — was previously
raw `os.path` (driver-local only). This routes it through `pyarrow.fs`,
which resolves local paths, `s3://`, `hdfs://`, `gs://` (via GcsFileSystem)
from the same URI, so the snapshot/lineage machinery works on object
stores.

Atomicity note: `publish()` is write-temp + rename. POSIX rename is atomic;
S3-style stores emulate it as copy+delete, where the real deployment story
is an Iceberg/catalog pointer swap (the commit log IS that pointer —
segments.py docstring). The abstraction keeps the call site identical.
"""

from __future__ import annotations

import posixpath

import pyarrow.fs as pafs


class IndexFS:
    """Thin pyarrow.fs wrapper bound to one index root."""

    def __init__(self, root: str):
        if "://" in root:
            self.fs, self.root = pafs.FileSystem.from_uri(root)
        else:
            self.fs = pafs.LocalFileSystem()
            self.root = root

    # ---------- path helpers ----------

    def path(self, *parts: str) -> str:
        return posixpath.join(self.root, *parts)

    # ---------- reads ----------

    def exists(self, path: str) -> bool:
        return self.fs.get_file_info(path).type != pafs.FileType.NotFound

    def read_text(self, path: str) -> str:
        with self.fs.open_input_stream(path) as f:
            return f.read().decode("utf-8")

    def listdir(self, path: str) -> list[str]:
        info = self.fs.get_file_info(path)
        if info.type == pafs.FileType.NotFound:
            return []
        sel = pafs.FileSelector(path, recursive=False)
        return sorted(
            posixpath.basename(fi.path) for fi in self.fs.get_file_info(sel)
        )

    # ---------- writes ----------

    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def write_text(self, path: str, text: str) -> None:
        parent = posixpath.dirname(path)
        if parent:
            self.fs.create_dir(parent, recursive=True)
        with self.fs.open_output_stream(path) as f:
            f.write(text.encode("utf-8"))

    def publish(self, path: str, text: str) -> None:
        """Atomically publish `text` at `path` (write temp + rename)."""
        tmp = path + ".tmp"
        self.write_text(tmp, text)
        self.fs.move(tmp, path)

    def delete_dir(self, path: str) -> None:
        if self.exists(path):
            self.fs.delete_dir(path)

    def delete_file(self, path: str) -> None:
        if self.exists(path):
            self.fs.delete_file(path)

    def rename(self, src: str, dst: str) -> None:
        self.fs.move(src, dst)
