"""WARC / WET web-archive reading for Spark.

The reference engine ingests documents through its REST put API
(/root/reference/bayard/src/node.rs — put handlers); at web scale the
corpus upstream of that API is WARC (ISO 28500) / WET archives à la
Common Crawl.  This module turns those files into rows.

Physical layout: ``spark.read.format("binaryFile").load(glob)`` yields one
row per archive file ``(path, …, content: binary)``; ``warc_records``
explodes each file into one row per WARC record inside ``mapInPandas``.
Per-FILE Python is the granularity (one row = one archive — the same
accepted grain as one row = one image in functions/multimodal.py); inside
a file the record walk is an O(1) header parse plus a buffer slice per
record, driven by Content-Length, never by scanning payload bytes.  Real
CC files are ~1 GiB, so one file per task is the partitioning grain and
cluster parallelism = file count (a CC crawl ships ~10^5 files).

Compression: Common Crawl gzips each record as its OWN gzip member;
``zlib.decompressobj`` splits members in streaming fashion.  A whole-file
single-member gzip and plain uncompressed WARC parse identically — the
record walk runs over the concatenated decompressed stream either way.
The walk itself is INCREMENTAL (``iter_warc_records``): decompression and
record scanning interleave over a rolling, compacted buffer, and
``warc_records`` emits Arrow batches as records complete — peak task
memory is the compressed input plus one batch, never the ~4× inflated
archive.

Error contract: malformed input NEVER yields silent garbage.  In the
default tolerant mode every record parsed before the corruption point is
kept and one extra row carries ``parse_error`` (all other fields NULL) —
a CC-scale job must survive a truncated tail without losing the file.
``strict=True`` raises ``WarcParseError`` instead.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GZIP_MAGIC = b"\x1f\x8b"

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_seq", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.TimestampType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


class WarcParseError(ValueError):
    """Typed parse failure (strict mode)."""


STREAM_CHUNK = 1 << 20  # raw-input granularity fed to the decompressor
MAX_HEADER = 1 << 16  # a WARC header block past 64 KB is malformed
_COMPACT_AT = 8 << 20  # drop consumed buffer prefix beyond this
# bound on a single decompress() call's output: a gzip bomb (~1000x
# inflation) must emit in bounded chunks, not materialize whole
# (ADVICE r6 — keeps the 'peak memory = compressed input + one batch'
# contract honest on adversarial input)
_MAX_INFLATE = 4 << 20
# per-record Content-Length cap: a crafted multi-GB record yields one
# parse_error row instead of buffering unboundedly in task memory
MAX_RECORD_BYTES = 1 << 30


def _chunks_of(buf, size: int = STREAM_CHUNK):
    mv = memoryview(buf)
    for i in range(0, len(mv), size):
        yield mv[i : i + size]


def _decompressed_stream(raw_chunks):
    """Yield decompressed chunks of a (possibly multi-member-gzip) stream.

    The generator's RETURN value is an error string (corrupt/truncated
    member) or None — drive it with next() and catch StopIteration.value.
    """
    it = iter(raw_chunks)
    head = b""
    for c in it:
        head += bytes(c)
        if len(head) >= 2:
            break
    if head[:2] != GZIP_MAGIC:
        if head:
            yield head
        for c in it:
            yield c
        return None
    d = zlib.decompressobj(wbits=31)
    fed = 0
    data: bytes | memoryview = head
    while True:
        if len(data):
            fed += len(data)
            try:
                out = d.decompress(data, _MAX_INFLATE)
                while out:
                    yield out
                    tail = d.unconsumed_tail
                    if not tail:
                        break
                    out = d.decompress(tail, _MAX_INFLATE)
            except zlib.error as ex:
                return f"gzip member: {ex}"
            if d.eof:
                data = d.unused_data
                d = zlib.decompressobj(wbits=31)
                fed = 0
                continue
            data = b""
        else:
            nxt = next(it, None)
            if nxt is None:
                if fed:
                    return "gzip member truncated"
                return None
            data = nxt


def _gunzip_tolerant(buf: bytes) -> tuple[bytes, str | None]:
    """Concatenate all gzip members of ``buf`` (CC: one member per record).

    Returns (decompressed-prefix, error) — a corrupt/truncated member
    keeps everything the good members before it produced.
    """
    out = []
    gen = _decompressed_stream(_chunks_of(buf))
    while True:
        try:
            out.append(next(gen))
        except StopIteration as si:
            return b"".join(bytes(c) for c in out), si.value


def gunzip_members(buf: bytes) -> bytes:
    """Strict variant of :func:`_gunzip_tolerant`."""
    raw, err = _gunzip_tolerant(buf)
    if err is not None:
        raise WarcParseError(err)
    return raw


def _parse_warc_date(s: str | None):
    if not s:
        return None
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            return None
        if dt.tzinfo is None:  # WARC dates are UTC; never assume local tz
            return dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) of an HTTP message; payload on failure."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep]
    status_line = head.split(b"\r\n", 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, None, payload
    hdrs = _parse_headers(head)
    return status, hdrs.get("content-type"), payload[sep + 4 :]


def iter_warc_records(
    raw_chunks, path: str, strict: bool = False
) -> Iterator[dict]:
    """INCREMENTAL record iterator over raw file chunks (gzip or plain).

    Peak memory is one record + the decompress window — never the whole
    decompressed archive (a ~1 GiB CC gzip inflates ~4×; the old
    whole-buffer walk held all of it per task).  The consumed buffer
    prefix is compacted as the walk advances.

    Error contract unchanged: a record-level problem yields one error row
    and ends the file; a gzip-member failure surfaces after the records
    its good prefix produced.  ``strict=True`` raises at the same points.
    """
    stream = _decompressed_stream(raw_chunks)
    stream_err: str | None = None
    exhausted = False
    buf = bytearray()
    start = 0  # cursor into buf
    base = 0  # bytes compacted away (global offset = base + start)
    seq = 0

    def fill() -> bool:
        nonlocal stream_err, exhausted
        if exhausted:
            return False
        try:
            buf.extend(next(stream))
            return True
        except StopIteration as si:
            stream_err = si.value
            exhausted = True
            return False

    def need(n: int) -> bool:
        """Grow buf until n bytes available from start (or EOF)."""
        while len(buf) - start < n:
            if not fill():
                return False
        return True

    def fail(err: str):
        if strict:
            raise WarcParseError(f"{path}: {err}")
        return _error_row(path, err)

    while True:
        # tolerate padding CRLFs between records
        while need(2) and buf[start : start + 2] == b"\r\n":
            start += 2
        if len(buf) - start == 0 and exhausted:
            break
        if not need(5) and len(buf) - start == 0:
            break
        pos = base + start
        if buf[start : start + 5] != b"WARC/":
            yield fail(f"expected WARC version line at byte {pos}")
            return
        # the terminator must BEGIN within MAX_HEADER bytes of the record
        # start — a bounded find makes the rule a property of the bytes,
        # never of where chunk/decompress boundaries happened to fall
        hdr_cap = start + MAX_HEADER + 4
        hdr_end = buf.find(b"\r\n\r\n", start, hdr_cap)
        while hdr_end < 0 and len(buf) < hdr_cap and fill():
            hdr_end = buf.find(b"\r\n\r\n", start, hdr_cap)
        if hdr_end < 0:
            yield fail(
                f"unterminated or oversized (> {MAX_HEADER} B) record"
                f" header at byte {pos}"
            )
            return
        headers = _parse_headers(bytes(memoryview(buf)[start:hdr_end]))
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield fail(f"missing/invalid Content-Length at byte {pos}")
            return
        if clen > MAX_RECORD_BYTES:
            # refuse to buffer an adversarial record whole (ADVICE r6);
            # same end-the-file contract as the other record-level errors
            yield fail(
                f"record at byte {pos} Content-Length {clen} exceeds the "
                f"{MAX_RECORD_BYTES} B cap"
            )
            return
        body_start = hdr_end + 4
        if not need(body_start - start + clen):
            yield fail(
                f"record at byte {pos} truncated: needs {clen} payload"
                f" bytes, {len(buf) - body_start} remain"
            )
            return
        payload = bytes(memoryview(buf)[body_start : body_start + clen])
        wtype = headers.get("warc-type")
        ctype = headers.get("content-type")
        # body is the HTTP message body for response records and NULL
        # otherwise — duplicating payload bytes into body would double the
        # Arrow footprint of every ~GiB WET archive for no information
        status, http_ct, body = (None, None, None)
        if wtype == "response" and (ctype or "").startswith("application/http"):
            status, http_ct, body = _split_http(payload)
            if status is None:  # unsplittable HTTP message: no body column
                body = None
        yield {
            "path": path,
            "record_seq": seq,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": _parse_warc_date(headers.get("warc-date")),
            "content_type": ctype,
            "content_length": clen,
            "http_status": status,
            "http_content_type": http_ct,
            "payload": payload,
            "body": body,
            "parse_error": None,
        }
        seq += 1
        start = body_start + clen
        if start > _COMPACT_AT:
            del buf[:start]
            base += start
            start = 0
    if stream_err is not None:
        # the decompressed prefix ended exactly on a record boundary, so
        # no record-level error fired — still surface the member failure
        yield fail(stream_err)


def parse_warc_file(raw: bytes, path: str, strict: bool = False) -> list[dict]:
    """Walk one whole in-memory WARC byte string into record dicts —
    a thin wrapper over the incremental :func:`iter_warc_records`."""
    return list(iter_warc_records(_chunks_of(raw), path, strict))


def _error_row(path: str, err: str) -> dict:
    return {
        "path": path,
        "record_seq": None,
        "warc_type": None,
        "record_id": None,
        "target_uri": None,
        "warc_date": None,
        "content_type": None,
        "content_length": None,
        "http_status": None,
        "http_content_type": None,
        "payload": None,
        "body": None,
        "parse_error": err,
    }


def warc_records(
    files: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    strict: bool = False,
    batch_rows: int = 1024,
    batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Explode (path, content) archive rows into one row per WARC record.

    ``files`` is the shape of ``spark.read.format("binaryFile")`` (extra
    columns are dropped).  Records stream out of the incremental parser
    in Arrow batches of at most ``batch_rows`` rows / ~``batch_bytes``
    payload bytes, so a task's peak memory is the (compressed) input file
    plus one batch — never the whole decompressed archive.  See the
    module docstring for the scale and error contracts.
    """
    slim = files.select(path_col, content_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        rows: list[dict] = []
        nbytes = 0

        def flush() -> pd.DataFrame:
            nonlocal rows, nbytes
            out = pd.DataFrame(rows, columns=cols)
            if len(out):
                out["warc_date"] = pd.to_datetime(out["warc_date"], utc=True)
            rows, nbytes = [], 0
            return out

        for pdf in batches:
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for rec in iter_warc_records(
                    _chunks_of(content), str(path), strict
                ):
                    rows.append(rec)
                    # body is a near-full copy of payload on response rows
                    nbytes += len(rec["payload"] or b"") + len(
                        rec["body"] or b""
                    )
                    if len(rows) >= batch_rows or nbytes >= batch_bytes:
                        yield flush()
        if rows:
            yield flush()

    return slim.mapInPandas(kernel, RECORD_SCHEMA)


def wet_text(records: DataFrame, encoding: str = "UTF-8") -> DataFrame:
    """WET conversion records → (url, warc_ts, text) — the extract shape."""
    from pyspark.sql import functions as F

    return records.where(F.col("warc_type") == "conversion").select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("warc_ts"),
        F.decode(F.col("payload"), encoding).alias("text"),
    )


def response_pages(records: DataFrame) -> DataFrame:
    """HTTP 200 response records → (url, warc_ts, html) — BASELINE input."""
    from pyspark.sql import functions as F

    return records.where(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("warc_ts"),
        F.col("body").alias("html"),
    )
