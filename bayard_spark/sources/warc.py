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


def _gunzip_tolerant(buf: bytes) -> tuple[bytes, str | None]:
    """Concatenate all gzip members of ``buf`` (CC: one member per record).

    Returns (decompressed-prefix, error) — a corrupt/truncated member
    keeps everything the good members before it produced.
    """
    out = []
    data = buf
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error as ex:
            return b"".join(out), f"gzip member: {ex}"
        out.append(d.flush())
        if not d.eof:
            return b"".join(out), "gzip member truncated"
        data = d.unused_data
    return b"".join(out), None


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


def parse_warc_file(raw: bytes, path: str, strict: bool = False) -> list[dict]:
    """Walk one (decompressed or plain) WARC byte stream into record dicts."""
    gzip_err: str | None = None
    if raw[:2] == GZIP_MAGIC:
        raw, gzip_err = _gunzip_tolerant(raw)
        if gzip_err is not None and strict:
            raise WarcParseError(f"{path}: {gzip_err}")
    records: list[dict] = []
    pos = 0
    n = len(raw)
    seq = 0
    while pos < n:
        # tolerate padding CRLFs between records
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not raw[pos : pos + 5] == b"WARC/":
            err = f"expected WARC version line at byte {pos}"
            if strict:
                raise WarcParseError(f"{path}: {err}")
            records.append(_error_row(path, err))
            return records
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            err = f"unterminated record header at byte {pos}"
            if strict:
                raise WarcParseError(f"{path}: {err}")
            records.append(_error_row(path, err))
            return records
        headers = _parse_headers(raw[pos:hdr_end])
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            err = f"missing/invalid Content-Length at byte {pos}"
            if strict:
                raise WarcParseError(f"{path}: {err}") from None
            records.append(_error_row(path, err))
            return records
        body_start = hdr_end + 4
        if body_start + clen > n:
            err = (
                f"record at byte {pos} truncated: needs {clen} payload bytes,"
                f" {n - body_start} remain"
            )
            if strict:
                raise WarcParseError(f"{path}: {err}")
            records.append(_error_row(path, err))
            return records
        payload = raw[body_start : body_start + clen]
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
        records.append(
            {
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
        )
        seq += 1
        pos = body_start + clen
    if gzip_err is not None:
        # the decompressed prefix ended exactly on a record boundary, so
        # no record-level error fired — still surface the member failure
        records.append(_error_row(path, gzip_err))
    return records


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
) -> DataFrame:
    """Explode (path, content) archive rows into one row per WARC record.

    ``files`` is the shape of ``spark.read.format("binaryFile")`` (extra
    columns are dropped).  See the module docstring for the scale and
    error contracts.
    """
    slim = files.select(path_col, content_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                rows.extend(parse_warc_file(bytes(content), str(path), strict))
            out = pd.DataFrame(rows, columns=cols)
            if len(out):
                out["warc_date"] = pd.to_datetime(out["warc_date"], utc=True)
            yield out

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
