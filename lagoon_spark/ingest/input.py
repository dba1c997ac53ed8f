"""Input acquisition for ingest: local paths, URLs, zip archives.

Mirrors the reference's ``withInput`` dispatch
(`src/backend/src/Lagoon/Ingest.hs:580-691`): upload/local file, HTTP(S)
GET, S3 object, and single-entry zip decompression (spooled to a temp
file, `Ingest.hs:673-680`). Spark-native note: for bulk data living in
object storage the engine should *scan in place* (``s3a://`` paths go
straight to ``spark.read``); this module is for the reference's
ingest-one-file-through-the-engine flow where type inference needs the
raw bytes locally.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile
from urllib.parse import urlparse


class InputError(ValueError):
    pass


def acquire(source: str, cleanup: list[str] | None = None) -> str:
    """Resolve ``source`` to a local file path, spooling if needed.

    Supported: plain paths, ``file://`` URLs, ``http(s)://`` URLs
    (fetched to a spool file), ``s3://`` (requires boto3 — absent in
    this environment, raises with the Spark-native alternative), and
    ``.zip`` archives containing exactly one entry. Spooled temp files
    are appended to ``cleanup`` for the caller to unlink.
    """
    cleanup = cleanup if cleanup is not None else []
    scheme = urlparse(source).scheme

    if scheme in ("http", "https"):
        import urllib.request

        fd, spool = tempfile.mkstemp(suffix=os.path.basename(source) or ".download")
        os.close(fd)
        cleanup.append(spool)
        with urllib.request.urlopen(source) as resp, open(spool, "wb") as out:
            shutil.copyfileobj(resp, out)
        local = spool
    elif scheme == "file":
        local = urlparse(source).path
    elif scheme == "s3":
        local = _fetch_s3(source, cleanup)
    else:
        local = source

    if local.lower().endswith(".zip"):
        local = _unzip_single(local, cleanup)
    return local


def _make_s3_client():
    """boto3 S3 client factory — a seam so tests (and alternative SDKs)
    can inject a client without boto3 installed."""
    try:
        import boto3
    except ImportError:
        raise NotImplementedError(
            "s3:// ingest needs boto3 (not installed); for bulk data "
            "prefer scanning in place with spark.read over an s3a:// path"
        ) from None
    return boto3.client("s3")


def _fetch_s3(source: str, cleanup: list[str]) -> str:
    """Spool one S3 object to a local temp file (the reference's
    S3 GetObject input branch, `Ingest.hs:580-691`; bucket/key split
    per `uriToRemoteType` :566-573)."""
    parsed = urlparse(source)
    bucket, key = parsed.netloc, parsed.path.lstrip("/")
    if not bucket or not key:
        raise InputError(f"s3 URL needs s3://bucket/key, got {source!r}")
    client = _make_s3_client()
    fd, spool = tempfile.mkstemp(suffix="_" + (os.path.basename(key) or "object"))
    os.close(fd)
    cleanup.append(spool)
    client.download_file(bucket, key, spool)
    return spool


# decompression spool ceiling: a zip bomb must not fill the disk; the
# declared size is checked first (cheap) and the actual stream is
# re-checked during the copy (headers can lie)
MAX_UNZIP_BYTES = int(os.environ.get("LAGOON_MAX_UNZIP_BYTES", 16 << 30))


def _unzip_single(path: str, cleanup: list[str]) -> str:
    """Extract the single entry of a zip to a spool file
    (`Ingest.hs:673-680` behavior: exactly one entry expected)."""
    with zipfile.ZipFile(path) as zf:
        entries = [i for i in zf.infolist() if not i.is_dir()]
        if len(entries) != 1:
            raise InputError(
                f"zip must contain exactly one file, found {len(entries)}: {path}"
            )
        entry = entries[0]
        if entry.file_size > MAX_UNZIP_BYTES:
            raise InputError(
                f"zip entry declares {entry.file_size} bytes, over the "
                f"{MAX_UNZIP_BYTES}-byte spool ceiling: {path}"
            )
        fd, spool = tempfile.mkstemp(suffix="_" + os.path.basename(entry.filename))
        os.close(fd)
        cleanup.append(spool)
        written = 0
        with zf.open(entry) as src, open(spool, "wb") as out:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                written += len(chunk)
                if written > MAX_UNZIP_BYTES:
                    raise InputError(
                        f"zip entry exceeded the {MAX_UNZIP_BYTES}-byte spool "
                        f"ceiling while decompressing: {path}"
                    )
                out.write(chunk)
        return spool
