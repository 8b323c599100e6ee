"""S3 input staging and output upload (S8 input / K7 output).

Two execution modes, picked by what the runtime actually provides:

 - **Cluster mode** (hadoop-aws on the classpath): ``s3://`` inputs map to
   the native ``s3a://`` connector and executors read object-store bytes in
   parallel -- the 100 TB path.  Output upload below is NOT used there
   either; a cluster writes table data via ``df.write`` to ``s3a://``.
 - **Driver-staged mode** (no connector, boto3 importable): inputs download
   to a local spool (same position as stdin/HTTP: a single-stream read that
   needs a seekable copy, docs/inputs.md:13-26), and an ``s3://`` output_dir
   writes locally then uploads every artifact object-by-object.  This is
   the single-node parity mode the reference CLI operates in
   (`/root/reference/docs/s3.md:1-46` -- its S3 I/O is also a single
   process streaming through one connection); "streaming" differs only in
   buffering (the reference uploads while writing; we upload at the end),
   bytes are identical.

Credentials/endpoint come from the standard AWS env/config chain; moto in
``tests/test_s3_moto.py`` exercises both directions end-to-end."""

from __future__ import annotations

import os
import tempfile


def parse_s3_uri(uri: str) -> tuple[str, str]:
    rest = uri[len("s3://"):]
    bucket, _, key = rest.partition("/")
    if not bucket:
        raise ValueError(f"bad s3 uri: {uri}")
    return bucket, key


def _client():
    import boto3

    return boto3.client("s3")


def s3a_available(spark) -> bool:
    """True iff the JVM classpath carries the hadoop-aws S3A connector."""
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def stage_s3_to_local(uri: str) -> str:
    """Download one s3:// object to a local temp file; returns the path.

    Keeps the key's suffix so .gz detection and NDJSON sniffing hold."""
    bucket, key = parse_s3_uri(uri)
    base = key.rsplit("/", 1)[-1] or "object"
    suffix = ".json.gz" if base.endswith(".gz") else os.path.splitext(base)[1] or ".json"
    fd, out = tempfile.mkstemp(suffix=suffix, prefix="flatterer_s3_")
    os.close(fd)
    _client().download_file(bucket, key, out)
    return out


def prefix_nonempty(uri: str) -> bool:
    """True iff at least one object exists under ``uri`` (prefix).

    Backs ``force=False`` for ``s3://`` output dirs: S3 puts silently
    overwrite, so the local "output dir exists" check has to become a
    list-objects probe (one keys-limited request)."""
    bucket, prefix = parse_s3_uri(uri)
    prefix = prefix.rstrip("/")
    resp = _client().list_objects_v2(
        Bucket=bucket, Prefix=f"{prefix}/" if prefix else "", MaxKeys=1
    )
    return resp.get("KeyCount", 0) > 0


def _list_prefix_keys(cli, bucket: str, prefix: str) -> set[str]:
    """All object keys under ``prefix/`` (paginated)."""
    keys: set[str] = set()
    paginator = cli.get_paginator("list_objects_v2")
    for page in paginator.paginate(
        Bucket=bucket, Prefix=f"{prefix}/" if prefix else ""
    ):
        keys.update(o["Key"] for o in page.get("Contents", []))
    return keys


def _delete_keys(cli, bucket: str, keys) -> None:
    keys = list(keys)
    for i in range(0, len(keys), 1000):  # delete_objects caps at 1000
        cli.delete_objects(
            Bucket=bucket,
            Delete={
                "Objects": [{"Key": k} for k in keys[i:i + 1000]],
                "Quiet": True,
            },
        )


def clear_prefix(uri: str) -> int:
    """Delete every object under ``uri`` (prefix); returns how many.

    The remote mirror of the local ``force=True`` ``shutil.rmtree``: a
    forced re-run must not leave stale objects from a previous run mixed
    into the new tree (a child table that no longer exists would otherwise
    survive and disagree with the freshly uploaded datapackage.json)."""
    bucket, prefix = parse_s3_uri(uri)
    cli = _client()
    keys = _list_prefix_keys(cli, bucket, prefix.rstrip("/"))
    _delete_keys(cli, bucket, keys)
    return len(keys)


def upload_dir_to_s3(local_dir: str, uri: str) -> dict[str, str]:
    """Upload every file under ``local_dir`` to ``uri`` (prefix), preserving
    relative paths.  Returns {relative path: s3 uri}.

    No-partial-output contract (C2 parity for the remote side): if any
    upload fails, every key NEWLY CREATED by this call is deleted
    (best-effort) before the error propagates, so a failed run never leaves
    a partial object tree in the bucket.  Keys that already existed before
    the call (an overwrite-in-place upload onto a non-empty prefix) are
    left as overwritten, never deleted -- rollback must not destroy more
    of the previous tree than the overwrites already did.  The flatten()
    force=True path clears the prefix first (``clear_prefix``), so in the
    normal pipeline the prefix is empty here and rollback is total."""
    bucket, prefix = parse_s3_uri(uri)
    prefix = prefix.rstrip("/")
    cli = _client()
    preexisting = _list_prefix_keys(cli, bucket, prefix)
    uploaded: dict[str, str] = {}
    done_keys: list[str] = []
    try:
        for root, _, files in os.walk(local_dir):
            for fn in sorted(files):
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, local_dir)
                key = f"{prefix}/{rel}" if prefix else rel
                cli.upload_file(full, bucket, key)
                done_keys.append(key)
                uploaded[rel] = f"s3://{bucket}/{key}"
    except BaseException:
        try:
            _delete_keys(
                cli, bucket, [k for k in done_keys if k not in preexisting]
            )
        except Exception:
            pass  # cleanup is best-effort; the original error wins
        raise
    return uploaded
