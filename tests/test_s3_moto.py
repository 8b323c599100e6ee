"""Live-ish S3 integration (S8 input / K7 output) against an ephemeral moto
server -- the same position as the ephemeral-Postgres sink test: a real
boto3 wire protocol end-to-end, no mocks inside the engine.

The container has no hadoop-aws jar (re-verified round 6), so these tests
exercise the driver-staged mode (sinks/s3io.py); the s3a:// mapping for
cluster classpaths is covered in tests/test_input_staging.py.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import time

import pytest

boto3 = pytest.importorskip("boto3")

MOTO = shutil.which("moto_server")
pytestmark = pytest.mark.skipif(MOTO is None, reason="moto_server not installed")

FIX = "/root/reference/fixtures"


@pytest.fixture(scope="module")
def s3_env():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [MOTO, "-p", str(port)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    endpoint = f"http://127.0.0.1:{port}"
    env = {
        "AWS_ENDPOINT_URL": endpoint,
        "AWS_ACCESS_KEY_ID": "testing",
        "AWS_SECRET_ACCESS_KEY": "testing",
        "AWS_DEFAULT_REGION": "us-east-1",
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        cli = boto3.client("s3", endpoint_url=endpoint)
        for _ in range(50):
            try:
                cli.list_buckets()
                break
            except Exception:
                time.sleep(0.2)
        else:
            pytest.skip("moto_server did not come up")
        cli.create_bucket(Bucket="flatterer-in")
        cli.create_bucket(Bucket="flatterer-out")
        yield cli
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        proc.terminate()
        proc.wait(timeout=10)


def test_s3_input_stages_and_matches_local(s3_env, spark, tmp_path):
    """flatten() from an s3:// input must produce byte-identical CSV output
    to flattening the same local file."""
    from flatterer_spark.flatten import flatten

    with open(f"{FIX}/basic.json", "rb") as f:
        body = f.read()
    s3_env.put_object(Bucket="flatterer-in", Key="basic.json", Body=body)

    out_s3 = str(tmp_path / "from_s3")
    flatten("s3://flatterer-in/basic.json", out_s3, spark=spark)
    out_local = str(tmp_path / "from_local")
    flatten(f"{FIX}/basic.json", out_local, spark=spark)

    for rel in ("csv/main.csv", "csv/platforms.csv", "fields.csv"):
        with open(os.path.join(out_s3, rel), "rb") as a, open(
            os.path.join(out_local, rel), "rb"
        ) as b:
            assert a.read() == b.read(), rel


def test_s3_output_uploads_all_artifacts(s3_env, spark, tmp_path):
    """flatten() to an s3:// output_dir must upload the full artifact tree
    (csv tables, fields/tables csv, datapackage) with bytes identical to a
    local run, and return s3 URIs in the data map."""
    from flatterer_spark.flatten import flatten

    res = flatten(
        f"{FIX}/basic.json",
        "s3://flatterer-out/run1",
        spark=spark,
    )
    assert res["data"]["main"] == "s3://flatterer-out/run1/csv/main.csv"

    out_local = str(tmp_path / "ref_local")
    flatten(f"{FIX}/basic.json", out_local, spark=spark)
    for rel in (
        "csv/main.csv",
        "csv/developer.csv",
        "csv/platforms.csv",
        "fields.csv",
        "tables.csv",
        "datapackage.json",
    ):
        got = s3_env.get_object(Bucket="flatterer-out", Key=f"run1/{rel}")[
            "Body"
        ].read()
        with open(os.path.join(out_local, rel), "rb") as f:
            assert got == f.read(), rel


def test_s3_input_gz_suffix_preserved(s3_env, spark, tmp_path):
    """A .json.gz key keeps its suffix through staging so Spark's native
    gzip decompression applies."""
    import gzip

    from flatterer_spark.flatten import flatten

    body = gzip.compress(b'{"id": 1, "tags": [{"t": "x"}]}\n{"id": 2}\n')
    s3_env.put_object(Bucket="flatterer-in", Key="rows.json.gz", Body=body)
    out = str(tmp_path / "gz")
    res = flatten(
        "s3://flatterer-in/rows.json.gz", out, spark=spark, ndjson=True
    )
    with open(res["data"]["main"]) as f:
        assert len(f.read().splitlines()) == 3  # header + 2 rows


def test_s3_output_force_false_refuses_nonempty_prefix(s3_env, spark):
    """force=False must not silently overwrite an existing S3 output tree:
    the destination prefix is probed with one list request and a non-empty
    prefix raises, mirroring the local FileExistsError (C1)."""
    from flatterer_spark.flatten import flatten

    s3_env.put_object(
        Bucket="flatterer-out", Key="occupied/csv/main.csv", Body=b"old"
    )
    with pytest.raises(FileExistsError):
        flatten(f"{FIX}/basic.json", "s3://flatterer-out/occupied", spark=spark)
    # force=True proceeds and overwrites
    res = flatten(
        f"{FIX}/basic.json",
        "s3://flatterer-out/occupied",
        spark=spark,
        force=True,
    )
    got = s3_env.get_object(Bucket="flatterer-out", Key="occupied/csv/main.csv")[
        "Body"
    ].read()
    assert got != b"old" and b"_link" in got


def test_s3_force_clears_stale_objects(s3_env, spark):
    """force=True must mirror the local rmtree: objects from a previous run
    that the new run does not re-produce (a dropped child table) must NOT
    survive into the new tree (ADVICE r7)."""
    from flatterer_spark.flatten import flatten

    s3_env.put_object(
        Bucket="flatterer-out", Key="stale/csv/old_child.csv", Body=b"gone"
    )
    flatten(
        f"{FIX}/basic.json", "s3://flatterer-out/stale", spark=spark,
        force=True,
    )
    keys = {
        o["Key"]
        for o in s3_env.list_objects_v2(
            Bucket="flatterer-out", Prefix="stale/"
        ).get("Contents", [])
    }
    assert "stale/csv/old_child.csv" not in keys
    assert "stale/csv/main.csv" in keys and "stale/datapackage.json" in keys


def test_s3_upload_rollback_preserves_preexisting_keys(s3_env, tmp_path):
    """A mid-upload failure must delete only keys NEWLY created by the call:
    keys that existed before (overwrite-in-place) stay, overwritten or not
    -- rollback must never leave the destination with MORE of the old tree
    destroyed than the overwrites already did (ADVICE r7)."""
    from flatterer_spark.sinks import s3io

    src = tmp_path / "tree2"
    src.mkdir()
    for name in ("a.csv", "b.csv", "c.csv", "d.csv"):
        (src / name).write_text(f"new-{name}\n")
    # pre-existing tree: a.csv (will be overwritten before the failure) and
    # zz_old.csv (untouched by the new run)
    s3_env.put_object(
        Bucket="flatterer-out", Key="inplace/a.csv", Body=b"old-a"
    )
    s3_env.put_object(
        Bucket="flatterer-out", Key="inplace/zz_old.csv", Body=b"old-zz"
    )

    real_client = s3io._client

    class FailsOnThird:
        def __init__(self, inner):
            self._inner = inner
            self._n = 0

        def upload_file(self, *a, **kw):
            self._n += 1
            if self._n == 3:
                raise RuntimeError("simulated mid-upload network failure")
            return self._inner.upload_file(*a, **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    s3io._client = lambda: FailsOnThird(real_client())
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            s3io.upload_dir_to_s3(str(src), "s3://flatterer-out/inplace")
    finally:
        s3io._client = real_client
    keys = {
        o["Key"]: s3_env.get_object(Bucket="flatterer-out", Key=o["Key"])[
            "Body"
        ].read()
        for o in s3_env.list_objects_v2(
            Bucket="flatterer-out", Prefix="inplace/"
        ).get("Contents", [])
    }
    # a.csv survived (overwritten -- uploads 1-2 were a.csv, b.csv);
    # zz_old.csv untouched; the newly-created b.csv was rolled back
    assert keys == {
        "inplace/a.csv": b"new-a.csv\n",
        "inplace/zz_old.csv": b"old-zz",
    }


def test_s3_upload_failure_leaves_no_partial_tree(s3_env, tmp_path):
    """If an upload fails partway, upload_dir_to_s3 must delete the keys it
    already uploaded so the remote side keeps the no-partial-output
    contract (C2)."""
    from flatterer_spark.sinks import s3io

    src = tmp_path / "tree"
    (src / "csv").mkdir(parents=True)
    for i in range(4):
        (src / "csv" / f"t{i}.csv").write_text(f"row{i}\n")

    real_client = s3io._client

    class FailsOnThird:
        def __init__(self, inner):
            self._inner = inner
            self._n = 0

        def upload_file(self, *a, **kw):
            self._n += 1
            if self._n == 3:
                raise RuntimeError("simulated mid-upload network failure")
            return self._inner.upload_file(*a, **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    s3io._client = lambda: FailsOnThird(real_client())
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            s3io.upload_dir_to_s3(str(src), "s3://flatterer-out/partial")
    finally:
        s3io._client = real_client
    listed = s3_env.list_objects_v2(
        Bucket="flatterer-out", Prefix="partial/"
    )
    assert listed.get("KeyCount", 0) == 0, listed.get("Contents")
