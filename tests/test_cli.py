"""Process-level CLI tests, mirroring the reference's spawn suite
(/root/reference/tests/test_cli.rs:13-95): the binary starts with
default args, honors --db-path (db metadata materializes), and fails
nonzero on invalid config — here via ``python -m monolith_spark``,
with a live write→read roundtrip against the spawned server where the
reference only probes process liveness."""

from __future__ import annotations

import http.client
import json
import os
import re
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPARK_GRAFT_CPUS": "2", "PYTHONUNBUFFERED": "1"}


def _run(args, timeout=180):
    return subprocess.run(
        [sys.executable, "-m", "monolith_spark", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=timeout,
    )


def test_cli_invalid_config_fails_fast_and_nonzero():
    """Invalid config → nonzero exit BEFORE any JVM spinup (the
    reference's Opts::get_config expect() path + the
    invalid_config_file test, test_cli.rs:70-89)."""
    for args, frag in [
        (["--chunk-size-ms", "0"], "--chunk-size-ms"),
        (["--chunk-size-ms", "-5"], "--chunk-size-ms"),
        (["--port", "70000"], "--port"),
        (["--cpus", "0"], "--cpus"),
        (["--write-path", "write"], "--write-path"),
        (["--write-path", "/x", "--read-path", "/x"], "must differ"),
    ]:
        t0 = time.time()
        r = _run(args, timeout=60)
        assert r.returncode == 2, (args, r.stderr)
        assert frag in r.stderr
        assert time.time() - t0 < 30  # validation precedes SparkSession
    # argparse's own rejection of a malformed value is nonzero too
    r = _run(["--chunk-size-ms", "abc"], timeout=60)
    assert r.returncode != 0


@pytest.mark.slow
def test_cli_init_writes_db_metadata(tmp_path):
    """Without --serve: initialize the db dir and exit 0 — metadata
    exists afterwards (test_cli.rs cli_path asserts
    DB_METADATA_FILENAME appears in --file_dir)."""
    r = _run(["--db-path", str(tmp_path / "db"), "--chunk-size-ms", "60000"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "initialized monolith-spark db" in r.stdout
    meta = json.load(open(tmp_path / "db" / "metadata.json"))
    assert meta["chunk_size_ms"] == 60000


@pytest.mark.slow
def test_cli_serve_write_read_roundtrip(tmp_path):
    """Spawn --serve on an ephemeral port, remote-write a sample over
    HTTP, remote-read it back, then SIGTERM — the reference's
    cli_no_args spawn probe upgraded to a real protocol roundtrip."""
    sys.path.insert(0, REPO)
    from monolith_spark.sources import remote as proto

    proc = subprocess.Popen(
        [sys.executable, "-m", "monolith_spark",
         "--db-path", str(tmp_path / "db"), "--chunk-size-ms", "60000",
         "--port", "0", "--serve"],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        line = ""
        deadline = time.time() + 150
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving on" in line:
                break
            assert proc.poll() is None, "server process died during startup"
        m = re.search(r"http://127\.0\.0\.1:(\d+)", line)
        assert m, f"no serving banner: {line!r}"
        port = int(m.group(1))

        wreq = proto.WriteRequest(timeseries=[
            proto.TimeSeries({"__name__": "up", "job": "cli"},
                             [proto.Sample(1.0, 30_000)]),
        ])
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/write",
                     body=proto.snappy_compress(proto.encode_write_request(wreq)))
        assert conn.getresponse().status == 200

        rreq = proto.ReadRequest(queries=[proto.Query(
            start_timestamp_ms=0, end_timestamp_ms=100_000,
            matchers=[proto.LabelMatcher(proto.EQ, "job", "cli")],
        )])
        conn.request("POST", "/read",
                     body=proto.snappy_compress(proto.encode_read_request(rreq)))
        resp = conn.getresponse()
        assert resp.status == 200
        results = proto.decode_read_response(
            proto.snappy_decompress(resp.read())).results
        conn.close()
        (series,) = results[0]
        assert series.labels == {"__name__": "up", "job": "cli"}
        assert [(s.timestamp, s.value) for s in series.samples] == [(30_000, 1.0)]
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
