"""``python -m monolith_spark`` — the deployable server entry point.

Mirrors the reference's binary wrapper
(/root/reference/src/bin/monolith-server.rs:26-62): a flag per piece
of db/server config, validated before any engine work, with a nonzero
exit on invalid config (its clap layer + DbOpts::get_config). The
reference's --storage/--indexer plugin switches have no analog here —
Spark-native Parquet + manifest storage replaces the {sled,tikv}×2
dispatch (SURVEY.md §2.7) — so the surviving surface is paths, chunk
size, and HTTP wiring.

Without --serve the process initializes the database directory
(manifest + metadata, the analog of the reference writing
DB_METADATA_FILENAME on startup, tests/test_cli.rs:22-41) and exits 0;
with --serve it blocks serving the Prometheus remote-write/read +
HTTP API surface until SIGINT/SIGTERM.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    from monolith_spark.engine import DEFAULT_CHUNK_MS

    p = argparse.ArgumentParser(
        prog="python -m monolith_spark",
        description="monolith-spark: PySpark-native time-series storage "
        "(Prometheus remote-write/read backend)",
    )
    p.add_argument(
        "--db-path",
        default=".",
        help="database directory (reference --file_dir; default: cwd)",
    )
    p.add_argument(
        "--chunk-size-ms",
        type=int,
        default=DEFAULT_CHUNK_MS,
        help=f"chunk (time-partition) width in ms (default {DEFAULT_CHUNK_MS})",
    )
    p.add_argument("--port", type=int, default=9087,
                   help="HTTP port (default 9087; 0 = ephemeral)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--write-path", default="/write",
                   help="remote-write endpoint path (default /write)")
    p.add_argument("--read-path", default="/read",
                   help="remote-read endpoint path (default /read)")
    p.add_argument(
        "--cpus", type=int, default=None,
        help="local[<n>] cores for the embedded SparkSession "
        "(default: $SPARK_GRAFT_CPUS or all cores)",
    )
    p.add_argument(
        "--serve", action="store_true",
        help="serve HTTP until interrupted (default: initialize the "
        "db directory and exit — the reference's spawn-probe shape)",
    )
    return p


def validate(args: argparse.Namespace) -> None:
    """Config validation before the JVM spins up — invalid config must
    fail fast and nonzero, like the reference's Opts::get_config
    error path (monolith-server.rs:61-62 expect())."""
    if args.chunk_size_ms <= 0:
        raise ValueError(f"--chunk-size-ms must be positive, got {args.chunk_size_ms}")
    if not (0 <= args.port <= 65535):
        raise ValueError(f"--port must be in [0, 65535], got {args.port}")
    if args.cpus is not None and args.cpus <= 0:
        raise ValueError(f"--cpus must be positive, got {args.cpus}")
    for name, path in (("--write-path", args.write_path),
                       ("--read-path", args.read_path)):
        if not path.startswith("/"):
            raise ValueError(f"{name} must start with '/', got {path!r}")
    if args.write_path == args.read_path:
        raise ValueError("--write-path and --read-path must differ")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        validate(args)
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2

    from monolith_spark.engine import MonolithDB
    from monolith_spark.server import MonolithServer
    from monolith_spark.session import get_spark

    spark = get_spark(app_name="monolith-spark-server", cpus=args.cpus)
    db = MonolithDB(spark, args.db_path, chunk_size_ms=args.chunk_size_ms)
    if not args.serve:
        # db dir initialized (manifest + metadata committed by the
        # MonolithDB constructor) — report and exit, so config can be
        # probed without binding a port
        print(f"initialized monolith-spark db at {db.path} "
              f"(chunk_size_ms={db.chunk_size_ms})")
        return 0

    srv = MonolithServer(
        db,
        host=args.host,
        port=args.port,
        write_path=args.write_path,
        read_path=args.read_path,
    )
    print(
        f"monolith-spark serving on http://{args.host}:{srv.port} "
        f"(write={args.write_path} read={args.read_path} "
        f"db={db.path} chunk_size_ms={db.chunk_size_ms})",
        flush=True,
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
