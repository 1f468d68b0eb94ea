"""Chunk-directory codec parity (E4).

The reference names each chunk directory ``hex(start << 64 | end)``
(/root/reference/src/common/utils.rs:26-41; golden vectors at
:151-171). Our layout uses Hive-style ``chunk_id=N`` partitions
instead — partition discovery and pruning are built into Spark — but
the codec is kept for interop with on-disk reference layouts
(S3 chunk discovery, /root/reference/src/db.rs:127-173).
"""

from __future__ import annotations


def encode_chunk_dir(start_ms: int, end_ms: int) -> str:
    """hex(start << 64 | end), lower-case, no leading zeros."""
    return format((start_ms << 64) | end_ms, "x")


def decode_chunk_dir(name: str) -> tuple[int, int]:
    v = int(name, 16)
    return v >> 64, v & ((1 << 64) - 1)


def chunk_range(start_ms: int, end_ms: int, chunk_size_ms: int) -> tuple[int, int]:
    """Inclusive chunk_id range overlapping [start_ms, end_ms] — the
    partition-pruning twin of the reference's closed-interval overlap
    check (/root/reference/src/common/utils.rs:11-18)."""
    return start_ms // chunk_size_ms, end_ms // chunk_size_ms
