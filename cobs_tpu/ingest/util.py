"""Shared ingest helpers."""

import gzip
import io
from pathlib import Path

import numpy as np


def sliding_windows(seq: np.ndarray, k: int) -> np.ndarray:
    """All length-k windows of a byte sequence as a [n-k+1, k] view.

    Zero-copy stride trick; the batched replacement for the reference's
    per-position term callbacks.
    """
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    n = seq.size
    if n < k:
        return np.empty((0, k), dtype=np.uint8)
    return np.lib.stride_tricks.sliding_window_view(seq, k)


def open_maybe_gzip(path) -> io.BufferedIOBase:
    """Open a file, transparently decompressing .gz."""
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_lines(path) -> list[bytes]:
    """Read all lines like repeated std::getline: '\\n'-separated, the
    terminator not included; a trailing newline does not produce an empty
    final line. '\\r' is NOT stripped (matches the reference parsers)."""
    with open_maybe_gzip(path) as f:
        data = f.read()
    lines = data.split(b"\n")
    if data.endswith(b"\n"):
        lines.pop()
    return lines


def base_name(path) -> str:
    """File name with ALL extensions stripped
    (reference: cobs/util/file.hpp:69-76)."""
    name = Path(path).name
    pos = name.find(".")
    return name if pos < 0 else name[:pos]


def pad_index(index: int, size: int = 6) -> str:
    return f"{index:0{size}d}"
