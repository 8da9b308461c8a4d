"""FASTQ parser (reference: cobs/fastq_file.hpp).

4-line record cycle: '@' header, sequence, '+' separator, quality (dropped).
Terms never cross reads. Size histogram cached like FASTA.
"""

import os
import struct

import numpy as np

from cobs_tpu.settings import settings
from cobs_tpu.ingest.util import read_lines, sliding_windows


class FastqFile:
    def __init__(self, path, use_cache: bool = True):
        self.path = str(path)
        if not os.path.exists(self.path):
            raise FileNotFoundError(self.path)
        self.size_ = 0
        self.sequence_count = 0
        self.size_hist: dict[int, int] = {}
        if not use_cache or settings.disable_cache:
            self._compute_index()
        elif not self._read_cache_file():
            self._compute_index()
            self._write_cache_file()

    def cache_path(self) -> str:
        return self.path + ".cobs_cache"

    def _check_lines(self, lines):
        for line_num, line in enumerate(lines):
            mod = line_num % 4
            if mod == 0 and (len(line) == 0 or line[0:1] != b"@"):
                raise ValueError(
                    f"FastqFile: line {line_num} does not start with @ - "
                    f"{self.path}")
            if mod == 2 and (len(line) == 0 or line[0:1] != b"+"):
                raise ValueError(
                    f"FastqFile: line {line_num} does not start with + - "
                    f"{self.path}")

    def _compute_index(self) -> None:
        lines = read_lines(self.path)
        self._check_lines(lines)
        self.size_ = sum(len(line) + 1 for line in lines)
        self.sequence_count = 0
        self.size_hist = {}
        for line in lines[1::4]:
            self.size_hist[len(line)] = self.size_hist.get(len(line), 0) + 1
            self.sequence_count += 1

    def _write_cache_file(self) -> None:
        tmp = self.cache_path() + ".tmp"
        try:
            with open(tmp, "wb") as f:
                f.write(struct.pack("<QQQ", self.size_, self.sequence_count,
                                    len(self.size_hist)))
                for size, count in sorted(self.size_hist.items()):
                    f.write(struct.pack("<QQ", size, count))
            os.replace(tmp, self.cache_path())
        except OSError:
            pass

    def _read_cache_file(self) -> bool:
        try:
            with open(self.cache_path(), "rb") as f:
                self.size_, self.sequence_count, hist_size = struct.unpack(
                    "<QQQ", f.read(24))
                for _ in range(hist_size):
                    size, count = struct.unpack("<QQ", f.read(16))
                    self.size_hist[size] = count
                return f.read(1) == b""
        except (OSError, struct.error):
            return False

    def size(self) -> int:
        return self.size_

    def num_terms(self, q: int) -> int:
        return sum(count * (0 if size < q else size - q + 1)
                   for size, count in self.size_hist.items())

    def sequences(self):
        lines = read_lines(self.path)
        self._check_lines(lines)
        for line in lines[1::4]:
            if line:
                yield np.frombuffer(line, dtype=np.uint8)

    def term_windows(self, term_size: int):
        for seq in self.sequences():
            w = sliding_windows(seq, term_size)
            if w.shape[0]:
                yield w

    def process_terms(self, term_size: int, callback) -> None:
        for w in self.term_windows(term_size):
            for row in w:
                callback(row.tobytes())
