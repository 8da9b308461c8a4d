"""Text parser: verbatim byte stream including newlines
(reference: cobs/text_file.hpp)."""

import os

import numpy as np

from cobs_tpu.ingest.util import sliding_windows


class TextFile:
    def __init__(self, path):
        self.path = str(path)
        if not os.path.exists(self.path):
            raise FileNotFoundError(self.path)

    def size(self) -> int:
        return os.path.getsize(self.path)

    def num_terms(self, q: int) -> int:
        n = self.size()
        return 0 if n < q else n - q + 1

    def sequences(self):
        with open(self.path, "rb") as f:
            data = f.read()
        if data:
            yield np.frombuffer(data, dtype=np.uint8)

    def term_windows(self, term_size: int):
        for seq in self.sequences():
            w = sliding_windows(seq, term_size)
            if w.shape[0]:
                yield w

    def process_terms(self, term_size: int, callback) -> None:
        for w in self.term_windows(term_size):
            for row in w:
                callback(row.tobytes())
