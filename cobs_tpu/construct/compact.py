"""Compact index construction.

Documents are sorted by size and grouped into pages of 8*page_size; each
page gets a classic sub-index whose Bloom size fits the page's largest
document; the sub-indices are concatenated into one .cobs_compact file with
the last page's rows zero-padded to page_size
(reference: cobs/construction/compact_index.cpp:51-340).
"""

import math
import os
from pathlib import Path

import numpy as np

from cobs_tpu.construct.classic import (
    _check_out_and_tmp,
    _try_rmdir,
    classic_combine,
    classic_construct_from_documents,
)
from cobs_tpu.construct.params import (
    ClassicIndexParameters,
    CompactIndexParameters,
)
from cobs_tpu.core.params import calc_signature_size
from cobs_tpu.fmt import classic as fmt_classic
from cobs_tpu.fmt import compact as fmt_compact
from cobs_tpu.ingest.document_list import DocumentList
from cobs_tpu.ingest.util import pad_index
from cobs_tpu.utils.timer import Timer


def _round_up_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def compact_combine_into_compact(in_dir, out_file, page_size: int = 4096,
                                 memory: int = 8 << 30,
                                 keep_temporary: bool = False) -> None:
    """Assemble classic sub-indices under in_dir into one compact file
    (reference: cobs/construction/compact_index.cpp:51-169)."""
    in_dir = Path(in_dir)
    paths = sorted(p for p in in_dir.rglob("*")
                   if p.is_file() and fmt_classic.is_classic_file(p))

    parameters = []
    file_names = []
    term_size = 0
    canonicalize = 0
    headers = []
    for i, p in enumerate(paths):
        h = fmt_classic.read_classic_header(p)
        headers.append(h)
        parameters.append(fmt_compact.CompactSubIndexParams(
            h.signature_size, h.num_hashes))
        file_names.extend(h.file_names)
        if term_size == 0:
            term_size, canonicalize = h.term_size, h.canonicalize
        if (h.term_size, h.canonicalize) != (term_size, canonicalize):
            raise ValueError("compact combine: inconsistent sub-indices")
        if i < len(paths) - 1:
            if h.row_size != page_size:
                raise ValueError("compact combine: row_size != page_size")
        elif h.row_size > page_size:
            raise ValueError("compact combine: last row_size > page_size")

    t = Timer()
    header = fmt_compact.CompactIndexHeader(
        term_size=term_size, canonicalize=canonicalize,
        page_size=page_size, parameters=parameters, file_names=file_names)

    out_file = Path(out_file)
    if out_file.parent != Path(""):
        out_file.parent.mkdir(parents=True, exist_ok=True)
    with open(out_file, "wb") as ofs:
        header.serialize(ofs)
        stripe_rows = max(1, int(memory) // max(1, page_size) // 2)
        for p, h in zip(paths, headers):
            t.active("copy")
            with open(p, "rb") as ifs:
                fmt_classic.ClassicIndexHeader.deserialize(ifs)
                done = 0
                while done < h.signature_size:
                    nr = min(stripe_rows, h.signature_size - done)
                    raw = ifs.read(nr * h.row_size)
                    if len(raw) != nr * h.row_size:
                        raise RuntimeError(
                            "compact combine: truncated sub-index")
                    if h.row_size == page_size:
                        ofs.write(raw)
                    else:
                        t.active("expand")
                        rows = np.frombuffer(raw, dtype=np.uint8)                             .reshape(nr, h.row_size)
                        padded = np.zeros((nr, page_size),
                                          dtype=np.uint8)
                        padded[:, :h.row_size] = rows
                        t.active("write")
                        np.ascontiguousarray(padded).tofile(ofs)
                        t.active("copy")
                    done += nr
            t.stop()
            if not keep_temporary:
                os.remove(p)
                _try_rmdir(p.parent)
    if not keep_temporary:
        _try_rmdir(in_dir)
    t.print("compact_combine_into_compact()")


def compact_construct(doc_list: DocumentList, index_file, tmp_path=None,
                      index_params: CompactIndexParameters | None = None,
                      **kwargs) -> None:
    """Full compact construction driver
    (reference: cobs/construction/compact_index.cpp:171-340)."""
    params = index_params or CompactIndexParameters(**kwargs)

    index_file = Path(index_file)
    doc_list.sort_by_size()

    page_size = params.page_size
    if page_size == 0:
        page_size = _round_up_pow2(int(math.sqrt(doc_list.size() / 8)))
        page_size = min(max(page_size, 8), 4096)

    num_pages = -(-doc_list.size() // (8 * page_size))
    num_threads = max(1, params.num_threads)
    if num_threads > num_pages:
        num_threads = max(1, doc_list.size() // (8 * page_size))

    tmp_path = _check_out_and_tmp(index_file, tmp_path, params,
                                  fmt_compact.FILE_EXTENSION)

    iteration = 1

    def process(batch_num, entries, _out_file):
        max_doc_size = max(
            (e.num_terms(params.term_size) for e in entries), default=0)
        if max_doc_size == 0:
            return
        signature_size = calc_signature_size(
            max_doc_size, params.num_hashes, params.false_positive_rate)
        classic_params = ClassicIndexParameters(
            term_size=params.term_size, canonicalize=params.canonicalize,
            num_hashes=params.num_hashes,
            false_positive_rate=params.false_positive_rate,
            signature_size=signature_size,
            mem_bytes=params.mem_bytes // max(1, num_threads),
            num_threads=-(-params.num_threads // num_threads),
            log_prefix=f"[{pad_index(batch_num, 2)}/"
                       f"{pad_index(num_pages, 2)}] ",
            keep_temporary=params.keep_temporary,
            device_construct=params.device_construct)
        batch_list = DocumentList(entries=entries)
        classic_construct_from_documents(
            batch_list, tmp_path / pad_index(iteration) /
            pad_index(batch_num), classic_params)

    doc_list.process_batches_parallel(8 * page_size, num_threads, process)

    # hierarchically combine each page directory
    while True:
        all_combined = True
        level_dir = tmp_path / pad_index(iteration)
        next_dir = tmp_path / pad_index(iteration + 1)
        if level_dir.exists():
            for page_dir in sorted(level_dir.iterdir()):
                if not page_dir.is_dir():
                    continue
                done, _ = classic_combine(
                    page_dir, next_dir / page_dir.name,
                    params.mem_bytes, params.num_threads,
                    params.keep_temporary)
                all_combined = all_combined and done
            if not params.keep_temporary:
                _try_rmdir(level_dir)
        if all_combined:
            break
        iteration += 1

    compact_combine_into_compact(
        tmp_path / pad_index(iteration + 1), index_file,
        page_size, params.mem_bytes, params.keep_temporary)

    if not params.keep_temporary:
        _try_rmdir(tmp_path)


def compact_construct_list(input, out_file, index_params=None,
                           tmp_path=None) -> None:
    compact_construct(input, out_file, tmp_path, index_params)
