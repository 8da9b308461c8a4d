"""Drop-in compatibility shim for the reference ``cobs_index`` module.

The reference ships a pybind11 module named ``cobs_index``
(reference: python/module.cpp:71-395). This module re-exports the
cobs_tpu equivalents under the same names and call conventions so
existing user code — including the reference's own test suite
(reference: python/tests/test_cobs_index.py) — runs unchanged:

    import cobs_index as cobs
    cobs.disable_cache()
    p = cobs.ClassicIndexParameters()
    p.clobber = True
    cobs.classic_construct(input=..., out_file=..., index_params=p)
    cobs.Search(path).search("ACGT...", threshold=0.0, num_results=0)
"""

from pathlib import Path as _Path

from cobs_tpu import (  # noqa: F401
    ClassicIndexParameters,
    CompactIndexParameters,
    DocumentEntry,
    DocumentList,
    FileType,
    Search,
    SearchResult,
    classic_construct_random,
    disable_cache,
)
from cobs_tpu import (
    classic_construct as _classic_construct,
    classic_construct_list as _classic_construct_list,
    compact_construct as _compact_construct,
    compact_construct_list as _compact_construct_list,
)


def _as_list(input):
    if isinstance(input, DocumentList):
        return input
    return DocumentList(_Path(input))


def classic_construct(input, out_file, index_params=None, tmp_path=None,
                      **kwargs):
    """reference: python/module.cpp classic_construct(input, out_file,
    index_params, tmp_path) — `input` is a file/directory path."""
    return _classic_construct(_as_list(input), out_file,
                              tmp_path=tmp_path,
                              index_params=index_params, **kwargs)


def classic_construct_list(list, out_file, index_params=None,
                           tmp_path=None, **kwargs):
    return _classic_construct_list(list, out_file, tmp_path=tmp_path,
                                   index_params=index_params, **kwargs)


def compact_construct(input, out_file, index_params=None, tmp_path=None,
                      **kwargs):
    return _compact_construct(_as_list(input), out_file,
                              tmp_path=tmp_path,
                              index_params=index_params, **kwargs)


def compact_construct_list(list, out_file, index_params=None,
                           tmp_path=None, **kwargs):
    return _compact_construct_list(list, out_file, tmp_path=tmp_path,
                                   index_params=index_params, **kwargs)
