"""cobs_tpu: a TPU-native Compact Bit-Sliced Signature Index framework.

A ground-up reimplementation of the capabilities of COBS (Bingmann et al.,
SPIRE 2019) designed for TPUs: the bit-sliced signature matrix lives in HBM
as a document-axis-sharded dense array, queries are batched and executed as
fused gather-AND-popcount computations under XLA/Pallas, and multi-chip
scaling uses jax.sharding meshes with XLA collectives.

Public API mirrors the reference `cobs_index` Python module
(reference: python/module.cpp:71-395) so users can switch directly.
"""

import os as _os

if not _os.environ.get("COBS_TPU_NO_COMPILE_CACHE"):
    # persistent XLA compilation cache: repeat CLI invocations and new
    # processes reuse compiled query/construction programs instead of
    # paying multi-second (possibly remote) compiles each run. Set via
    # the live config because the environment may pre-import jax.
    import jax as _jax

    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.expanduser("~"), ".cache",
                              "cobs_tpu", "jax_cache"))
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.1)
            _jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even when the environment pre-imports jax and
    # pins a hardware platform programmatically (which happens before
    # user code runs, making the env var silently lose).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from cobs_tpu.settings import disable_cache, settings
from cobs_tpu.ingest.document_list import (
    DocumentEntry,
    DocumentList,
    FileType,
)
from cobs_tpu.construct.params import (
    ClassicIndexParameters,
    CompactIndexParameters,
)
from cobs_tpu.construct.classic import (
    classic_construct,
    classic_construct_list,
    classic_construct_from_documents,
    classic_combine,
    classic_construct_random,
)
from cobs_tpu.construct.compact import (
    compact_construct,
    compact_construct_list,
    compact_combine_into_compact,
    compact_repack,
)
from cobs_tpu.query.search import QueryError, Search, SearchResult
from cobs_tpu.query.server import QueryServer
from cobs_tpu.query.client import QueryClient

__version__ = "0.1.0"

__all__ = [
    "DocumentEntry",
    "DocumentList",
    "FileType",
    "ClassicIndexParameters",
    "CompactIndexParameters",
    "classic_construct",
    "classic_construct_list",
    "classic_construct_from_documents",
    "classic_combine",
    "classic_construct_random",
    "compact_construct",
    "compact_construct_list",
    "compact_combine_into_compact",
    "compact_repack",
    "QueryClient",
    "QueryError",
    "QueryServer",
    "Search",
    "SearchResult",
    "disable_cache",
    "settings",
]
