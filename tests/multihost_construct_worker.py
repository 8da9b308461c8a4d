"""Worker for the 2-process multi-host construction test (run by
test_multihost.py, one instance per simulated host).

End-to-end BASELINE config 5 shape at test scale: each process builds
the index shard for its own document slice on the shared filesystem,
then opens the federation and streams queries — once host-local and
once scored through the global ("batch", "docs") mesh that spans both
processes' devices.
"""

import os
import sys
import tempfile
from pathlib import Path

port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from cobs_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402

import cobs_tpu  # noqa: E402
from cobs_tpu.query.search import Search  # noqa: E402
from cobs_tpu.settings import settings  # noqa: E402

settings.disable_cache = True
work = Path(workdir)
docs = work / "docs"

# process 0 writes the corpus; process 1 waits at the barrier
rng = np.random.default_rng(11)
bases = np.frombuffer(b"ACGT", np.uint8)
seqs = [bases[rng.integers(0, 4, size=130 + 53 * i)].tobytes()
        for i in range(20)]
if pid == 0:
    docs.mkdir()
    for i, seq in enumerate(seqs):
        (docs / f"doc{i:03d}.fasta").write_bytes(b">d\n" + seq + b"\n")
distributed.barrier("corpus")

# each process constructs ITS OWN shard (real process_index)
prefix = work / "fed"
my_shard = distributed.construct(
    cobs_tpu.DocumentList(docs), prefix, kind="classic",
    index_params=cobs_tpu.ClassicIndexParameters(clobber=True),
    tmp_path=work / f"tmp{pid}")
assert my_shard == distributed.shard_path(prefix, pid, "classic")
distributed.barrier("construct")

# single-host truth, built locally by each process
single = work / f"single{pid}.cobs_classic"
cobs_tpu.classic_construct(
    cobs_tpu.DocumentList(docs), single,
    index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
ref = Search(str(single))
queries = [seqs[1][:61].decode(), seqs[10][5:80].decode(),
           seqs[19][:45].decode()]
want = [[(r.doc_name, r.score) for r in res]
        for res in ref.search_batch(queries, 0.0)]

# host-local federation must be bit-exact with the single-index build
fed = distributed.open_federated(prefix, 2, "classic")
got = [[(r.doc_name, r.score) for r in res]
       for res in fed.search_batch(queries, 0.0)]
assert got == want, (got[0][:3], want[0][:3])

# federation over the global mesh spanning both processes
meshed = distributed.open_federated(prefix, 2, "classic",
                                    mesh=distributed.global_mesh())
got_mesh = [[(r.doc_name, r.score) for r in res]
            for res in meshed.search_batch(queries, 0.0)]
assert got_mesh == want, (got_mesh[0][:3], want[0][:3])

distributed.barrier("done")
print(f"process {pid}: multihost construct+federation exact",
      flush=True)
