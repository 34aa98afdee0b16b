"""Real 2-process jax.distributed bring-up test (SURVEY.md §4d; VERDICT
round 1, missing #6).

Spawns two fresh Python processes that initialize a DCN-style coordinator
(Gloo over localhost), build the ('hosts', 'chips') mesh, and run a
cross-process collective plus a block-sharded all-pairs scoring step whose
result must match the single-process XLA reference.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from genome_assembly_tpu.parallel.mesh import (init_distributed,
                                               make_mesh_hosts_chips)

init_distributed(coordinator_address="127.0.0.1:" + port, num_processes=2,
                 process_id=pid)
assert jax.process_count() == 2, jax.process_count()
# repeated call must be a no-op, not a crash (already initialised)
init_distributed(coordinator_address="127.0.0.1:" + port, num_processes=2,
                 process_id=pid)
mesh = make_mesh_hosts_chips()
assert dict(mesh.shape) == {"hosts": 2, "chips": 2}, mesh.shape

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# cross-process reduction over the DCN ('hosts') axis
arr = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("hosts")),
    lambda idx: jnp.arange(4, dtype=jnp.float32)[idx])
total = jax.jit(jnp.sum, in_shardings=NamedSharding(mesh, P("hosts")),
                out_shardings=NamedSharding(mesh, P()))(arr)
assert float(jax.device_get(total.addressable_shards[0].data)) == 6.0

# block-sharded dense pair scoring over the 2x2 (hosts, chips) mesh must
# match the single-process XLA contraction
from genome_assembly_tpu.core.encoding import encode_batch
from genome_assembly_tpu.ops.overlap_allpairs import overlap_scores_block_xla
from genome_assembly_tpu.parallel.sharded import all_pairs_block_scores_2d

rng = np.random.default_rng(0)
n, l = 8, 12
codes = rng.integers(0, 4, (n, l)).astype(np.int8)
lens = np.full((n,), l, np.int32)
reads_g = jax.make_array_from_callback(
    (n, l), NamedSharding(mesh, P(None, None)), lambda idx: codes[idx])
lens_g = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P(None)), lambda idx: lens[idx])
s, e = all_pairs_block_scores_2d(mesh, reads_g, lens_g,
                                 axes=("hosts", "chips"))
s_ref, e_ref = overlap_scores_block_xla(jnp.asarray(codes), jnp.asarray(lens),
                                        jnp.asarray(codes), jnp.asarray(lens))
s_ref = np.where(np.eye(n, dtype=bool), np.int32(-(2**31) + 1),
                 np.asarray(s_ref))
# compare this process's addressable shards against the reference
for shard in s.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  s_ref[shard.index])
for shard in e.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  np.asarray(e_ref)[shard.index])
print("proc", pid, "OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_scoring():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), port, REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out


def test_init_distributed_noop_without_coordinator():
    # single-process: returns without touching jax.distributed
    from genome_assembly_tpu.parallel.mesh import init_distributed

    init_distributed()  # must not raise, must not initialise anything
