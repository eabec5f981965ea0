"""Real 2-process jax.distributed bring-up of parallel/multihost.py
(VERDICT r1 item 5): two CPU processes initialize against a local
coordinator, build the global mesh, and run one psum + one sharded
NLTGV2 smoothing call across process boundaries."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["FLAME_REPO"])

from flame_tpu.parallel import multihost
from flame_tpu.parallel.sharding import AXIS

multihost.initialize(coordinator_address=os.environ["COORD"],
                     num_processes=2,
                     process_id=int(os.environ["PID_IDX"]))
assert jax.process_count() == 2, jax.process_count()
mesh = multihost.global_mesh()
assert mesh.devices.size == 4  # 2 processes x 2 local virtual devices

# Cross-process psum: every process contributes its local device values.
from jax.sharding import NamedSharding, PartitionSpec as P
vals = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(AXIS)),
    np.full((2,), float(jax.process_index() + 1), np.float32), (4,))

def body(v):
    return jax.lax.psum(v, AXIS)

total = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(AXIS),
                              out_specs=P(AXIS)))(vals)
local = np.asarray(
    [s.data for s in total.addressable_shards][0])
assert local[0] == 6.0, local  # 1 + 1 + 2 + 2

# Sharded smoothing across hosts: a ring graph, edge capacity 4-divisible.
from flame_tpu.optimize import nltgv2
from flame_tpu.parallel import sharding
from flame_tpu.params import RegularizerParams

V, E = 32, 64
g = nltgv2.empty(V, E, 4)
nv = 16
edges = np.zeros((E, 2), np.int64)
edges[:nv, 0] = np.arange(nv)
edges[:nv, 1] = (np.arange(nv) + 1) % nv
emask = np.zeros(E, bool); emask[:nv] = True
vmask = np.zeros(V, bool); vmask[:nv] = True
rng = np.random.default_rng(0)
g = g._replace(
    pos=jnp.asarray(rng.uniform(0, 50, (V, 2)).astype(np.float32)),
    x=jnp.asarray(rng.uniform(0.1, 0.3, V).astype(np.float32)),
    data_term=jnp.full((V,), 0.2, jnp.float32),
    data_weight=jnp.asarray(vmask.astype(np.float32)),
    vtx_mask=jnp.asarray(vmask),
    edges=jnp.asarray(edges.astype(np.int32)),
    alpha=jnp.asarray(emask.astype(np.float32) * 0.2),
    beta=jnp.asarray(emask.astype(np.float32)),
    edge_mask=jnp.asarray(emask))
g = g._replace(x_bar=g.x)
g2 = sharding.sharded_smooth(RegularizerParams(), g, 10, mesh)
x2 = np.asarray([s.data for s in g2.x.addressable_shards][0])
assert np.isfinite(x2).all()

print(f"proc {jax.process_index()} OK", flush=True)
"""


@pytest.mark.skipif(os.environ.get("FLAME_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(COORD=coord, PID_IDX=str(pid), FLAME_REPO=repo,
                   JAX_PLATFORMS="cpu")
        # Each process must see exactly its own 2 virtual devices.
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
