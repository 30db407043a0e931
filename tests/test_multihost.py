"""Multi-host (DCN) initialization smoke test.

Reference counterpart: /root/reference/trainer/utils/mpi_adapter.py:11-131
(MPIAdapter rendezvous + env export). Our replacement is JAX's coordination
service (iuvl_tpu.runtime.mesh.maybe_init_distributed); this test actually
exercises it: two local processes rendezvous over 127.0.0.1, see the global
device count, and run a cross-process psum — the same wire path a 2-host
TPU pod slice uses over DCN.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)  # no virtual 8-device split here
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
n = jax.device_count()
assert n == 2 * jax.local_device_count(), (n, jax.local_device_count())

mesh = jax.sharding.Mesh(jax.devices(), ("data",))
x = jnp.arange(n, dtype=jnp.float32)
x = jax.device_put(x, NamedSharding(mesh, P("data")))
total = jax.jit(lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(x)
expect = n * (n - 1) / 2
assert float(total) == expect, (float(total), expect)
print(f"RANK{sys.argv[2]} OK devices={n} psum={float(total)}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_psum():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"RANK{i} OK" in out, out[-2000:]


def test_maybe_init_distributed_env_gate():
    """maybe_init_distributed is a no-op without the coordinator env var
    (single-process local mode must not try to rendezvous)."""
    from iuvl_tpu.runtime.mesh import maybe_init_distributed

    assert "JAX_COORDINATOR_ADDRESS" not in os.environ
    maybe_init_distributed()  # must not raise or block
