"""Multi-host (multi-process) smoke test for the per-shard checkpoint I/O.

The reference writes checkpoints with MPI-IO collective subarray writes from
every rank (load.f90:155-187); io/sharded.py is the jax.distributed
analogue: each process writes only its addressable shards through a memmap,
with cross-host barriers around file creation and the final flush.  This
test runs TWO real processes under ``jax.distributed`` on the CPU backend
(4 virtual devices each -> an 8-device global mesh), advances a small
sharded simulation two steps, writes a checkpoint cooperatively, reloads it
sharded, and checks byte-identity against a single-process reference file.
"""
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
assert jax.process_count() == 2
assert len(jax.devices()) == 8

from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.initflow import initflow
from cales_tpu.timeloop import Simulation
from cales_tpu.parallel.mesh import make_mesh, field_sharding
from cales_tpu.io import sharded as shio

cfg = Config(ng=(32, 16, 16), l=(2 * np.pi, np.pi, 2.0), gtype=1, gr=1.0,
             visci=2000.0, inivel='log', is_wallturb=True, dtype='float64',
             is_forced=(True, False, False), velf=(1.0, 0.0, 0.0),
             sgstype='smag')
grid = make_grid_from_config(cfg)
mesh = make_mesh((2, 4))
sim = Simulation(cfg, grid, mesh=mesh)
state = sim.initial_state(*initflow(cfg, grid))
sh = field_sharding(mesh)
state = state._replace(
    u=jax.device_put(state.u, sh), v=jax.device_put(state.v, sh),
    w=jax.device_put(state.w, sh), p=jax.device_put(state.p, sh),
    visct=jax.device_put(state.visct, sh))
for _ in range(2):
    state, _ = sim.step(state, 1e-3)
jax.block_until_ready(state.u)

path = sys.argv[3]
shio.save_checkpoint_sharded(path, (state.u, state.v, state.w, state.p),
                             cfg.ng, float(state.time), int(state.istep))
# sharded reload on the same mesh: every process checks its addressable part
u2, v2, w2, p2, t2, i2 = shio.load_checkpoint_sharded(
    path, cfg.ng, np.float64, sh)
for a, b in ((state.u, u2), (state.v, v2), (state.w, w2), (state.p, p2)):
    old = {str(s.index): np.asarray(s.data) for s in a.addressable_shards}
    new = {str(s.index): np.asarray(s.data) for s in b.addressable_shards}
    assert set(old) == set(new), (sorted(old), sorted(new))
    for key in old:
        assert np.array_equal(old[key], new[key]), key
assert (t2, i2) == (float(state.time), int(state.istep))
print(f"proc {jax.process_index()} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_sharded_checkpoint(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    path = str(tmp_path / "fld.bin")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_ENABLE_X64"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i),
                               path],
                              env=env, cwd=repo, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        outs.append(out)
    for i, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i} OK" in out

    # the cooperatively-written file must match a single-process rewrite of
    # the same (gathered) fields byte for byte
    from cales_tpu.io import checkpoint as ckpt
    u, v, w, p, t, istep = ckpt.load_checkpoint(path, (32, 16, 16),
                                                np.float64)
    ref = str(tmp_path / "ref.bin")
    ckpt.save_checkpoint(ref, u, v, w, p, t, istep)
    with open(path, 'rb') as f1, open(ref, 'rb') as f2:
        assert f1.read() == f2.read()
