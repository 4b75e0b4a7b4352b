import os
os.environ['CALES_PALLAS_INTERPRET'] = '1'
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
from cales_tpu.config import Config
from cales_tpu.grid import make_grid_from_config
from cales_tpu.initflow import initflow
from cales_tpu.timeloop import Simulation
from cales_tpu.parallel.mesh import make_mesh, field_sharding

cfg = Config(ng=(256, 32, 16), l=(2*np.pi, 2.0, 2.0), gtype=1,
             gr=0.5, visci=2000.0, inivel='duc', is_wallturb=False,
             dtype='float64', is_forced=(True, False, False),
             velf=(1.0, 0.0, 0.0), sgstype='none', ptransform='mat',
             cbcvel=((('P', 'D', 'D'), ('P', 'D', 'D'), ('P', 'D', 'D')),)*2,
             cbcpre=(('P', 'N', 'N'), ('P', 'N', 'N')),
             cbcsgs=(('P', 'D', 'D'), ('P', 'D', 'D')))
grid = make_grid_from_config(cfg)
u, v, w, p = initflow(cfg, grid)
dt = 1e-3

sim1 = Simulation(cfg, grid)
assert sim1.use_pallas_mom, sim1.exec_path()
s1 = sim1.initial_state(u, v, w, p)
s1, _ = sim1.step(s1, dt)

mesh = make_mesh((2, 2))
simN = Simulation(cfg, grid, mesh=mesh)
assert simN.use_pallas_mom and simN._kernel_sharded and simN._gx_sharded
sN = simN.initial_state(u, v, w, p)
sh = field_sharding(mesh)
sN = sN._replace(u=jax.device_put(sN.u, sh), v=jax.device_put(sN.v, sh),
                 w=jax.device_put(sN.w, sh), p=jax.device_put(sN.p, sh),
                 visct=jax.device_put(sN.visct, sh))
sN, _ = simN.step(sN, dt)

a = np.asarray(s1.v); b = np.asarray(sN.v)
print('duct single face |v|max', np.abs(a[:, -1]).max())
print('duct shard  face |v|max', np.abs(b[:, -1]).max())
print('duct v diff max', np.abs(a - b).max(),
      'face diff', np.abs(a[:, -1] - b[:, -1]).max())
