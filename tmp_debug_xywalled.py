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

cfg = Config(ng=(256, 32, 16), l=(2.0, 1.0, 1.0), gtype=1, gr=0.0,
             visci=2000.0, inivel='uni', is_wallturb=False,
             dtype='float64', sgstype='none', ptransform='mat',
             cbcvel=((('D', 'N', 'N'), ('D', 'D', 'D'),
                      ('D', 'D', 'D')),
                     (('N', 'N', 'N'), ('D', 'D', 'D'),
                      ('D', 'D', 'D'))),
             bcvel=(((1.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                     (0.0, 0.0, 0.0)),) * 2,
             cbcpre=(('N', 'N', 'N'), ('D', 'N', 'N')),
             cbcsgs=(('N', 'D', 'D'), ('N', 'D', 'D')))
grid = make_grid_from_config(cfg)
u, v, w, p = initflow(cfg, grid)
dt = 5e-4
nsteps = int(os.environ.get('NSTEPS', '1'))

sim1 = Simulation(cfg, grid)
assert sim1.use_pallas_mom, sim1.exec_path()
s1 = sim1.initial_state(u, v, w, p)
for _ in range(nsteps):
    s1, _ = sim1.step(s1, dt)

mesh = make_mesh((2, 2))
simN = Simulation(cfg, grid, mesh=mesh)
assert simN.use_pallas_mom and simN._kernel_sharded, simN.exec_path()
sN = simN.initial_state(u, v, w, p)
sh = field_sharding(mesh)
sN = sN._replace(u=jax.device_put(sN.u, sh), v=jax.device_put(sN.v, sh),
                 w=jax.device_put(sN.w, sh), p=jax.device_put(sN.p, sh),
                 visct=jax.device_put(sN.visct, sh))
for _ in range(nsteps):
    sN, _ = simN.step(sN, dt)

for name in ('u', 'v', 'w', 'p'):
    a = np.asarray(getattr(s1, name))
    b = np.asarray(getattr(sN, name))
    if name == 'p':
        a, b = a - a.mean(), b - b.mean()
    d = np.abs(a - b)
    err = d.max()
    loc = np.unravel_index(d.argmax(), d.shape)
    nz, ny, nx = d.shape
    nbad = int((d > err / 10).sum())
    # bad-cell bounding box
    if err > 0:
        zi, yi, xi = np.where(d > err / 10)
        bb = (zi.min(), zi.max(), yi.min(), yi.max(), xi.min(), xi.max())
    else:
        bb = None
    print(f'{name}: max {err:.3e} at (z,y,x)={loc} shape=({nz},{ny},{nx}) '
          f'nbad={nbad} bbox={bb}', flush=True)
for m in range(3):
    a = np.asarray(s1.vlo[m]); b = np.asarray(sN.vlo[m])
    d = np.abs(a - b)
    loc = np.unravel_index(d.argmax(), d.shape)
    print(f'vlo[{m}]: max {d.max():.3e} at {loc} shape={d.shape}', flush=True)

a = np.asarray(s1.v); b = np.asarray(sN.v)
print('single v[7,31,:12]', a[7, 31, :12])
print('shard  v[7,31,:12]', b[7, 31, :12])
print('single v[7,30,:6]', a[7, 30, :6])
print('single |v|max interior', np.abs(a[:, :31]).max(),
      'face row |v|max', np.abs(a[:, 31]).max())
print('shard  face row |v|max', np.abs(b[:, 31]).max())
