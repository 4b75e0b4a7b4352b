"""cales_tpu — a TPU-native (JAX/XLA/Pallas) incompressible DNS/LES framework
with the capabilities of CaNS-World/CaLES (reference at /root/reference)."""

__version__ = "0.1.0"

from .config import Config, validate  # noqa: F401
from .grid import Grid, make_grid, make_grid_from_config  # noqa: F401
