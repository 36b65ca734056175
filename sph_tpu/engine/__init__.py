from sph_tpu.engine.step import step  # noqa: F401
from sph_tpu.engine.simulation import Simulation  # noqa: F401
