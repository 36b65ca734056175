from sph_tpu.sph.model import SPHParams, SPHState, sph_step, make_sph_step  # noqa: F401
from sph_tpu.sph.scenes import dam_break_2d, dam_break_3d, splash_pour_2d  # noqa: F401
