from sph_tpu.render.camera import Camera  # noqa: F401
from sph_tpu.render.splat import render_points, save_image  # noqa: F401
