from sph_tpu.utils.profiling import step_breakdown, trace  # noqa: F401
