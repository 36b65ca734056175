"""Scan-iteration floor probe: what does an (almost) empty scan body cost
at the 256k dense layout, and what does each extra HLO op add? Separates
the relay/launch floor from real phase work in tools/probe256.py.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.sph.dense import make_dense_spec, make_dense_step, pack
from sph_tpu.sph.scenes import dam_break_3d

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
SUB = 15
state, params = dam_break_3d(n_target=N)
params = params.replace(cell_factor=1.25, dense_k=8, rebin_every=6,
                        use_pallas=True)
spec = make_dense_spec(params, k=8, cell_factor=1.25)
d = pack(state, params, spec)
d = make_dense_step(params, spec, substeps=SUB, donate=False)(d)


def scan_of(body, x):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=SUB)[0])
    out = f(x)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
    best = 1e9
    for _i in range(6):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        best = min(best, (time.perf_counter() - t0) / SUB * 1000)
    return best


def one_op(dd):
    return dd.replace_fields(vx=dd.vx + 1e-9)


def chain30(dd):
    v = dd.vx
    for _ in range(30):
        v = jnp.sin(v * 1.0000001)  # defeats fusion? no — still one kernel
    return dd.replace_fields(vx=v)


def touch_all(dd):
    # read+write every field once (the integrate-pass traffic, no math)
    return dd.replace_fields(
        px=dd.px + 0.0, py=dd.py + 0.0, pz=dd.pz + 0.0,
        vx=dd.vx + 1e-9, vy=dd.vy + 1e-9, vz=dd.vz + 1e-9,
        rho=dd.rho + 0.0, prs=dd.prs + 0.0)


def many_kernels(dd):
    # 20 data-dependent reductions: XLA cannot fuse across them
    v = dd.vx
    s = jnp.float32(0)
    for _ in range(20):
        s = s + jnp.sum(v[..., :8]) * 1e-30
        v = v + s
    return dd.replace_fields(vx=v)


for name, body in [("one_op", one_op), ("chain30_fused", chain30),
                   ("touch_all_fields", touch_all),
                   ("20_unfusable_kernels", many_kernels)]:
    print(f"{name:22s}: {scan_of(body, d):7.3f} ms/step", flush=True)
