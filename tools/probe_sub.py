"""Substep-count sweep on the trivial scan body AND the full 256k step:
separates per-dispatch relay overhead (amortizes as 1/SUB) from real
per-step work (constant)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.sph.dense import dense_step, make_dense_spec, make_dense_step, pack
from sph_tpu.sph.scenes import dam_break_3d

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
state, params = dam_break_3d(n_target=N)
params = params.replace(cell_factor=1.25, dense_k=8, rebin_every=6,
                        use_pallas=True)
spec = make_dense_spec(params, k=8, cell_factor=1.25)
d0 = pack(state, params, spec)
d0 = make_dense_step(params, spec, substeps=30, donate=False)(d0)


def bench(body, x, sub, rounds=5):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (body(c), None), x, None, length=sub)[0])
    out = f(x)
    _ = float(jnp.sum(out.vx[..., :1]))
    best = 1e9
    for _i in range(rounds):
        t0 = time.perf_counter()
        out = f(x)
        _ = float(jnp.sum(out.vx[..., :1]))
        best = min(best, (time.perf_counter() - t0) / sub * 1000)
    return best


trivial = lambda dd: dd.replace_fields(vx=dd.vx + 1e-9)  # noqa: E731
full = lambda dd: dense_step(dd, params, spec)  # noqa: E731

for sub in (15, 60):
    t = bench(trivial, d0, sub)
    print(f"sub={sub:4d} trivial: {t:7.3f} ms/step "
          f"(dispatch ≈ {t * sub:6.1f} ms/call)", flush=True)
for sub in (15, 60):
    t = bench(full, d0, sub)
    print(f"sub={sub:4d} full   : {t:7.3f} ms/step -> "
          f"{1000.0 / t * N / 1e6:6.1f}M ps/s", flush=True)
