"""Does a 1M-cell bonded colony fit and step on one chip? Reports the
layout size, step rate (scan-timed), bonds, and overflow."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.engine.step import run_steps
from sph_tpu.physics.contact_dense import make_contact_spec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
SUB = 20
state, params, genome = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)
gd = genome.to_device()
spec = make_contact_spec(params, k=params.dense_k,
                         cell_factor=params.dense_cell_factor)
print(f"n={N} bonds={int(jnp.sum(state.bonds.active))} "
      f"spec={spec.shape()} slots={spec.slots} "
      f"({spec.slots * 4 * 10 / 2**30:.2f} GiB fields)", flush=True)

f = jax.jit(lambda x: run_steps(x, params, gd, SUB))
st = f(state)
_ = float(jnp.sum(st.pos[0]))
print("compiled + warm", flush=True)
best = 1e9
for _i in range(4):
    t0 = time.perf_counter()
    st = f(st)
    _ = float(jnp.sum(st.pos[0]))
    best = min(best, (time.perf_counter() - t0) / SUB * 1000)
print(f"{best:.2f} ms/step = {1000.0 / best:.2f} steps/s "
      f"= {1000.0 / best * N / 1e6:.2f}M ps/s; overflow="
      f"{int(st.overflow)}", flush=True)
