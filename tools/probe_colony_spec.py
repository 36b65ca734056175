"""On-chip (k, cell_factor) sweep of the dense CONTACT spec on a bonded
colony — the "coarser cells" experiment BASELINE.md names for the ~7%
swept-lane occupancy: a larger cell packs more centers per cell (fewer,
fuller tiles; coarser tile-skip granularity) at the cost of more slots
per cell (k) and a wider reach-to-cell ratio.

Usage: python tools/probe_colony_spec.py [n] [substeps]

Prints one line per config: contact-pass ms/step (best + median of 5
scan windows), slots/particle, overflow. Pick the fastest with
overflow == 0. The per-config numbers are directly comparable to the
`contact` row of tools/probe_colony.py's phase split.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sph_tpu.engine.colony import bonded_colony
from sph_tpu.physics.contact_dense import contact_forces_dense, make_contact_spec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 60

state, params0, _ = bonded_colony(
    N, neighbor_mode="dense", grid_dim=48, grid_cell_size=4.0,
    cell_capacity=16, max_splits_per_step=64, dense_k=2, use_pallas=True,
)

# k=8 is omitted: the CONTACT sweep is full-stencil (contact_variants:
# ~(9·(2k−1)+8) unrolled variants ⇒ ~280 at k=8), which XLA compiles
# pathologically slowly (>9 min on CPU; the fluid engine's k=8 is fine
# because its Newton-halved sweep has half the variants).
CONFIGS = [
    (2, 1.05),   # shipped production spec
    (2, 1.30),
    (2, 1.60),
    (4, 1.50),
    (4, 1.80),
    (4, 2.20),
]

print(f"n={N} backend={jax.default_backend()} substeps={SUB}")
for k, cf in CONFIGS:
    params = params0.replace(dense_k=k, dense_cell_factor=cf)
    try:
        spec = make_contact_spec(params, k=k, cell_factor=cf)
        slots = spec.nz * spec.ny * spec.nx * k

        def body(st):
            f, t, ovf = contact_forces_dense(st, params)
            # Fold the result back so the scan body isn't DCE'd; tiny
            # scale keeps the colony geometry (and thus occupancy) fixed.
            return st.replace_fields(
                vel=st.vel + 1e-12 * f,
                overflow=st.overflow + ovf.astype(st.overflow.dtype),
            )

        run = jax.jit(lambda st: jax.lax.scan(
            lambda c, _: (body(c), None), st, None, length=SUB)[0])
        out = run(state)
        _ = float(jnp.sum(out.pos[0]))          # sync through the relay
        ovf = int(out.overflow)
        times = []
        for _i in range(5):
            t0 = time.perf_counter()
            out = run(state)
            _ = float(jnp.sum(out.pos[0]))
            times.append((time.perf_counter() - t0) / SUB * 1e3)
        times.sort()
        print(
            f"k={k} cf={cf:.2f}: best {times[0]:6.2f} ms/step  "
            f"median {times[2]:6.2f}  slots/particle "
            f"{slots / N:5.1f}  overflow {ovf}"
        )
    except Exception as e:  # noqa: BLE001
        print(f"k={k} cf={cf:.2f}: FAIL {str(e)[:120]}")
