"""Hardware verification lane CLI: every Pallas twin vs its XLA oracle on
the CURRENT backend (run unmodified = the real TPU through the axon
relay). Non-zero exit on any mismatch.

Run this before recording ANY number into BASELINE.md — interpret-mode
tests cannot see Mosaic codegen bugs (round-3 lesson, VERDICT.md r3).

Usage: python tools/verify_chip.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax

from sph_tpu.utils.verify import run_all


def main() -> int:
    print(f"backend: {jax.default_backend()}  jax {jax.__version__}",
          flush=True)
    results = run_all(verbose=True)
    fails = [(n, e) for n, e in results if e is not None]
    print(f"{len(results) - len(fails)}/{len(results)} twin checks ok")
    for n, e in fails:
        print(f"FAIL {n}: {e}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
