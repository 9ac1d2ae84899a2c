"""Keep a TPU chip busy (ref:tools/occupy_gpu.py, which spins CUDA
matmuls). TPU version: allocate a large buffer and loop bf16 matmuls on
the MXU until killed.

Usage: python -m tools.occupy_tpu [GB] [SIZE]
"""

import sys
import time


def main(reserve_gb: float = 4.0, size: int = 8192):
    import jax
    import jax.numpy as jnp

    n_bytes = int(reserve_gb * 1e9)
    n_elems = n_bytes // 2  # bf16
    hold = jnp.zeros((n_elems,), jnp.bfloat16)  # noqa: F841 — reserve HBM
    a = jnp.ones((size, size), jnp.bfloat16)

    @jax.jit
    def spin(x):
        return x @ x * 1e-4

    print(f"occupying {jax.devices()[0]} with {reserve_gb} GB + {size}² matmuls")
    while True:
        a = spin(a)
        a.block_until_ready()
        time.sleep(0.01)


if __name__ == "__main__":
    main(
        float(sys.argv[1]) if len(sys.argv) > 1 else 4.0,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8192,
    )
