"""Worker for the 2-process multi-host smoke test (tests/test_distributed.py).

Each process owns 2 virtual CPU devices; `jax.distributed.initialize` links
them into one 4-device runtime, and the SAME mesh/sharding code the trainer
uses (efgh_tpu/parallel) runs a global-batch reduction over it — the
multi-host analog of `python main.py --distributed` (efgh_tpu/main.py:26-32).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # CLAUDE.md: env var is ignored
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from efgh_tpu.parallel import create_mesh, replicate, shard_batch

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    mesh = create_mesh()  # all global devices on the 'data' axis
    batch = {"x": np.arange(8, dtype=np.float32).reshape(4, 2)}
    db = shard_batch(batch, mesh)  # leading axis split across both processes
    w = replicate(jnp.ones((2,), jnp.float32), mesh)

    @jax.jit
    def step(w, b):
        # global reduction: XLA inserts the cross-process all-reduce
        return jnp.sum(b["x"] @ w[:, None])

    out = step(w, db)
    print("RESULT", float(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
