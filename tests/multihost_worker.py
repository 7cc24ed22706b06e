"""Worker process for the 2-process jax.distributed integration test.

Launched by tests/test_multihost_integration.py.  Each process owns 4
virtual CPU devices (8 global), builds the global (batch, space) mesh,
feeds its host-local shard of a synthetic corpus through
``host_local_batch_to_global``, scores with the SPMD step, and prints the
replicated corpus means — which must be identical across processes and
equal to the single-process result.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]

mode "score" (default): SPMD metric scoring + replicated corpus means.
mode "ladder": the device-resident tpujpeg ladder over the global mesh
(``sweep_corpus_ladders(multihost=True)``) with device-side rate stats;
prints per-image score/size digests that must match across processes and
equal the single-process result.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def synthetic_corpus(n=16, size=32):
    """Deterministic (refs, dists) — all processes generate the same corpus."""
    rng = np.random.default_rng(99)
    refs = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    dists = np.clip(
        refs.astype(np.int16) + rng.integers(-12, 13, refs.shape), 0, 255
    ).astype(np.uint8)
    return refs, dists


def _ladder_corpus(n=8, size=48):
    rng = np.random.default_rng(77)
    y, x = np.mgrid[0:size, 0:size]
    images = []
    for i in range(n):
        base = 120 + 60 * np.sin(x / (7.0 + i)) + 45 * np.cos(y / (5.0 + i))
        img = np.clip(
            np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
            + rng.normal(0, 5, (size, size, 3)),
            0,
            255,
        ).astype(np.uint8)
        images.append(img)
    return images


def _run_ladder(mesh) -> None:
    from codec_eval_tpu.parallel.ladder_runner import sweep_corpus_ladders

    res = sweep_corpus_ladders(
        _ladder_corpus(),
        [50.0, 85.0],
        mesh=mesh,
        metrics=("ssimulacra2", "psnr"),
        with_sizes="device",
        multihost=True,
    )
    s2 = res.scores["ssimulacra2"]
    digest = " ".join(f"{v:.6f}" for v in s2.reshape(-1))
    sz = " ".join(str(int(v)) for v in res.sizes.reshape(-1))
    print(f"LADDER s2=[{digest}] sizes=[{sz}]")


def main(pid: int, nprocs: int, port: int, mode: str = "score") -> None:
    from codec_eval_tpu.parallel.mesh import sharded_score_fn
    from codec_eval_tpu.parallel.multihost import (
        global_batch_mesh,
        host_local_batch_to_global,
        initialize_distributed,
        partition_corpus,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    mesh = global_batch_mesh(n_space=1)
    if mode == "ladder":
        _run_ladder(mesh)
        return
    refs, dists = synthetic_corpus()

    # Each host materializes only its strided share, in global batch order:
    # host_local_batch_to_global concatenates process-local batches in
    # process order, so take the contiguous slice for this process.
    per = refs.shape[0] // nprocs
    lo, hi = pid * per, (pid + 1) * per
    g_refs = host_local_batch_to_global(mesh, refs[lo:hi])
    g_dists = host_local_batch_to_global(mesh, dists[lo:hi])

    step = sharded_score_fn(mesh, butteraugli=False)  # keep CI runtime down
    _, aggregates = step(g_refs, g_dists)
    means = {k: float(v) for k, v in aggregates.items()}
    # partition_corpus is pure logic; exercise it for coverage.
    share = partition_corpus(list(range(refs.shape[0])))
    assert len(share) == per
    print("MEANS " + " ".join(f"{k}={v:.10f}" for k, v in sorted(means.items())))


if __name__ == "__main__":
    main(
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4] if len(sys.argv) > 4 else "score",
    )
