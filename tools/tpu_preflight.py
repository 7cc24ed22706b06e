"""TPU preflight gate (VERDICT r3 #2): the production device code paths,
compiled and numerically gated on the REAL chip.

The CPU test suite (tests/conftest.py forces jax_platforms=cpu) cannot see
TPU-only failures by construction: the round-2 bf16 opsin drift and the
round-3 fused-epilogue scoped-VMEM compile OOM were both invisible to every
committed test.  This gate closes that hole.  Run it on the chip before any
bench run or kernel-change commit (CONTRIBUTING.md "no default-on kernel
without evidence"):

    python tools/tpu_preflight.py            # full gate (~min, cached after)
    python tools/tpu_preflight.py --fast     # compile gate at 512px only

Phases:

1. **compile gate** — AOT-compiles the production all-metric chunk scorer
   and its reference precompute at every production geometry
   (512, 800, 1024, 2048; bench chunk sizes).  Any scoped-VMEM admission
   bug in the default-on kernel set fails HERE, not in the round's bench:
   re-introducing the r03 guard bug (tile 48 admitted at wp 1024) fails
   this phase at the 2048 geometry.
2. **parity gate** — scores a fixed 4-candidate 512px batch through the
   default (Pallas) path and through an all-XLA subprocess
   (CODEC_EVAL_{MALTA,SSIM2,FREQSEP}_IMPL=xla, fused epilogue off); gates
   max relative diff per metric against the PARITY_MAX_REL tiers below
   (1e-5 for dssim/psnr/ssimulacra2; butteraugli's tier is set by the
   freqsep FIR summation-order analysis documented at PARITY_MAX_REL).
3. **oracle gate** — re-runs the committed 24-pair libjxl oracle fixture
   (tests/goldens/butteraugli_oracle.npz) through the production BATCH
   path on the chip, with the same distribution gates as
   tests/test_butteraugli_oracle.py (median<=0.5% / p90<=2% / max<=8%).

Prints one JSON line {"ok": bool, ...} and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: (size, bench chunk) production geometries (bench.py sweep/large scenarios).
GEOMETRIES = ((512, 25), (800, 25), (1024, 5), (2048, 5))

#: Pallas-vs-XLA per-metric gates.  Measured on-chip 2026-08-21:
#: ssimulacra2 7.8e-7, dssim/psnr 0.0, butteraugli 9.7e-5 — the butteraugli
#: divergence is ENTIRELY the freqsep kernels' FIR summation order (scoring
#: the fixed batch with CODEC_EVAL_FREQSEP_IMPL=xla reproduces the all-XLA
#: scores bit-exactly; the Malta and SSIM2 kernels contribute 0).  Per-plane
#: ~1e-7 relative band differences amplify through the remove_range
#: cancellations and the diffmap max-norm into ~1e-4 of final score —
#: 3e-4 BA points here, far inside the oracle gate's 0.5% accuracy bar,
#: which remains the real arbiter.  The tiers still catch real numeric
#: bugs: the round-2 bf16 opsin drift measured ~5e-3.  The 5e-4 tier is
#: additionally PINNED to its freqsep cause by a sub-check in parity_gate:
#: the same batch scored with only CODEC_EVAL_FREQSEP_IMPL=xla must match
#: all-XLA at the tight 1e-5, so a real drift in any other kernel cannot
#: hide inside the butteraugli band.  (A bit-exact match against the XLA
#: blur is unobtainable by construction: the XLA path lowers blurs to
#: banded-Toeplitz MXU matmuls whose accumulation order is hardware-defined,
#: while the kernel applies FIR taps sequentially in VMEM.)
PARITY_MAX_REL = {
    "butteraugli": 5e-4,
    "dssim": 1e-5,
    "psnr": 1e-5,
    "ssimulacra2": 1e-5,
}

ORACLE_MEDIAN_MAX = 0.005
ORACLE_P90_MAX = 0.02
ORACLE_WORST_MAX = 0.08

XLA_ENV = {
    "CODEC_EVAL_MALTA_IMPL": "xla",
    "CODEC_EVAL_MALTA_FUSED_EPI": "0",
    "CODEC_EVAL_SSIM2_IMPL": "xla",
    "CODEC_EVAL_FREQSEP_IMPL": "xla",
}


def _photo(h, w, seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (
        118 + 68 * np.sin(x / 13.0) + 52 * np.cos(y / 9.0)
        + 24 * np.sin((x + y) / 31.0)
    )
    img = np.stack([base, base * 0.88 + 12, base * 0.74 + 26], -1)
    return np.clip(img + rng.normal(0, 7, img.shape), 0, 255).astype(np.uint8)


def _parity_batch():
    """Fixed 4-candidate 512px batch: jpeg q40/q75/q95 + noise."""
    import io

    from PIL import Image

    ref = _photo(512, 512, 31)
    cands = []
    for q in (40, 75, 95):
        buf = io.BytesIO()
        Image.fromarray(ref).save(buf, "JPEG", quality=q)
        cands.append(np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")))
    rng = np.random.default_rng(32)
    cands.append(
        np.clip(ref.astype(np.int16) + rng.integers(-9, 10, ref.shape), 0, 255)
        .astype(np.uint8)
    )
    return ref, np.stack(cands)


def child_scores() -> None:
    """--scores-child: score the fixed parity batch, print JSON to stdout."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from codec_eval_tpu.engine.scoring import _build_chunk_scorer, _build_precompute

    ref, batch = _parity_batch()
    pre = _build_precompute(512, 512, True, True, True, False)
    # Production staging: planar u8 candidates (engine BatchScorer).
    scorer = _build_chunk_scorer(
        512, 512, len(batch), True, True, True, True, planar=True
    )
    planar = np.ascontiguousarray(np.moveaxis(batch, -1, 1))
    out = scorer(pre(jnp.asarray(ref)), jnp.asarray(planar))
    print(json.dumps({k: np.asarray(v).tolist() for k, v in out.items()}))


def compile_gate(sizes) -> dict:
    import jax
    import jax.numpy as jnp

    from codec_eval_tpu.engine.scoring import _build_chunk_scorer, _build_precompute

    res = {}
    for size, chunk in sizes:
        t0 = time.time()
        pre_fn = _build_precompute(size, size, True, True, True, False)
        ref_s = jax.ShapeDtypeStruct((size, size, 3), jnp.uint8)
        pre_fn.lower(ref_s).compile()
        pre_avals = jax.eval_shape(pre_fn, ref_s)
        # Planar (production engine + bench staging) at every geometry;
        # the channel-last variant (still reachable via _build_scorer in
        # tools) at 512 only.
        layouts = [(True, (chunk, 3, size, size))]
        if size == 512:
            layouts.append((False, (chunk, size, size, 3)))
        for planar, bshape in layouts:
            scorer = _build_chunk_scorer(
                size, size, chunk, True, True, True, True, planar=planar
            )
            scorer.lower(
                pre_avals, jax.ShapeDtypeStruct(bshape, jnp.uint8)
            ).compile()
        res[f"{size}px"] = round(time.time() - t0, 1)
        print(f"compile gate {size}px/chunk{chunk}: ok ({res[f'{size}px']}s)",
              file=sys.stderr)
    return res


def parity_gate() -> dict:
    def run(extra_env):
        env = dict(os.environ, **extra_env)
        out = subprocess.run(
            [sys.executable, __file__, "--scores-child"],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        if out.returncode != 0:
            raise RuntimeError(f"child failed:\n{out.stderr[-2000:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    def max_rel(a_scores, b_scores):
        worst = {}
        for k in sorted(set(a_scores) & set(b_scores)):
            a = np.asarray(a_scores[k], np.float64)
            b = np.asarray(b_scores[k], np.float64)
            worst[k] = float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9)))
        return worst

    pallas = run({})
    xla = run(XLA_ENV)
    worst = max_rel(pallas, xla)
    for k, rel in worst.items():
        print(f"parity gate {k}: max rel {rel:.2e}", file=sys.stderr)
    bad = {
        k: v for k, v in worst.items() if v > PARITY_MAX_REL.get(k, 1e-5)
    }
    if bad:
        raise AssertionError(f"Pallas-vs-XLA parity beyond {PARITY_MAX_REL}: {bad}")

    # Sub-check pinning butteraugli's loosened tier to its documented benign
    # cause: with ONLY freqsep routed to XLA (Malta/SSIM2 kernels and the
    # epilogue still on the default Pallas path), every metric must match
    # all-XLA at the TIGHT 1e-5 tier.  A real >1e-5 drift anywhere outside
    # the freqsep FIR summation order fails HERE even though it would hide
    # inside butteraugli's 5e-4 band above.
    freqsep_xla = run({"CODEC_EVAL_FREQSEP_IMPL": "xla"})
    worst_pinned = max_rel(freqsep_xla, xla)
    for k, rel in worst_pinned.items():
        print(f"parity gate (freqsep=xla) {k}: max rel {rel:.2e}",
              file=sys.stderr)
    bad = {k: v for k, v in worst_pinned.items() if v > 1e-5}
    if bad:
        raise AssertionError(
            "non-freqsep Pallas kernels drifted beyond the tight 1e-5 tier "
            f"(butteraugli's 5e-4 tier covers ONLY freqsep FIR order): {bad}"
        )
    return {
        **{k: f"{v:.1e}" for k, v in worst.items()},
        "freqsep_pinned": {k: f"{v:.1e}" for k, v in worst_pinned.items()},
    }


def oracle_gate() -> dict:
    import jax.numpy as jnp

    from codec_eval_tpu.kernels.butteraugli import (
        butteraugli_batch,
        precompute_butteraugli_reference,
    )

    fixture = np.load(
        Path(__file__).resolve().parent.parent
        / "tests" / "goldens" / "butteraugli_oracle.npz"
    )
    bases, ridx, dists, gold = (
        fixture["bases"], fixture["ref_index"], fixture["dists"], fixture["gold"]
    )
    ours = np.empty(len(ridx))
    # Group by reference base so the PRODUCTION batch path (fused epilogue
    # included where admitted) is what gets gated, mirroring the engine.
    for b in np.unique(ridx):
        idx = np.nonzero(ridx == b)[0]
        pre = precompute_butteraugli_reference(jnp.asarray(bases[b]))
        ours[idx] = np.asarray(
            butteraugli_batch(pre, jnp.asarray(dists[idx]))
        )
    rel = np.abs(ours - gold) / np.maximum(gold, 1e-9)
    stats = {
        "median": float(np.median(rel)),
        "p90": float(np.quantile(rel, 0.9)),
        "max": float(rel.max()),
        "worst": str(fixture["names"][int(np.argmax(rel))]),
    }
    print(f"oracle gate (TPU batch path): {stats}", file=sys.stderr)
    assert stats["median"] <= ORACLE_MEDIAN_MAX, stats
    assert stats["p90"] <= ORACLE_P90_MAX, stats
    assert stats["max"] <= ORACLE_WORST_MAX, stats
    return stats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true",
                        help="compile gate at 512px only; skip parity/oracle")
    parser.add_argument("--scores-child", action="store_true",
                        help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.scores_child:
        child_scores()
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(json.dumps({"ok": False, "error": f"not a TPU backend: {backend}"}))
        sys.exit(2)

    record: dict = {"backend": backend}
    try:
        record["compile_s"] = compile_gate(
            GEOMETRIES[:1] if args.fast else GEOMETRIES
        )
        if not args.fast:
            record["parity_max_rel"] = parity_gate()
            record["oracle"] = oracle_gate()
        record["ok"] = True
    except Exception as e:  # noqa: BLE001 — gate must report, not crash
        record["ok"] = False
        record["error"] = f"{type(e).__name__}: {e}"[:800]
        print(json.dumps(record))
        sys.exit(1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
