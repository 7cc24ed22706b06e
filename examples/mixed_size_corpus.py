"""Score a mixed-size corpus with one compiled program per size bucket.

XLA compiles one program per input shape, so a corpus of heterogeneous
image sizes normally costs one compilation each.  Masked scoring
(kernels/masked.py) pads every image to a shared bucket shape and masks
the math exactly — any number of distinct sizes, a handful of programs.

Run: python examples/mixed_size_corpus.py
"""

import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from codec_eval_tpu.kernels import score_mixed_sizes, score_mixed_sizes_all


def main() -> int:
    rng = np.random.default_rng(0)
    pairs = []
    # Five different sizes -> two padded buckets (multiples of 128).
    for h, w in [(300, 400), (333, 257), (128, 128), (220, 500), (97, 111)]:
        y, x = np.mgrid[0:h, 0:w]
        base = 120 + 60 * np.sin(x / 9.0) + 45 * np.cos(y / 13.0)
        ref = np.clip(
            np.stack([base, base * 0.9, base * 0.8], -1)
            + rng.normal(0, 6, (h, w, 3)),
            0, 255,
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(ref).save(buf, "JPEG", quality=70)
        dist = np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        pairs.append((ref, dist))

    # SSIMULACRA2 only (fastest), or all four metrics fused.
    s2 = score_mixed_sizes(pairs)
    allm = score_mixed_sizes_all(pairs)
    for i, (ref, _) in enumerate(pairs):
        print(
            f"{ref.shape[0]:4d}x{ref.shape[1]:<4d} "
            f"ssim2={s2[i]:6.2f}  dssim={allm['dssim'][i]:.5f}  "
            f"butteraugli={allm['butteraugli'][i]:.3f}  "
            f"psnr={allm['psnr'][i]:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
