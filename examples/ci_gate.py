"""CI quality gate: fail the pipeline if an encoder regresses.

Run: python examples/ci_gate.py
"""

import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import codec_eval_tpu as ce


def main() -> int:
    rng = np.random.default_rng(1)
    y, x = np.mgrid[0:128, 0:128]
    base = 120 + 60 * np.sin(x / 9.0) + 45 * np.cos(y / 13.0)
    reference = np.clip(
        np.stack([base, base * 0.9, base * 0.8], -1) + rng.normal(0, 6, (128, 128, 3)),
        0, 255,
    ).astype(np.uint8)

    def encode(quality: int) -> np.ndarray:
        buf = io.BytesIO()
        Image.fromarray(reference).save(buf, "JPEG", quality=quality)
        return np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))

    try:
        # Hard metric thresholds on the production quality setting
        # (dssim is on the raw dssim-core scale: 0.01-0.05 = "good").
        ce.assert_quality(reference, encode(85), min_ssimulacra2=80.0,
                          max_dssim=0.02)
        # ...and the semantic perceptual band on the archival setting
        # (the PerceptionLevel ladder is deliberately strict:
        # NOTICEABLE = dssim < 0.003 needs near-lossless encodes).
        ce.assert_perception_level(reference, encode(98),
                                   ce.PerceptionLevel.NOTICEABLE)
    except ce.QualityBelowThreshold as e:
        print(f"QUALITY GATE FAILED: {e}")
        return 1
    print("quality gate passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
