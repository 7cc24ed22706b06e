"""Minimal end-to-end evaluation: one codec, one image, full reports.

Run: python examples/basic_eval.py [image.png]
(With no argument, a synthetic test image is generated.)
"""

import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import codec_eval_tpu as ce


def jpeg_encode(image, request):
    buf = io.BytesIO()
    Image.fromarray(image.to_rgb8()).save(
        buf, "JPEG", quality=int(request.quality), subsampling=2, optimize=True
    )
    return buf.getvalue()


def jpeg_decode(data):
    return ce.ImageData.rgb8(np.array(Image.open(io.BytesIO(data)).convert("RGB")))


def synthetic_image(n=256):
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:n, 0:n]
    base = 120 + 60 * np.sin(x / 11.0) + 45 * np.cos(y / 8.0)
    img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
    return np.clip(img + rng.normal(0, 5, img.shape), 0, 255).astype(np.uint8)


def main() -> None:
    if len(sys.argv) > 1:
        image = ce.ImageData.open(sys.argv[1])
        name = Path(sys.argv[1]).stem
    else:
        image = ce.ImageData.rgb8(synthetic_image())
        name = "synthetic"

    config = (
        ce.EvalConfig.builder()
        .report_dir("./reports")
        .viewing(ce.presets.native_desktop())
        .metrics(ce.MetricConfig.perceptual())
        .quality_levels([50, 70, 85, 95])
        .build()
    )
    session = ce.EvalSession(config)
    session.add_codec_with_decode("jpeg-420", "pil", jpeg_encode, jpeg_decode)

    report = session.evaluate_image(name, image)
    session.write_image_report(report)

    print(f"{'q':>4} {'bpp':>7} {'ssim2':>7} {'dssim':>9} {'ba':>6} {'band':>13}")
    for r in report.results:
        m = r.metrics
        print(
            f"{r.quality:>4g} {r.bits_per_pixel:>7.3f} {m.ssimulacra2:>7.2f} "
            f"{m.dssim:>9.6f} {m.butteraugli:>6.2f} {str(r.perception):>13}"
        )
    print(f"\nreport: ./reports/{name}.json")


if __name__ == "__main__":
    main()
