"""One-vs-all comparison: pit your codec against every registered codec.

Run: python examples/compare_against_all.py <corpus_dir>
"""

import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import codec_eval_tpu as ce
from codec_eval_tpu.codecs import CompareAgainstAll


def my_encode(image, request):
    buf = io.BytesIO()
    Image.fromarray(image.to_rgb8()).save(
        buf, "JPEG", quality=int(request.quality), subsampling=0, progressive=True
    )
    return buf.getvalue()


def my_decode(data):
    return ce.ImageData.rgb8(np.array(Image.open(io.BytesIO(data)).convert("RGB")))


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: compare_against_all.py <corpus_dir>")
        return 2
    result = (
        CompareAgainstAll("my-codec", "0.1")
        .with_encode(my_encode)
        .with_decode(my_decode)
        .with_format("jpeg")
        .on_corpus(sys.argv[1])
        .with_quality_levels([50, 60, 70, 80, 90, 95])
        .with_limit(10)
        .output_to("./compare_reports")
        .run()
    )
    result.print_summary()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
