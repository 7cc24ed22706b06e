"""Regenerate the static trellis rate tables (DEFAULT_AC_LENGTHS_* in
kernels/jpeg_enc.py): optimized-Huffman (run, size) bit lengths fitted to
pooled round-to-nearest statistics of the clean calibration corpus.

The trellis is insensitive to this fit — per-image fitted tables measured
0.01 BD-rate points better in YCbCr and 0.07 in XYB (2026-08-18 scan) — so
the constants only need regeneration if the quantization-table families or
the calibration corpus change materially.

Run: ``python tools/fit_rate_tables.py`` and paste the output over the
constants in kernels/jpeg_enc.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    from tpujpeg_bench import _clean_photo, SIZE
    from codec_eval_tpu.kernels import jpeg_enc as je

    hist_y = np.zeros(256, np.int64)
    hist_c = np.zeros(256, np.int64)
    for seed in range(40, 44):
        tr = je.jpeg_transform(_clean_photo(SIZE, SIZE, seed), "420")
        for q in (50, 70, 85, 95):
            ql, qc = je.quality_to_qtables(float(q))
            je.ac_symbol_histogram(je.quantize_blocks(tr["dct_y"], ql, 0.5), hist_y)
            je.ac_symbol_histogram(je.quantize_blocks(tr["dct_cb"], qc, 0.5), hist_c)
            je.ac_symbol_histogram(je.quantize_blocks(tr["dct_cr"], qc, 0.5), hist_c)

    for name, hist in (("LUMA", hist_y), ("CHROMA", hist_c)):
        lengths = je.huffman_code_lengths(hist)
        table = np.full((16, 11), 16.0, dtype=np.float32)
        for run in range(16):
            for size in range(11):
                if size > 0 or run in (0, 15):
                    table[run, size] = lengths[(run << 4) | size]
        rows = ",\n        ".join(
            "[" + ", ".join(str(int(v)) for v in row) + "]"
            for row in table
        )
        print(f"DEFAULT_AC_LENGTHS_{name} = np.array(\n    [\n        {rows},"
              f"\n    ],\n    dtype=np.float32,\n)\n")


if __name__ == "__main__":
    main()
