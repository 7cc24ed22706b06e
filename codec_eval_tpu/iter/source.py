"""Source image loading with representative tiers and a PPM fast cache.

Behavioral port of reference: crates/codec-iter/src/source.rs:19-201 —
cluster-representative CID22-512 filename tiers selected by ``--limit``,
PNG decode, and a ``.codec-iter-cache/`` PPM cache so repeat runs skip PNG
decoding (PPM IO goes through the native C++ library when built).
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from ..errors import ImageLoadError
from ..utils import native
from .eval import SourceImage

#: Representative tiers (glassa-clustered CID22-512 picks).
#: reference: crates/codec-iter/src/source.rs:19-45
TINY = ["pexels-photo-951408.png", "53435.png", "1963557.png"]

SMALL = TINY + ["160577.png", "2866385.png"]

MEDIUM = [
    "pexels-photo-951408.png",
    "pexels-photo-3193731.png",
    "pexels-photo-7438498.png",
    "53435.png",
    "pexels-photo-1130297.png",
    "1963557.png",
    "Temperament-pie-chart-according-to-Eysenck.png",
    "160577.png",
    "1277396.png",
    "2866385.png",
    "1583339.png",
    "144200.png",
    "pexels-photo-2908983.png",
    "1183021.png",
    "162511.png",
]

CACHE_DIR_NAME = ".codec-iter-cache"


def _cache_path(corpus: Path, name: str) -> Path:
    return corpus / CACHE_DIR_NAME / (Path(name).stem + ".ppm")


def load_image(corpus: Path, name: str) -> SourceImage:
    """Load via PPM cache, else decode and cache.
    reference: crates/codec-iter/src/source.rs:62-92."""
    cache = _cache_path(corpus, name)
    if cache.exists():
        try:
            return SourceImage(name=name, rgb=native.read_ppm(cache))
        except IOError:
            pass
    path = corpus / name
    if not path.exists():
        raise ImageLoadError(f"source image not found: {path}")
    from PIL import Image

    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"))
    cache.parent.mkdir(parents=True, exist_ok=True)
    try:
        native.write_ppm(cache, rgb)
    except IOError:
        pass
    return SourceImage(name=name, rgb=np.ascontiguousarray(rgb))


def load_sources(corpus: Path, limit: int) -> List[SourceImage]:
    """Tier selection by limit (<=3 TINY, <=5 SMALL, <=15 MEDIUM, else all).
    reference: crates/codec-iter/src/source.rs:47-60."""
    corpus = Path(corpus)
    if not corpus.is_dir():
        raise ImageLoadError(f"corpus directory not found: {corpus}")
    if limit <= 3:
        names = TINY[: max(limit, 0)]
    elif limit <= 5:
        names = SMALL[:limit]
    elif limit <= 15:
        names = MEDIUM[:limit]
    else:
        names = []

    if names:
        available = [n for n in names if (corpus / n).exists()]
        if available:
            return [load_image(corpus, n) for n in available]
        # Tier files absent from this corpus: fall back to directory order.

    out: List[SourceImage] = []
    for path in sorted(corpus.iterdir()):
        if path.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp", ".ppm"):
            if path.parent.name == CACHE_DIR_NAME:
                continue
            out.append(load_image(corpus, path.name))
            if limit and len(out) >= limit:
                break
    if not out:
        raise ImageLoadError(f"no usable images in {corpus}")
    return out
