"""Public-API surface snapshot generator.

Analog of the reference's apidoc harness (apidoc/tests/public_api_doc.rs +
docs/public-api/codec-eval.txt): walks the public modules, writes a sorted
listing of classes, functions, methods, and constants to
``docs/public-api/codec_eval_tpu.txt``.  The snapshot test
(tests/test_api_surface.py) regenerates it and fails when the surface
changed without the snapshot being updated — guarding against accidental
API breakage exactly as the reference's CI lint does.

Usage: python tools/gen_api_doc.py [--check]
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PUBLIC_MODULES = [
    "codec_eval_tpu",
    "codec_eval_tpu.engine",
    "codec_eval_tpu.metrics",
    "codec_eval_tpu.viewing",
    "codec_eval_tpu.stats",
    "codec_eval_tpu.corpus",
    "codec_eval_tpu.importers",
    "codec_eval_tpu.codecs",
    "codec_eval_tpu.iter",
    "codec_eval_tpu.analysis",
    "codec_eval_tpu.kernels",
    "codec_eval_tpu.parallel",
    "codec_eval_tpu.decode",
    "codec_eval_tpu.errors",
    "codec_eval_tpu.color",
]

OUT_PATH = REPO / "docs" / "public-api" / "codec_eval_tpu.txt"


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default values whose repr embeds a memory address (functions, object
    # instances) would make the snapshot differ run-to-run
    return re.sub(r"<([^<>]*) at 0x[0-9a-f]+>", r"<\1>", sig)


def describe_module(name: str) -> list[str]:
    mod = importlib.import_module(name)
    lines: list[str] = []
    public = getattr(mod, "__all__", None)
    names = public if public is not None else [
        n for n in dir(mod) if not n.startswith("_")
    ]
    for attr_name in sorted(set(names)):
        try:
            obj = getattr(mod, attr_name)
        except AttributeError:
            continue
        qual = f"{name}.{attr_name}"
        if inspect.ismodule(obj):
            continue
        if inspect.isclass(obj):
            # Skip classes re-exported from other public modules (they are
            # listed at their defining module).
            if obj.__module__ != name and obj.__module__ in PUBLIC_MODULES:
                lines.append(f"reexport {qual} = {obj.__module__}.{obj.__name__}")
                continue
            lines.append(f"class {qual}")
            for meth_name, meth in sorted(inspect.getmembers(obj)):
                if meth_name.startswith("_"):
                    continue
                if inspect.isfunction(meth) or inspect.ismethod(meth):
                    lines.append(f"  method {qual}.{meth_name}{_signature(meth)}")
                elif isinstance(meth, (classmethod, staticmethod)):
                    lines.append(f"  method {qual}.{meth_name}(...)")
                elif isinstance(meth, property):
                    lines.append(f"  property {qual}.{meth_name}")
        elif inspect.isfunction(obj):
            if obj.__module__ != name and obj.__module__ in PUBLIC_MODULES:
                lines.append(f"reexport {qual} = {obj.__module__}.{obj.__name__}")
                continue
            lines.append(f"fn {qual}{_signature(obj)}")
        else:
            lines.append(f"const {qual}: {type(obj).__name__}")
    return lines


def generate() -> str:
    lines = [
        "# Public API surface of codec-eval-tpu",
        "# Regenerate with: python tools/gen_api_doc.py",
        "",
    ]
    for name in PUBLIC_MODULES:
        lines.append(f"## {name}")
        lines.extend(describe_module(name))
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="fail if the snapshot is stale (CI mode)")
    args = ap.parse_args()

    surface = generate()
    if args.check:
        if not OUT_PATH.exists() or OUT_PATH.read_text() != surface:
            print("public API snapshot is stale; regenerate with "
                  "python tools/gen_api_doc.py", file=sys.stderr)
            return 1
        print("public API snapshot up to date")
        return 0
    OUT_PATH.parent.mkdir(parents=True, exist_ok=True)
    OUT_PATH.write_text(surface)
    n_items = sum(1 for line in surface.splitlines()
                  if line and not line.startswith(("#", "##")))
    print(f"wrote {OUT_PATH} ({n_items} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
